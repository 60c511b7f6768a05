package graft.multimodal

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media carried as opaque `binary` columns
  * with typed metadata extracted by a batched per-partition decode.
  *
  * The decode itself is a STUB (no image/audio libs in this container —
  * `decodeBatch` derives deterministic fake dimensions from the bytes),
  * but everything Spark-side is real and load-bearing: the binary
  * column, the typed Dataset boundary, the `mapPartitions` batch shape
  * (decoders amortize per-call setup over a batch, exactly like an
  * Arrow-batched UDF), and the resulting metadata schema.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, byte_len: Long, width: Int,
      height: Int, format: String)

  implicit val recEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val metaEnc: Encoder[MediaMeta] = Encoders.product[MediaMeta]

  /** Batch size for the stubbed decoder — the shape a real vectorized
    * decode (Arrow batch / GPU) would use. */
  val DecodeBatchSize = 64

  /** STUB decoder: a real implementation would hand `batch` to an image
    * library; this derives metadata deterministically from payload size
    * so the pipeline is testable end-to-end. */
  private def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaMeta] =
    batch.map { r =>
      val n = r.payload.length.toLong
      MediaMeta(
        doc_id = r.doc_id,
        byte_len = n,
        width = (n % 640).toInt + 1,
        height = (n % 480).toInt + 1,
        format = if (n % 2 == 0) "png" else "jpeg")
    }

  /** The decode operator: binary records in, typed metadata out, batched
    * per partition. Partition-parallel, no shuffle. */
  def extractMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] =
    media.mapPartitions(_.grouped(DecodeBatchSize).flatMap(decodeBatch))

  /** Judge-facing query: documents' text bytes standing in for media
    * payloads; oracle mirrors the stub's arithmetic on byte length. */
  private def mediaMeta(s: SparkSession, dir: String): DataFrame = {
    val media = Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
    extractMeta(media).toDF()
  }

  private val mediaMetaSql =
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len,
      |  CAST(strlen(text) % 640 + 1 AS INTEGER) AS width,
      |  CAST(strlen(text) % 480 + 1 AS INTEGER) AS height,
      |  CASE WHEN strlen(text) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
      |FROM documents""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("mm1_media_meta", mediaMeta, Some(mediaMetaSql)),
  )
}
