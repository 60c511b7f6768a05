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

  final case class ResizedMedia(doc_id: Long, payload: Array[Byte],
      width: Int, height: Int)
  final case class Frame(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  implicit val resizedEnc: Encoder[ResizedMedia] = Encoders.product[ResizedMedia]
  implicit val frameEnc: Encoder[Frame] = Encoders.product[Frame]

  /** STUB resize: a real implementation hands the batch to an image lib
    * and re-encodes; this truncates the payload to the target "pixel"
    * budget deterministically. Batched like extractMeta. */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[ResizedMedia] =
    media.mapPartitions(_.grouped(DecodeBatchSize).flatMap(_.map { r =>
      val budget = math.min(r.payload.length, w * h)
      ResizedMedia(r.doc_id, java.util.Arrays.copyOf(r.payload, budget), w, h)
    }))

  /** STUB frame sampling: treats the payload as a "video" and emits
    * every `stride`-th 16-byte slice as a frame — the 1-to-n row shape
    * (flatMap) a real video decoder produces. */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int): Dataset[Frame] =
    media.mapPartitions(_.grouped(DecodeBatchSize).flatMap(_.flatMap { r =>
      val n = r.payload.length / (16 * stride)
      (0 until n).map { i =>
        val off = i * 16 * stride
        Frame(r.doc_id, i, java.util.Arrays.copyOfRange(r.payload, off, off + 16))
      }
    }))

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

  private def asMedia(s: SparkSession, dir: String) =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]

  private def frameSampleQ(s: SparkSession, dir: String): DataFrame =
    sampleFrames(asMedia(s, dir), stride = 3)
      .toDF()
      .select(col("doc_id"), col("frame_idx"),
        length(col("payload")).as("frame_len"))

  private val frameSampleSql =
    """SELECT doc_id,
      |  CAST(unnest(range(0, CAST(strlen(text) // 48 AS BIGINT))) AS INTEGER)
      |    AS frame_idx,
      |  16 AS frame_len
      |FROM documents""".stripMargin

  private def resizeMetaQ(s: SparkSession, dir: String): DataFrame =
    resize(asMedia(s, dir), w = 64, h = 48)
      .toDF()
      .select(col("doc_id"), length(col("payload")).as("resized_len"),
        col("width"), col("height"))

  private val resizeMetaSql =
    """SELECT doc_id,
      |  CAST(least(strlen(text), 3072) AS INTEGER) AS resized_len,
      |  64 AS width, 48 AS height
      |FROM documents""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("mm1_media_meta", mediaMeta, Some(mediaMetaSql)),
    QueryDef("mm2_frame_sample", frameSampleQ, Some(frameSampleSql)),
    QueryDef("mm3_resize_meta", resizeMetaQ, Some(resizeMetaSql)),
  )
}
