package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.types.BinaryType
import org.scalatest.funsuite.AnyFunSuite

/** The storage→decode path a real multimodal pipeline uses: media
  * payloads written to a parquet `binary` column, read back, and pushed
  * through the generic decode operators. The in-flight synthesis in the
  * mm fixture queries is a test convenience — this spec proves the
  * operators see byte-identical payloads (hence identical oracle
  * values) when the payloads come off disk instead. */
class BinaryParquetSpec extends AnyFunSuite with SparkSpec {
  import Multimodal._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-binparquet").toString

  test("payloads round-trip parquet binary columns byte-identically") {
    val s = spark
    val recs = (0L until 130L).map { id =>
      val payload = (id % 3: @unchecked) match {
        case 0 => ImageCodec.encodePng((id % 16 + 8).toInt, (id % 12 + 8).toInt, id * 31 + 7)
        case 1 => ImageCodec.encodeTiffFrames(8, 6, (id % 8 + 3).toInt, id * 31 + 7)
        case 2 => MediaCodec.encodeWavPcm16((id % 100 + 10).toInt, 16000, id * 17 + 3)
      }
      MediaRecord(id, payload)
    }
    val dir = tmpDir()
    s.createDataset(recs)(recEnc).repartition(4)
      .write.mode("overwrite").parquet(s"$dir/media")

    val back = s.read.parquet(s"$dir/media")
    assert(back.schema("payload").dataType == BinaryType)
    val byId = back.as[MediaRecord](recEnc).collect().map(r => r.doc_id -> r.payload).toMap
    assert(byId.size == 130)
    recs.foreach(r => assert(java.util.Arrays.equals(byId(r.doc_id), r.payload),
      s"payload bytes for doc ${r.doc_id} changed across the parquet round trip"))
  }

  test("extractMeta / sampleFrames / resize run e2e over a binary parquet column") {
    val s = spark
    val pngs = (0L until 40L).map(id =>
      MediaRecord(id, ImageCodec.encodePng((id % 16 + 8).toInt, (id % 12 + 8).toInt, id * 31 + 7)))
    val tiffs = (100L until 120L).map(id =>
      MediaRecord(id, ImageCodec.encodeTiffFrames(8, 6, (id % 8 + 3).toInt, id * 31 + 7)))
    val dir = tmpDir()
    s.createDataset(pngs ++ tiffs)(recEnc).repartition(3)
      .write.mode("overwrite").parquet(s"$dir/media")
    val ds = s.read.parquet(s"$dir/media").as[MediaRecord](recEnc)

    // decode: same typed metadata as the direct in-memory dataset
    val fromDisk = extractMeta(ds).collect().sortBy(_.doc_id).toSeq
    val direct = extractMeta(s.createDataset(pngs ++ tiffs)(recEnc))
      .collect().sortBy(_.doc_id).toSeq
    assert(fromDisk == direct)
    assert(fromDisk.take(40).forall(_.format == "png"))
    assert(fromDisk.drop(40).forall(_.format == "tiff"))

    // frame sampling over the disk payloads: every 2nd TIFF page
    val frames = sampleFrames(ds.filter(_.doc_id >= 100L), stride = 2).collect()
    val expected = (100L until 120L).map(id => (id % 8 + 3 + 1) / 2).sum
    assert(frames.length == expected.toInt)
    val f = frames.find(r => r.doc_id == 101L && r.frame_idx == 2).get
    val img = ImageCodec.decode(f.payload)
    val seed = 101L * 31 + 7 + 2 * ImageCodec.FrameSeedStep
    assert(((img.getRGB(3, 4) >> 16) & 0xFF) == ImageCodec.pxR(seed, 3, 4))

    // resize over the disk payloads: decoded dims + exact resampled pixel
    val rz = resize(ds.filter(_.doc_id < 40L), 12, 9).collect()
    assert(rz.length == 40)
    val r7 = ImageCodec.decode(rz.find(_.doc_id == 7L).get.payload)
    assert(r7.getWidth == 12 && r7.getHeight == 9)
    // doc 7: 15x15 source, resized (11,8) maps to source (13, 13)
    assert(((r7.getRGB(11, 8) >> 16) & 0xFF) == ImageCodec.pxR(7L * 31 + 7, 13, 13))
  }
}
