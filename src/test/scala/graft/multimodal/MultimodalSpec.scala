package graft.multimodal

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSpec {
  import Multimodal._

  test("binary payloads flow through the batched decode unchanged in count") {
    val s = spark
    val recs = (0 until 130).map(i =>
      MediaRecord(i.toLong, Array.fill[Byte](i + 1)(7)))
    val ds = s.createDataset(recs)(recEnc).repartition(2)
    val metas = extractMeta(ds).collect()
    assert(metas.length == 130) // batching (64) must not drop the tail
    val m5 = metas.find(_.doc_id == 5L).get
    assert(m5.byte_len == 6 && m5.width == 7 && m5.height == 7 && m5.format == "png")
  }

  test("decode is deterministic across runs") {
    val s = spark
    val recs = (0 until 10).map(i => MediaRecord(i.toLong, Array.fill[Byte](100 + i)(1)))
    val a = extractMeta(s.createDataset(recs)(recEnc)).collect().sortBy(_.doc_id).toSeq
    val b = extractMeta(s.createDataset(recs)(recEnc)).collect().sortBy(_.doc_id).toSeq
    assert(a == b)
  }
}
