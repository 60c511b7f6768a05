package graft.multimodal

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSpec {
  import Multimodal._

  test("extractMeta really decodes mixed containers and batching drops nothing") {
    val s = spark
    val recs = (0 until 130).map { i =>
      val payload = (i % 4: @unchecked) match {
        case 0 => ImageCodec.encodePng(10 + i % 5, 8, i.toLong)
        case 1 => ImageCodec.encodeJpeg(9, 7 + i % 3, i.toLong)
        case 2 => MediaCodec.encodeWavPcm16(20 + i, 8000, i.toLong)
        case 3 => s"not media $i".getBytes("UTF-8")
      }
      MediaRecord(i.toLong, payload)
    }
    val ds = s.createDataset(recs)(recEnc).repartition(2)
    val metas = extractMeta(ds).collect()
    assert(metas.length == 130) // batching (64) must not drop the tail
    val byId = metas.map(m => m.doc_id -> m).toMap
    assert(byId(0L).format == "png" && byId(0L).width == 10 && byId(0L).height == 8)
    assert(byId(1L).format == "jpeg" && byId(1L).width == 9 && byId(1L).height == 8)
    assert(byId(2L).format == "wav" && byId(2L).width == 22) // nFrames
    assert(byId(3L).format == "unknown" && byId(3L).width == 0)
  }

  test("resize decodes, resamples, and re-encodes lossless PNG") {
    val s = spark
    val recs = Seq(
      MediaRecord(1L, ImageCodec.encodePng(16, 12, 5L)),
      MediaRecord(2L, "junk".getBytes)) // non-image rows are dropped
    val out = resize(s.createDataset(recs)(recEnc), 8, 6).collect()
    assert(out.map(_.doc_id).toSeq == Seq(1L))
    val img = ImageCodec.decode(out.head.payload)
    assert(img.getWidth == 8 && img.getHeight == 6)
    // re-decoded pixel must equal the nearest-neighbor source pixel
    val rgb = img.getRGB(7, 5) // source (14, 10)
    assert(((rgb >> 16) & 0xFF) == ImageCodec.pxR(5L, 14, 10))
    assert((rgb & 0xFF) == ImageCodec.pxB(5L, 14, 10))
  }

  test("sampleFrames walks a real multi-page TIFF with a stride") {
    val s = spark
    val payload = ImageCodec.encodeTiffFrames(8, 6, nFrames = 7, seed = 3L)
    val ds = s.createDataset(Seq(MediaRecord(9L, payload)))(recEnc)
    val frames = sampleFrames(ds, stride = 2).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4, 6))
    // frame 4 carries seed 3 + 4*97; verify a decoded pixel survives the
    // TIFF page read + PNG re-encode round trip
    val f4 = ImageCodec.decode(frames(2).payload)
    val seed4 = 3L + 4 * ImageCodec.FrameSeedStep
    assert(((f4.getRGB(5, 2) >> 16) & 0xFF) == ImageCodec.pxR(seed4, 5, 2))
  }

  test("decode is deterministic across runs") {
    val s = spark
    val recs = (0 until 10).map(i => MediaRecord(i.toLong, ImageCodec.encodePng(8, 8, i.toLong)))
    val a = extractMeta(s.createDataset(recs)(recEnc)).collect().sortBy(_.doc_id).toSeq
    val b = extractMeta(s.createDataset(recs)(recEnc)).collect().sortBy(_.doc_id).toSeq
    assert(a == b)
  }

  test("p3 keeps exactly one survivor per image cluster") {
    import org.apache.spark.sql.functions.col
    val clean = graft.Registry.queries("p3_image_dedup")(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    val pairs = graft.Registry.queries("mm8_ahash_dedup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(clean.nonEmpty && clean.size < 500)
    // no surviving pair may be a near-dup pair
    assert(!pairs.exists { case (a, b) => clean.contains(a) && clean.contains(b) })
    // independent union-find over the pairs: each component must keep
    // EXACTLY its minimum member, nothing else
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comps = parent.keys.groupBy(find).values.map(_.toSet)
    comps.foreach { c =>
      assert(clean.intersect(c) == Set(c.min),
        s"component $c survivors ${clean.intersect(c)}")
    }
  }

  test("mm8 finds the planted near-dup image families") {
    import org.apache.spark.sql.functions.col
    val pairs = graft.Registry.queries("mm8_ahash_dedup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b, hm) => a < b && hm <= 2 })
    // every within-family pair (same doc_id/4 → same base pattern with
    // only a clamped brightness lift between members) must be recalled
    val found = pairs.map(p => (p._1, p._2)).toSet
    val missing = for {
      fam <- 0L until 125L
      i <- 0 until 4; j <- i + 1 until 4
      (a, b) = (fam * 4 + i, fam * 4 + j)
      if !found.contains((a, b))
    } yield (a, b)
    assert(missing.isEmpty, s"missed ${missing.take(5)} of the family pairs")
  }

  test("p6 daily image increment ≡ batch-global image-dedup survivors") {
    // the composed daily verb (seed corpus assets → increment sigs →
    // dd8 pairs → dd10 groups → upsert+compact → keep/drop) must
    // reproduce the batch-global answer p3 computes in one shot —
    // increment ≡ recompute for the whole image pipeline (the same
    // equivalence p4's oracle pins for text)
    val p6 = graft.Registry.queries("p6_daily_image_increment")(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    val batch = graft.Registry.queries("p3_image_dedup")(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(p6 == batch)
    // the verb actually dropped someone (the fixture plants near-dup
    // families spanning the corpus/increment split) and kept leaders
    assert(p6.nonEmpty && p6.size < 500)
  }
}
