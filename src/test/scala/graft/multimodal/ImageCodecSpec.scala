package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class ImageCodecSpec extends AnyFunSuite {
  import ImageCodec._

  test("PNG encode/decode round-trips every pixel exactly") {
    val (w, h, seed) = (23, 19, 1234567L)
    val png = encodePng(w, h, seed)
    assert(sniffFormat(png) == "png")
    val img = decode(png)
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xFF) == pxR(seed, x, y), s"R($x,$y)")
      assert(((rgb >> 8) & 0xFF) == pxG(seed, x, y), s"G($x,$y)")
      assert((rgb & 0xFF) == pxB(seed, x, y), s"B($x,$y)")
    }
    // the whole-image statistic the mm1 oracle replays
    val expected = (for (y <- 0 until h; x <- 0 until w)
      yield (pxR(seed, x, y) + pxG(seed, x, y) + pxB(seed, x, y)).toLong).sum
    assert(pixelSumRgb(img) == expected)
  }

  test("JPEG decodes with exact dimensions and sniffs as jpeg") {
    val jpg = encodeJpeg(15, 11, 99L)
    assert(sniffFormat(jpg) == "jpeg")
    val img = decode(jpg)
    assert(img.getWidth == 15 && img.getHeight == 11)
  }

  test("multi-page TIFF writes n frames and reads them back pixel-exact") {
    val payload = encodeTiffFrames(8, 6, nFrames = 5, seed = 42L)
    assert(sniffFormat(payload) == "tiff")
    assert(frameCount(payload) == 5)
    val sampled = sampleFrames(payload, stride = 2)
    assert(sampled.map(_._1) == Seq(0, 2, 4))
    for ((idx, img) <- sampled; y <- 0 until 6; x <- 0 until 8) {
      val fs = 42L + idx * FrameSeedStep
      assert((img.getRGB(x, y) & 0xFFFFFF) ==
        ((pxR(fs, x, y) << 16) | (pxG(fs, x, y) << 8) | pxB(fs, x, y)),
        s"frame $idx pixel ($x,$y)")
    }
  }

  test("nearest-neighbor resize picks the same source pixels as the BMP tier") {
    val (w, h, seed) = (16, 12, 9L)
    val out = resizeNearest(decode(encodePng(w, h, seed)), 8, 6)
    for (y2 <- 0 until 6; x2 <- 0 until 8) {
      val (sx, sy) = (x2 * w / 8, y2 * h / 6)
      assert((out.getRGB(x2, y2) & 0xFFFFFF) ==
        ((pxR(seed, sx, sy) << 16) | (pxG(seed, sx, sy) << 8) | pxB(seed, sx, sy)),
        s"resized ($x2,$y2) != source ($sx,$sy)")
    }
  }

  test("ahash64: invariant to uniform brightness lift, sensitive to content") {
    val (w, h, seed) = (16, 12, 77L)
    val base = ahash64(decode(encode(seededImageDelta(w, h, seed, 0), "png")))
    // clamped +delta shifts pixels and mean together → few/no bits flip
    val lifted = ahash64(decode(encode(seededImageDelta(w, h, seed, 6), "png")))
    assert(java.lang.Long.bitCount(base ^ lifted) <= 2,
      s"brightness lift flipped ${java.lang.Long.bitCount(base ^ lifted)} bits")
    // a different pattern must land far away
    val other = ahash64(decode(encode(seededImageDelta(w, h, seed + 1000, 0), "png")))
    assert(java.lang.Long.bitCount(base ^ other) > 10,
      s"distinct patterns only ${java.lang.Long.bitCount(base ^ other)} bits apart")
  }

  test("ahash64 matches the closed-form grid replay (the mm8 oracle math)") {
    val (w, h, seed, delta) = (13, 9, 42L, 4)
    val img = decode(encode(seededImageDelta(w, h, seed, delta), "png"))
    def gray(i: Int): Long = {
      val sx = (i % 8) * w / 8
      val sy = (i / 8) * h / 8
      (math.min(255, pxR(seed, sx, sy) + delta) +
        math.min(255, pxG(seed, sx, sy) + delta) +
        math.min(255, pxB(seed, sx, sy) + delta)).toLong
    }
    val total = (0 until 64).map(gray).sum
    var expected = 0L
    for (i <- 0 until 64) if (gray(i) * 64L > total) expected |= (1L << i)
    assert(ahash64(img) == expected)
  }

  test("sniff rejects non-image payloads without throwing") {
    assert(sniffFormat("plain text".getBytes) == "unknown")
    assert(sniffFormat(Array.emptyByteArray) == "unknown")
    assert(tryDecode("plain text".getBytes).isEmpty)
    assert(sampleFrames("junk".getBytes, 2).isEmpty)
  }
}
