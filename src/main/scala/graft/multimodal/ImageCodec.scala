package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO}

/** Real compressed-image codecs via the JDK's `javax.imageio` (PNG,
  * JPEG, multi-page TIFF, GIF, BMP — all bundled with the JRE, no
  * external libraries). This replaces the former mm1–mm3 decode stubs:
  * payloads are genuine PNG/JPEG/TIFF containers and the decode path is
  * the real ImageIO plugin chain.
  *
  * The synthesis side keeps the [[MediaCodec]] design that makes real
  * decoding oracle-checkable: pixel (x,y) of a seeded image is an affine
  * function of (seed, x, y) mod 256, so for the LOSSLESS containers
  * (PNG, TIFF) DuckDB predicts every decoded pixel — and any decoded
  * statistic — in closed form. JPEG is lossy, so its oracle covers
  * container metadata (dimensions, sniffed format), not pixels.
  */
object ImageCodec {

  // Executors must not write ImageIO's disk-backed stream cache.
  ImageIO.setUseCache(false)

  /** Deterministic channel pattern — same affine family as
    * [[MediaCodec.pixelR]]/G/B so the two codec tiers share one oracle
    * vocabulary. */
  @inline def pxR(seed: Long, x: Int, y: Int): Int = ((seed + x * 5 + y * 17) & 0xFF).toInt
  @inline def pxG(seed: Long, x: Int, y: Int): Int = ((seed + x * 11 + y * 3) & 0xFF).toInt
  @inline def pxB(seed: Long, x: Int, y: Int): Int = ((seed + x * 7 + y * 13) & 0xFF).toInt

  def seededImage(w: Int, h: Int, seed: Long): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (pxR(seed, x, y) << 16) | (pxG(seed, x, y) << 8) | pxB(seed, x, y))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Seeded pattern with a small uniform brightness lift, saturating at
    * 255 (NOT mod-256 wrap) — the controlled perturbation used to plant
    * perceptual near-duplicates for mm8: a clamped +delta shifts every
    * pixel and the mean together, so the average-hash bits stay (almost)
    * unchanged while the byte content differs. */
  def seededImageDelta(w: Int, h: Int, seed: Long, delta: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = math.min(255, pxR(seed, x, y) + delta)
        val g = math.min(255, pxG(seed, x, y) + delta)
        val b = math.min(255, pxB(seed, x, y) + delta)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Perceptual average-hash over the decoded image: nearest-neighbor
    * sample an 8×8 grid, gray = r+g+b per cell, bit i set iff
    * gray_i·64 > Σgray (strict, integer — no float rounding to drift
    * between engines). Robust to uniform brightness/contrast shifts;
    * near-duplicate images land within a few bits. */
  def ahash64(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val grays = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < 64) {
      val rgb = img.getRGB((i % 8) * w / 8, (i / 8) * h / 8)
      val gray = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)).toLong
      grays(i) = gray
      total += gray
      i += 1
    }
    var sig = 0L
    i = 0
    while (i < 64) {
      if (grays(i) * 64L > total) sig |= (1L << i)
      i += 1
    }
    sig
  }

  def encode(img: BufferedImage, format: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, bos), s"no ImageIO writer for $format")
    bos.toByteArray
  }

  def encodePng(w: Int, h: Int, seed: Long): Array[Byte] =
    encode(seededImage(w, h, seed), "png")

  def encodeJpeg(w: Int, h: Int, seed: Long): Array[Byte] =
    encode(seededImage(w, h, seed), "jpg")

  /** Multi-page TIFF "video": frame f carries the seeded pattern with
    * seed + f*FrameSeedStep. TIFF is lossless, so sampled-frame pixel
    * statistics stay oracle-predictable. */
  val FrameSeedStep = 97L

  def encodeTiffFrames(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        writer.writeToSequence(
          new IIOImage(seededImage(w, h, seed + f * FrameSeedStep), null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Container sniff through ImageIO's registered readers — the real
    * magic-byte dispatch, normalized to lowercase canonical names. */
  def sniffFormat(payload: Array[Byte]): String = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) "unknown"
      else readers.next().getFormatName.toLowerCase match {
        case "tif"          => "tiff"
        case "jpg"          => "jpeg"
        case other          => other
      }
    } finally iis.close()
  }

  def decode(payload: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "ImageIO could not decode payload")
    img
  }

  def tryDecode(payload: Array[Byte]): Option[BufferedImage] =
    Option(ImageIO.read(new ByteArrayInputStream(payload)))

  /** Sum of (r+g+b) over every decoded pixel — the whole-image statistic
    * the lossless oracles verify. */
  def pixelSumRgb(img: BufferedImage): Long = {
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
        x += 1
      }
      y += 1
    }
    sum
  }

  /** Nearest-neighbor resample over decoded pixels — same source-index
    * mapping as [[MediaCodec.resizeBmpNearest]] (sx = x2*w/w2) so both
    * codec tiers share the resize oracle algebra. */
  def resizeNearest(src: BufferedImage, w2: Int, h2: Int): BufferedImage = {
    val out = new BufferedImage(w2, h2, BufferedImage.TYPE_INT_RGB)
    var y2 = 0
    while (y2 < h2) {
      val sy = y2 * src.getHeight / h2
      var x2 = 0
      while (x2 < w2) {
        out.setRGB(x2, y2, src.getRGB(x2 * src.getWidth / w2, sy))
        x2 += 1
      }
      y2 += 1
    }
    out
  }

  /** Every `stride`-th frame of a multi-page container, decoded — one
    * reader open per payload, not per frame. */
  def sampleFrames(payload: Array[Byte], stride: Int): Seq[(Int, BufferedImage)] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    val readers = ImageIO.getImageReaders(iis)
    if (!readers.hasNext) { iis.close(); return Seq.empty }
    val reader = readers.next()
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      (0 until n by stride).map(f => (f, reader.read(f)))
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  def frameCount(payload: Array[Byte]): Int = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    val readers = ImageIO.getImageReaders(iis)
    if (!readers.hasNext) { iis.close(); return 0 }
    val reader = readers.next()
    try {
      reader.setInput(iis)
      reader.getNumImages(true)
    } finally {
      reader.dispose()
      iis.close()
    }
  }
}
