package graft.multimodal

/** Real pure-JVM codecs for the uncompressed media containers (BMP
  * 24bpp, WAV PCM16) — no external image/audio libraries needed, so the
  * decode path stops being a stub for these formats. Compressed codecs
  * (png/jpeg/mp4) remain out of sandbox scope; `sniff` routes them to
  * the caller's fallback.
  *
  * Everything here is byte-exact and deterministic, which is what lets
  * the mm4–mm6 queries oracle REAL decoding: the synthesized payloads
  * are arithmetic functions of (doc_id), so DuckDB can predict the
  * decoded metadata and even the PCM sample statistics in closed form.
  */
object MediaCodec {

  // -- format sniffing ---------------------------------------------------
  sealed trait Sniff
  case object Bmp extends Sniff
  case object Wav extends Sniff
  case object Unknown extends Sniff

  def sniff(b: Array[Byte]): Sniff =
    if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') Bmp
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') Wav
    else Unknown

  // -- little-endian helpers --------------------------------------------
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def putLe16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
  }
  private def putLe32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
    b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
  }

  // -- BMP (24bpp, bottom-up, BITMAPINFOHEADER) -------------------------
  final case class BmpInfo(width: Int, height: Int, bpp: Int)

  private def rowSize(w: Int): Int = (w * 3 + 3) / 4 * 4

  /** Deterministic pixel pattern (BGR) — the arithmetic the oracle and
    * the resize test replay. */
  @inline def pixelB(seed: Long, x: Int, y: Int): Int = ((seed + x * 7 + y * 13) & 0xFF).toInt
  @inline def pixelG(seed: Long, x: Int, y: Int): Int = ((seed + x * 11 + y * 3) & 0xFF).toInt
  @inline def pixelR(seed: Long, x: Int, y: Int): Int = ((seed + x * 5 + y * 17) & 0xFF).toInt

  def encodeBmp(w: Int, h: Int, seed: Long): Array[Byte] = {
    val rs = rowSize(w)
    val dataSize = rs * h
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, out.length); putLe32(out, 10, 54)
    putLe32(out, 14, 40); putLe32(out, 18, w); putLe32(out, 22, h)
    putLe16(out, 26, 1); putLe16(out, 28, 24)
    putLe32(out, 34, dataSize)
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * rs // bottom-up storage
      var x = 0
      while (x < w) {
        val o = rowOff + x * 3
        out(o) = pixelB(seed, x, y).toByte
        out(o + 1) = pixelG(seed, x, y).toByte
        out(o + 2) = pixelR(seed, x, y).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  def decodeBmpHeader(b: Array[Byte]): Option[BmpInfo] =
    if (sniff(b) != Bmp || b.length < 54) None
    else Some(BmpInfo(le32(b, 18), le32(b, 22), le16(b, 28)))

  /** (x, y) pixel as (b, g, r) — real pixel access incl. bottom-up rows
    * and 4-byte row padding. */
  def bmpPixel(b: Array[Byte], x: Int, y: Int): (Int, Int, Int) = {
    val info = decodeBmpHeader(b).getOrElse(
      throw new IllegalArgumentException("not a BMP"))
    val rs = rowSize(info.width)
    val o = le32(b, 10) + (info.height - 1 - y) * rs + x * 3
    ((b(o) & 0xFF), (b(o + 1) & 0xFF), (b(o + 2) & 0xFF))
  }

  /** Nearest-neighbor resize: decode real pixels, resample, re-encode —
    * an actual image transform, not a byte truncation. */
  def resizeBmpNearest(src: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
    val info = decodeBmpHeader(src).getOrElse(
      throw new IllegalArgumentException("not a BMP"))
    val srcRs = rowSize(info.width)
    val dstRs = rowSize(w2)
    val out = new Array[Byte](54 + dstRs * h2)
    System.arraycopy(src, 0, out, 0, 54)
    putLe32(out, 2, out.length); putLe32(out, 18, w2); putLe32(out, 22, h2)
    putLe32(out, 34, dstRs * h2)
    val dataOff = le32(src, 10)
    var y2 = 0
    while (y2 < h2) {
      val sy = y2 * info.height / h2
      val srcRow = dataOff + (info.height - 1 - sy) * srcRs
      val dstRow = 54 + (h2 - 1 - y2) * dstRs
      var x2 = 0
      while (x2 < w2) {
        val sx = x2 * info.width / w2
        val so = srcRow + sx * 3
        val dO = dstRow + x2 * 3
        out(dO) = src(so); out(dO + 1) = src(so + 1); out(dO + 2) = src(so + 2)
        x2 += 1
      }
      y2 += 1
    }
    out
  }

  // -- WAV (RIFF, PCM16 mono) -------------------------------------------
  final case class WavInfo(channels: Int, sampleRate: Int,
      bitsPerSample: Int, nFrames: Int, dataOffset: Int)

  /** Deterministic PCM sample i for a payload seed — replayed by the
    * mm6 oracle in SQL. */
  @inline def sampleAt(seed: Long, i: Int): Int =
    (((seed + i * 2654435761L) % 65536L).toInt - 32768)

  def encodeWavPcm16(nFrames: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val dataSize = nFrames * 2
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLe32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLe32(out, 16, 16); putLe16(out, 20, 1); putLe16(out, 22, 1)
    putLe32(out, 24, sampleRate); putLe32(out, 28, sampleRate * 2)
    putLe16(out, 32, 2); putLe16(out, 34, 16)
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLe32(out, 40, dataSize)
    var i = 0
    while (i < nFrames) {
      putLe16(out, 44 + i * 2, sampleAt(seed, i) & 0xFFFF)
      i += 1
    }
    out
  }

  /** Real RIFF chunk walk (not fixed offsets): finds `fmt ` and `data`
    * wherever they sit, as a robust parser must. */
  def decodeWavHeader(b: Array[Byte]): Option[WavInfo] = {
    if (sniff(b) != Wav) return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(b.slice(off, off + 4), "US-ASCII")
      val size = le32(b, off + 4)
      if (id == "fmt " && off + 8 + 16 <= b.length)
        fmt = Some((le16(b, off + 10), le32(b, off + 12), le16(b, off + 22)))
      else if (id == "data") data = Some((off + 8, size))
      off += 8 + size + (size & 1) // RIFF chunks are 2-byte aligned
    }
    for ((ch, rate, bits) <- fmt; (dOff, dSize) <- data)
      yield WavInfo(ch, rate, bits, dSize / (ch * bits / 8), dOff)
  }

  def wavSample(b: Array[Byte], info: WavInfo, i: Int): Int = {
    val v = le16(b, info.dataOffset + i * 2)
    if (v >= 32768) v - 65536 else v
  }
}
