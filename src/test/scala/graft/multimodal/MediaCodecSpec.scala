package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class MediaCodecSpec extends AnyFunSuite {
  import MediaCodec._

  test("BMP encode/decode round-trips header and every pixel") {
    val (w, h, seed) = (13, 7, 42L) // odd width exercises row padding
    val bmp = encodeBmp(w, h, seed)
    assert(sniff(bmp) == Bmp)
    assert(decodeBmpHeader(bmp).contains(BmpInfo(w, h, 24)))
    for (y <- 0 until h; x <- 0 until w)
      assert(bmpPixel(bmp, x, y) ==
        ((pixelB(seed, x, y), pixelG(seed, x, y), pixelR(seed, x, y))),
        s"pixel ($x,$y)")
  }

  test("nearest-neighbor resize resamples the actual source pixels") {
    val (w, h, seed) = (16, 12, 9L)
    val resized = resizeBmpNearest(encodeBmp(w, h, seed), 8, 6)
    assert(decodeBmpHeader(resized).contains(BmpInfo(8, 6, 24)))
    for (y2 <- 0 until 6; x2 <- 0 until 8) {
      val (sx, sy) = (x2 * w / 8, y2 * h / 6)
      assert(bmpPixel(resized, x2, y2) ==
        ((pixelB(seed, sx, sy), pixelG(seed, sx, sy), pixelR(seed, sx, sy))),
        s"resized pixel ($x2,$y2) != source ($sx,$sy)")
    }
  }

  test("WAV encode/decode round-trips format and PCM samples") {
    val wav = encodeWavPcm16(nFrames = 37, sampleRate = 16000, seed = 5L)
    assert(sniff(wav) == Wav)
    val info = decodeWavHeader(wav).get
    assert(info.channels == 1 && info.sampleRate == 16000 &&
      info.bitsPerSample == 16 && info.nFrames == 37)
    for (i <- 0 until 37)
      assert(wavSample(wav, info, i) == sampleAt(5L, i), s"sample $i")
  }

  test("WAV parser walks RIFF chunks, not fixed offsets") {
    val wav = encodeWavPcm16(nFrames = 5, sampleRate = 8000, seed = 1L)
    // splice an unknown 6-byte chunk between fmt and data (odd size
    // exercises the 2-byte chunk alignment rule)
    val extra = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = wav.slice(0, 36) ++ extra ++ wav.drop(36)
    // patch RIFF size
    val out = spliced.clone()
    val newSize = out.length - 8
    out(4) = newSize.toByte; out(5) = (newSize >> 8).toByte
    out(6) = (newSize >> 16).toByte; out(7) = (newSize >> 24).toByte
    val info = decodeWavHeader(out).get
    assert(info.nFrames == 5 && info.sampleRate == 8000)
    assert((0 until 5).forall(i => wavSample(out, info, i) == sampleAt(1L, i)))
  }

  test("sniff rejects non-media bytes (the stub-fallback route)") {
    assert(sniff("plain text".getBytes) == Unknown)
    assert(sniff(Array.emptyByteArray) == Unknown)
    assert(decodeBmpHeader("BMx".getBytes).isEmpty) // magic but truncated
    assert(decodeWavHeader("RIFFxxxxTRSH".getBytes).isEmpty)
  }
}
