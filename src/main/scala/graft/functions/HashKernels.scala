package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level kernels behind the native expressions. Top-level object →
  * scalac emits static forwarders, so whole-stage codegen can call
  * `graft.functions.HashKernels.<kernel>(...)` directly: one static
  * call per row inside the generated loop, no interpreted expression
  * walk (CodegenFallback would re-enter the interpreter per row).
  */
object HashKernels {

  /** Sorted distinct xxhash64(seed=42) of the 3-token shingles. */
  def shingleHashes(v: UTF8String): ArrayData = {
    val s = v.toString
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) toks.add(s.substring(start, i))
    }
    val n = toks.size()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val set = new java.util.HashSet[java.lang.Long](n * 2)
    val sb = new java.lang.StringBuilder(64)
    var t = 0
    while (t <= n - 3) {
      sb.setLength(0)
      sb.append(toks.get(t)).append(' ')
        .append(toks.get(t + 1)).append(' ').append(toks.get(t + 2))
      val u = UTF8String.fromString(sb.toString)
      set.add(XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L))
      t += 1
    }
    val out = new Array[Long](set.size())
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** K minhash values of an array of raw 64-bit hashes. */
  def minhashSig(arr: ArrayData): ArrayData = {
    import MinHashConstants._
    val n = arr.numElements()
    val out = new Array[Long](K)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = java.lang.Math.floorMod(arr.getLong(i), Prime)
      var j = 0
      while (j < K) {
        val x = java.lang.Math.floorMod(h * As(j) + Bs(j), Prime)
        if (x < out(j)) out(j) = x
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Merge-count of two sorted distinct long arrays. */
  def sortedIntersectCount(x: ArrayData, y: ArrayData): Int = {
    var i = 0; var j = 0; var c = 0
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  /** 64-bit SimHash over token hashes (±1 vote per bit). */
  def simhash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Wordcount tokens: maximal runs of ASCII alphanumerics, lowercased —
    * provably equivalent to
    * `split(lower(regexp_replace(s, "[^a-zA-Z0-9\\s]+", " ")), "\\s+")`
    * minus empty strings (any non-alnum char separates in both forms;
    * lowercasing only affects A-Z). One pass, no regex. */
  def tokenizeWords(v: UTF8String): ArrayData = {
    val s = v.toString
    val len = s.length
    val out = new java.util.ArrayList[UTF8String]()
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    while (i <= len) {
      val alnum = i < len && {
        val c = s.charAt(i)
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
      }
      if (alnum) {
        val c = s.charAt(i)
        sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      } else if (sb.length > 0) {
        out.add(UTF8String.fromString(sb.toString))
        sb.setLength(0)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private val WinnowBase = 257L

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD '03):
    * Rabin–Karp rolling hash over character k-grams, then the minimum
    * of each w-hash window; the distinct sorted minima are the
    * fingerprint set. Two documents sharing a run of ≥ k+w-1 chars
    * share a fingerprint — the guarantee threshold. Arithmetic is
    * wrap-around 64-bit (deterministic everywhere). */
  def winnow(v: UTF8String, k: Int, w: Int): ArrayData = {
    val s = v.toString
    val len = s.length
    if (len < k) return new GenericArrayData(Array.emptyLongArray)
    val m = len - k + 1
    val hashes = new Array[Long](m)
    // B^(k-1) with wrap-around
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= WinnowBase; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * WinnowBase + s.charAt(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < m) {
      h = (h - s.charAt(i - 1) * pow) * WinnowBase + s.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    if (m < w) {
      var mn = Long.MaxValue
      i = 0
      while (i < m) { if (hashes(i) < mn) mn = hashes(i); i += 1 }
      return new GenericArrayData(Array(mn))
    }
    val set = new java.util.HashSet[java.lang.Long]()
    i = 0
    while (i <= m - w) {
      var mn = Long.MaxValue
      var j = i
      while (j < i + w) { if (hashes(j) < mn) mn = hashes(j); j += 1 }
      set.add(mn)
      i += 1
    }
    val out = new Array[Long](set.size())
    val it = set.iterator()
    var c = 0
    while (it.hasNext) { out(c) = it.next(); c += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** Random-hyperplane LSH signatures (integer-congruential planes). */
  def lshSignatures(x: ArrayData, tables: Int, planes: Int): ArrayData = {
    val n = x.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < planes) {
        var dot = 0.0
        var d = 0
        val base = t * 7919 + p * 104729
        while (d < n) {
          val c = ((base + d * 13007) % 2039).toDouble / 2039.0 - 0.5
          dot += x.getFloat(d).toDouble * c
          d += 1
        }
        if (dot >= 0) sig |= (1L << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }
}
