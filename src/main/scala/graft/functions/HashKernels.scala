package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Shared constants of the deterministic polynomial hash family. All
  * dedup/fingerprint hashing is `*`/`+`/`%` arithmetic mod a ~2³¹ prime
  * over Unicode code points — no bit mixing — precisely so the DuckDB
  * oracle can reproduce every value with plain BIGINT SQL (products stay
  * < 2⁶³). Where uniform bits are needed (SimHash votes), they come from
  * affine functions mod P thresholded at P/2, not from raw hash bits.
  */
object PolyHashConstants {
  val P: Long = 2038074743L     // prime, ~2^31 (shared with MinHashConstants)
  val B: Long = 1000003L        // polynomial base
  val Half: Long = P / 2
  // 64 affine vote functions for SimHash: bit b of a token's contribution
  // is [((h*SimA(b)+SimB(b)) mod P) >= P/2]
  val SimA: Array[Long] = (1 to 64).map(b => 1566083941L * b % P).toArray
  val SimB: Array[Long] = (1 to 64).map(b => 340573321L * b * b % P).toArray
}

/** Row-level kernels behind the native expressions. Top-level object →
  * scalac emits static forwarders, so whole-stage codegen can call
  * `graft.functions.HashKernels.<kernel>(...)` directly: one static
  * call per row inside the generated loop, no interpreted expression
  * walk (CodegenFallback would re-enter the interpreter per row).
  */
object HashKernels {
  import PolyHashConstants.{B, Half, P, SimA, SimB}

  /** Deterministic polynomial string hash mod P over code points:
    * h = fold(cp)(h*B + cp mod P). DuckDB twin: list_reduce over
    * unicode(s[i]). Code points (not UTF-16 units) so both engines
    * iterate the same values on any input. */
  def strHashP(v: UTF8String): Long = {
    val s = v.toString
    var h = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      h = (h * B + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** strHashP over a substring range plus a joining-space fold — used by
    * shingleHashes to hash "tok1 tok2 tok3" without building the string. */
  private def hashToken(s: String, from: Int, until: Int, h0: Long): Long = {
    var h = h0
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      h = (h * B + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Sorted distinct strHashP of the 3-token shingles ("tok1 tok2 tok3"
    * joined with single spaces — the exact string the DuckDB oracle
    * hashes). */
  def shingleHashes(v: UTF8String): ArrayData = {
    val s = v.toString
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) { starts.add(start); ends.add(i) }
    }
    val n = starts.size()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val set = new java.util.HashSet[java.lang.Long](n * 2)
    var t = 0
    while (t <= n - 3) {
      var h = hashToken(s, starts.get(t), ends.get(t), 0L)
      h = (h * B + ' ') % P
      h = hashToken(s, starts.get(t + 1), ends.get(t + 1), h)
      h = (h * B + ' ') % P
      h = hashToken(s, starts.get(t + 2), ends.get(t + 2), h)
      set.add(h)
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

  /** 64-bit SimHash over token hashes: the per-token vote for bit b is
    * the sign of [((h mod P)*SimA(b)+SimB(b)) mod P >= P/2] — affine
    * mod-P projections instead of raw hash bits, so a polynomial token
    * hash (whose high bits are NOT uniform) still yields uniform
    * signature bits, and the DuckDB oracle reproduces each vote with
    * BIGINT arithmetic. */
  def simhashP(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = java.lang.Math.floorMod(arr.getLong(i), P)
      var b = 0
      while (b < 64) {
        if ((h * SimA(b) + SimB(b)) % P >= Half) votes(b) += 1 else votes(b) -= 1
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

  /** regex-\s character class (what split("\\s+") and DuckDB's
    * string_split_regex('\s+') separate on — narrower than
    * Character.isWhitespace). */
  @inline private def isRegexWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Fused SimHash of a document, replaying exactly
    * `simhashP(list_transform(list_distinct(string_split_regex(
    * trim(text), '\s+')), strHashP))`: space-trim (SQL trim removes
    * only ' '), \s+-tokenize, distinct BY TOKEN (dedupe happens before
    * hashing, so a hash collision between distinct tokens still casts
    * two votes, as the oracle's does), strHashP each token, affine
    * mod-P votes. One pass, no intermediate array — replaces an
    * interpreted `transform` HOF in the dd4 path. */
  def simhashText(v: UTF8String): Long = {
    val s0 = v.toString
    var lo = 0
    var hi = s0.length
    while (lo < hi && s0.charAt(lo) == ' ') lo += 1
    while (hi > lo && s0.charAt(hi - 1) == ' ') hi -= 1
    val s = s0.substring(lo, hi)
    val votes = new Array[Int](64)
    def vote(h: Long): Unit = {
      var b = 0
      while (b < 64) {
        if ((h * SimA(b) + SimB(b)) % P >= Half) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    if (s.isEmpty) vote(0L) // split('') == [''] in both engines; hash("") = 0
    else {
      val seen = new java.util.HashSet[String]()
      // Spark SQL's split(str, re) uses limit -1: a (space-trimmed)
      // string that starts OR ends with regex whitespace (e.g. a tab)
      // yields an "" token there — matching string_split_regex, unlike
      // java.lang.String.split which drops trailing empties
      if ((isRegexWs(s.charAt(0)) || isRegexWs(s.charAt(s.length - 1))) &&
        seen.add("")) vote(0L)
      val len = s.length
      var i = 0
      while (i < len) {
        while (i < len && isRegexWs(s.charAt(i))) i += 1
        val start = i
        while (i < len && !isRegexWs(s.charAt(i))) i += 1
        if (i > start && seen.add(s.substring(start, i)))
          vote(hashToken(s, start, i, 0L))
      }
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

  /** The `split(trim(text), "\\s+")` tokenization both gram kernels
    * share: space-only trim, regex-\s separators with limit -1
    * semantics (leading/trailing NON-SPACE whitespace yields empty edge
    * tokens; the empty string splits to [""]). */
  private def splitRegexWs(s: String): java.util.ArrayList[String] = {
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    val toks = new java.util.ArrayList[String]()
    if (start == end) toks.add("") // split("", re) = [""]
    else {
      if (isRegexWs(s.charAt(start))) toks.add("") // leading separator
      var i = start
      while (i < end) {
        while (i < end && isRegexWs(s.charAt(i))) i += 1
        val b = i
        while (i < end && !isRegexWs(s.charAt(i))) i += 1
        if (i > b) toks.add(s.substring(b, i))
      }
      if (isRegexWs(s.charAt(end - 1))) toks.add("") // trailing separator
    }
    toks
  }

  /** Highest multiplicity among the word n-grams of the document — the
    * Gopher-gate "top n-gram mass" numerator — in ONE linear pass
    * (hashmap count, running max). Semantically equal to
    * `max over distinct g in grams of count(grams, _ == g)` (pinned in
    * KernelSpec), but O(tokens) instead of the nested-HOF form's
    * O(distinct·tokens) — the difference between 10⁴ and 10⁸ compares
    * on a 10⁴-token web document. 0 when the doc has fewer than n
    * tokens (empty gram array). */
  def topGramCount(v: UTF8String, n: Int): Int = {
    val toks = splitRegexWs(v.toString)
    val m = toks.size - n + 1
    if (m <= 0) 0
    else {
      val counts = new java.util.HashMap[String, Integer](m * 2)
      var best = 0
      var j = 0
      while (j < m) {
        val sb = new java.lang.StringBuilder(16 * n)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks.get(j + k))
          k += 1
        }
        val g = sb.toString
        val prev = counts.get(g)
        val c = if (prev == null) 1 else prev.intValue() + 1
        counts.put(g, c)
        if (c > best) best = c
        j += 1
      }
      best
    }
  }

  /** Word n-grams over the `split(trim(text), "\\s+")` tokenization in
    * ONE pass — the plan-shape fix for gram explodes: `Generate` inlines
    * expression trees without common-subexpression elimination, so the
    * higher-order-function formulation re-splits the text once per
    * element_at per gram (~4n regex splits per document at n=4).
    * Replicates the composed semantics exactly: space-only `trim`, then
    * regex-\s splitting with limit -1 (leading/trailing NON-SPACE
    * whitespace yields empty edge tokens — see the split gotcha pinned
    * in KernelSpec). Grams join n consecutive tokens with one space;
    * fewer than n tokens → empty array. */
  def wordNGrams(v: UTF8String, n: Int): ArrayData = {
    val toks = splitRegexWs(v.toString)
    val m = toks.size - n + 1
    if (m <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](m)
      var j = 0
      while (j < m) {
        val sb = new java.lang.StringBuilder(16 * n)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks.get(j + k))
          k += 1
        }
        out(j) = UTF8String.fromString(sb.toString)
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  private val WinnowBase = 257L

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD '03):
    * Rabin–Karp rolling hash over code-point k-grams, then the minimum
    * of each w-hash window; the distinct sorted minima are the
    * fingerprint set. Two documents sharing a run of ≥ k+w-1 chars
    * share a fingerprint — the guarantee threshold. Arithmetic is
    * polynomial mod P (the rolling form ≡ the direct k-term polynomial
    * the DuckDB oracle computes, since both reduce the same polynomial
    * mod P). */
  def winnow(v: UTF8String, k: Int, w: Int): ArrayData = {
    val s = v.toString
    // code-point array (matches DuckDB's per-character unicode() walk)
    val cps = new Array[Int](s.codePointCount(0, s.length))
    var ci = 0
    var si = 0
    while (si < s.length) {
      val cp = s.codePointAt(si)
      cps(ci) = cp; ci += 1
      si += Character.charCount(cp)
    }
    val len = cps.length
    if (len < k) return new GenericArrayData(Array.emptyLongArray)
    val m = len - k + 1
    val hashes = new Array[Long](m)
    // B^(k-1) mod P
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow = pow * WinnowBase % P; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (h * WinnowBase + cps(i)) % P; i += 1 }
    hashes(0) = h
    i = 1
    while (i < m) {
      h = java.lang.Math.floorMod(
        (h - cps(i - 1) * pow % P) * WinnowBase + cps(i + k - 1), P)
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

  /** Plane coefficient for hyperplane LSH: the (t, p, d) lattice point
    * pushed through two quadratic-scramble rounds mod P (the affine and
    * quadratic constants shared with the HLL scramble). The raw lattice
    * `(base + d·13007) mod smallPrime` that round 1 used produces planes
    * with pairwise |cos| up to 1.0 (literally duplicated hyperplanes
    * across tables), which capped multi-table recall; after scrambling,
    * measured pairwise plane |cos| stays < 0.45 at d=64 and planted-pair
    * recall matches fresh-gaussian planes. All arithmetic is exact
    * BIGINT congruences (h < P ~ 2^31, so h*h < 2^62 never overflows)
    * + one IEEE division — bit-reproducible in DuckDB. */
  def planeCoef(t: Int, p: Int, d: Int): Double = {
    import PolyHashConstants.P
    var h = (t.toLong * 7919L + p.toLong * 104729L + d.toLong * 13007L) % P
    h = (h * h + 2531011L) % P
    h = (h * 1103515245L + 12345L) % P
    h = (h * h + 2531011L) % P
    h.toDouble / P - 0.5
  }

  // Memoized plane rows: the scramble is 4 multiply-mods per
  // coefficient, so computing it inside the per-vector loop would cost
  // tables*planes*dim*4 mults per row. Planes depend only on (t, p, n);
  // a session processes a handful of geometries, so the cache stays
  // tiny (one double[] per plane per seen dimension).
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]
  private def planeRow(t: Int, p: Int, n: Int): Array[Double] =
    planeCache.computeIfAbsent((t, p, n), { key =>
      Array.tabulate(key._3)(d => planeCoef(key._1, key._2, d))
    })

  /** Random-hyperplane LSH signatures (scrambled-congruence planes). */
  def lshSignatures(x: ArrayData, tables: Int, planes: Int): ArrayData = {
    val n = x.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < planes) {
        val row = planeRow(t, p, n)
        var dot = 0.0
        var d = 0
        while (d < n) {
          dot += x.getFloat(d).toDouble * row(d)
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

  // -- Bloom filter (deterministic scrambled-affine hash family) --------
  // Position i of key x: quadratic-scramble((x mod P)·SimA(i)+SimB(i)
  // mod P) mod mBits — seed-free congruences the DuckDB oracle replays
  // exactly (Spark's own BloomFilterAggregate uses murmur, which an
  // external oracle cannot reproduce). The quadratic round is load-
  // bearing: SimA(i) is linear in i, and without the scramble the k
  // probes of a key are affinely coupled across i (measured 0 false
  // positives where ~9 are predicted on the sf0.01 custkey fixture —
  // a degenerate anti-correlation that flips to FP *inflation* on
  // other key spacings). Scrambled, the measured rate matches the
  // (1-e^(-kn/m))^k prediction.

  def bloomPos(x: Long, i: Int, mBits: Int): Int = {
    import PolyHashConstants.{P, SimA, SimB}
    val h = (java.lang.Math.floorMod(x, P) * SimA(i) + SimB(i)) % P
    ((h * h + 2531011L) % P % mBits).toInt
  }

  /** Set key x's k bits in place (bit p lives at bits(p>>>3), 1<<(p&7)). */
  def bloomSet(bits: Array[Byte], x: Long, k: Int): Unit = {
    val m = bits.length * 8
    var i = 0
    while (i < k) {
      val p = bloomPos(x, i, m)
      bits(p >>> 3) = (bits(p >>> 3) | (1 << (p & 7))).toByte
      i += 1
    }
  }

  /** No false negatives; false positives at the classic
    * (1-e^(-kn/m))^k rate. m is carried by the array length. */
  def bloomMightContain(bits: Array[Byte], x: Long, k: Int): Boolean = {
    val m = bits.length * 8
    var i = 0
    while (i < k) {
      val p = bloomPos(x, i, m)
      if ((bits(p >>> 3) & (1 << (p & 7))) == 0) return false
      i += 1
    }
    true
  }
}
