package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.4): corral's only aggregation hook is
  * writing a `Reducer`; the Spark-native typed equivalent is
  * `Aggregator[IN, BUF, OUT]` — partial (map-side) aggregation, spillable
  * merge, codegen'd buffer encoding, none of which the reference has.
  *
  * The buffer keeps exact integer sums so `finish` is a single
  * deterministic IEEE division — oracle-stable (see QueryDef notes).
  */
object Aggregators {

  final case class LangDoc(lang: String, n_chars: Long)

  /** Mean chars per group via exact (Long, Long) sums. */
  object MeanChars extends Aggregator[LangDoc, (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), d: LangDoc): (Long, Long) =
      (b._1 + d.n_chars, b._2 + 1)
    override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Long, Long)): Double = b._1.toDouble / b._2
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Deterministic-arithmetic HyperLogLog (Flajolet et al. '07) over
    * Long keys. Everything is mod-P affine hashing + trailing-zero
    * ranks + exact power-of-two arithmetic, so the DuckDB oracle
    * replays the ENTIRE sketch bit-for-bit — an approximate operator
    * with an exact correctness gate (HllAggregatorSpec additionally
    * pins the estimate's relative error).
    *
    * Buffer = 64 per-bucket max ranks; merge is element-wise max (a
    * commutative idempotent monoid → partial aggregation is safe).
    * The finish sum is order-independent IN IEEE DOUBLES, not just
    * mathematically: each term 2^-M[j] is an exact power of two ≥ 2^-25
    * and ≤ 1, so every partial sum of ≤64 terms fits a 53-bit mantissa
    * exactly — merge order can't perturb the oracle hash. Raw estimate
    * only (no small/large-range correction; rel-err ~1.04/√64 ≈ 13%).
    */
  object Hll {
    val M = 64 // buckets (b = 6)
    val RankCap = 25
    val P = graft.functions.PolyHashConstants.P
    // affine + quadratic-scramble constants
    val A1 = 1103515245L; val B1 = 12345L
    val B2 = 2531011L
    // shortest-round-trip Double literal — DuckDB parses back the same bits
    val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)

    /** Affine + quadratic scramble mod P: g = ((x·A1+B1 mod P)² + B2)
      * mod P. The quadratic step matters — bucket and rank derived from
      * two affine maps of x are correlated on arithmetic-progression
      * keys (sequential ids!) and skewed HLL estimates 45% in testing;
      * squaring breaks the progression structure while staying plain
      * BIGINT arithmetic the oracle can replay (h < 2³¹ ⇒ h² < 2⁶²). */
    def mixed(x: Long): Long = {
      val h = (java.lang.Math.floorMod(x, P) * A1 + B1) % P
      (h * h + B2) % P
    }

    /** Standard HLL split of one hash: low 6 bits → bucket. */
    def bucket(x: Long): Int = (mixed(x) % M).toInt

    /** Upper bits → rank = trailing zeros + 1, capped (ntz(h)=k ⟺
      * h mod 2^(k+1) = 2^k — the form the oracle's CASE cascade tests). */
    def rank(x: Long): Int = {
      val v = mixed(x) / M
      math.min(java.lang.Long.numberOfTrailingZeros(v) + 1, RankCap)
    }

    def estimate(maxRanks: Array[Byte]): Double = {
      var sum = 0.0
      var j = 0
      while (j < M) { sum += 1.0 / (1L << maxRanks(j)).toDouble; j += 1 }
      Alpha * M * M / sum
    }
  }

  /** Buffer = 64 byte-sized max ranks (rank ≤ 25), encoded BINARY. */
  object HllDistinct extends Aggregator[Long, Array[Byte], Double] {
    import Hll._
    override def zero: Array[Byte] = new Array[Byte](M)
    override def reduce(b: Array[Byte], x: Long): Array[Byte] = {
      val j = bucket(x)
      val r = rank(x).toByte
      if (r > b(j)) b(j) = r
      b
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var j = 0
      while (j < M) { if (b(j) > a(j)) a(j) = b(j); j += 1 }
      a
    }
    override def finish(b: Array[Byte]): Double = estimate(b)
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
