package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PolyHashConstants

/** Deterministic sampling operators for training-data pipelines —
  * corpus rebalancing ("downsample the dominant language / source to a
  * target mix") without RNG state: a row's fate is a pure function of
  * its id, so the sample is reproducible across runs, engines, and
  * retries (a task retry CANNOT change the sample — the property that
  * makes sampling safe under Spark's recompute-on-failure model).
  *
  * Keep rule: scramble(id) mod P < fraction·P, with the affine+
  * quadratic scramble mod P shared with the HLL/LSH kernels — exact
  * BIGINT congruences replayed verbatim by the DuckDB oracle. The hash
  * is uniform on [0, P), so the realized rate concentrates at the
  * requested fraction (±O(1/√n) per stratum).
  */
object Sampling {
  import PolyHashConstants.P

  private val A1 = 1103515245L
  private val B1 = 12345L
  private val B2 = 2531011L

  /** scramble(id) ∈ [0, P): ((id mod P)·A1+B1 mod P)² + B2 mod P.
    * All intermediates < 2^62 — no overflow in Long or DuckDB BIGINT. */
  def scramble(id: Column): Column = {
    val h = (pmod(id, lit(P)) * A1 + B1) % P
    (h * h + B2) % P
  }

  /** Same congruence as a DuckDB SQL fragment. The double-mod mirrors
    * Spark's `pmod` for negative ids (DuckDB `%` keeps the dividend's
    * sign, so a bare `$id % $P` would diverge below zero). */
  def scrambleSql(id: String): String = {
    val idm = s"((($id % $P) + $P) % $P)"
    val h = s"(($idm * $A1 + $B1) % $P)"
    s"(($h * $h + $B2) % $P)"
  }

  /** Double literal that survives any magnitude: Scala's shortest
    * round-trip repr goes scientific below 1e-3 ("1.0E-4"), which a
    * bare `${f}e0` suffix would corrupt; a quoted CAST parses every
    * form to the identical IEEE double. */
  private def dlit(f: Double): String = s"CAST('$f' AS DOUBLE)"

  private def slit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Uniform deterministic Bernoulli sample at `fraction`. */
  def uniform(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0, 1], got $fraction")
    df.filter(scramble(col(idCol)).cast("double") < lit(fraction * P))
  }

  /** Per-stratum deterministic sample: `fractions` maps stratum values
    * to keep rates; strata not listed use `default`. One codegen'd
    * filter — no shuffle, no per-stratum pass, pushdown-friendly. */
  def stratified(df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double], default: Double = 0.0): DataFrame = {
    require((default +: fractions.values.toSeq).forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0, 1]")
    val frac = fractions.foldLeft(lit(default)) { case (acc, (k, f)) =>
      when(col(strataCol) === lit(k), lit(f)).otherwise(acc)
    }
    df.filter(scramble(col(idCol)).cast("double") < frac * P)
  }

  /** Per-stratum token-budget cap: order each stratum by the
    * deterministic priority scramble(id) (ties broken by id), then keep
    * the prefix whose running token total stays ≤ `budget` — "cap every
    * language at N tokens", reproducibly (same keep-set on every run,
    * engine, and task retry). Prefix semantics: a row that overflows
    * the budget is dropped and does NOT let later rows fill the gap.
    *
    * Scale note: the running sum is a window over the stratum, so one
    * shuffle on the stratum key. With few huge strata (5 languages at
    * 100 TB) the exact form skews; the scale path is a two-pass variant
    * — approximate the priority threshold per stratum from a sample
    * (percentile of scramble weighted by tokens), broadcast thresholds,
    * filter. The exact window form is the semantic ground truth the
    * oracle checks. */
  def tokenBudget(df: DataFrame, strataCol: String, idCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    // `cum_tokens` is part of the OUTPUT contract (callers and the ds2
    // oracle read it), so an input column of the same name would be
    // silently clobbered — refuse instead.
    require(!df.columns.contains("cum_tokens"),
      "tokenBudget emits a cum_tokens column; rename the input's cum_tokens first")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(scramble(col(idCol)), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // a negative count would let the running total dip back under the
    // budget and break the prefix semantics — fail loud per row
    val checkedTokens = when(col(tokensCol) >= 0, col(tokensCol))
      .otherwise(raise_error(concat(
        lit(s"tokenBudget: negative $tokensCol for $idCol="),
        col(idCol).cast("string"))))
    df.withColumn("cum_tokens", sum(checkedTokens).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** The skew-safe form of [[tokenBudget]] for few-huge-strata inputs
    * (5 languages × 20 TB each): pre-filter every stratum to the
    * priority prefix expected to hold `oversample`× the budget —
    * threshold computed IN-PLAN from the exact per-stratum token
    * totals, broadcast back — then run the exact window only on the
    * survivors. The window sorts ~oversample·budget tokens per stratum
    * instead of the whole stratum.
    *
    * Returns exactly [[tokenBudget]]'s rows whenever the oversampled
    * prefix covers the budget: the exact keep-set is a priority prefix,
    * and any priority prefix holding ≥ budget tokens contains it.
    * scramble is uniform on [0,P), so oversample ≥ 2 covers w.h.p.;
    * strata with ≤ oversample·budget total tokens keep everything
    * (threshold clamps to 1) and are exact unconditionally. */
  def tokenBudgetThreshold(df: DataFrame, strataCol: String, idCol: String,
      tokensCol: String, budget: Long, oversample: Double = 2.0): DataFrame = {
    require(oversample >= 1.0, s"oversample must be >= 1, got $oversample")
    val totals = df.groupBy(col(strataCol))
      .agg(sum(col(tokensCol)).as("_stratum_tokens"))
    val frac = least(lit(1.0),
      lit(oversample) * budget / col("_stratum_tokens").cast("double"))
    // the USING join moves the stratum column first — restore the
    // caller's column order so both forms return identical schemas
    val coarse = df.join(broadcast(totals), strataCol)
      .filter(scramble(col(idCol)).cast("double") < frac * P)
      .select(df.columns.map(col).toIndexedSeq: _*)
    // Guard the w.h.p. equivalence claim: in a BINDING stratum
    // (frac < 1 ⟺ stratum total > oversample·budget) whose coarse
    // prefix holds fewer than `budget` tokens, the exact form would
    // keep rows this one dropped. Detect with one slim aggregate over
    // the survivors and fail loud with the remedy, instead of silently
    // returning a short keep-set.
    val short = coarse.groupBy(col(strataCol))
      .agg(sum(col(tokensCol)).as("_coarse_tokens"))
      .join(broadcast(totals), strataCol)
      .filter(col("_stratum_tokens").cast("double") > lit(oversample) * budget &&
        col("_coarse_tokens") < budget)
      .select(col(strataCol).cast("string")).limit(5).collect().map(_.getString(0))
    require(short.isEmpty,
      s"tokenBudgetThreshold: oversample=$oversample prefix holds < budget=$budget " +
        s"tokens for strata [${short.mkString(", ")}] — raise oversample " +
        "(the exact tokenBudget keep-set is not covered)")
    tokenBudget(coarse, strataCol, idCol, tokensCol, budget)
  }

  /** DuckDB twin of [[tokenBudget]]'s running total (cast back to
    * BIGINT — DuckDB widens SUM(BIGINT) to HUGEINT). */
  def tokenBudgetCumSql(strataCol: String, idCol: String,
      tokensCol: String): String =
    s"CAST(SUM($tokensCol) OVER (PARTITION BY $strataCol " +
      s"ORDER BY ${scrambleSql(idCol)}, $idCol " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"

  /** DuckDB twin of [[stratified]]'s keep predicate. */
  def stratifiedSql(strataCol: String, idCol: String,
      fractions: Map[String, Double], default: Double): String = {
    val cases = fractions.toSeq.sortBy(_._1)
      .map { case (k, f) => s"WHEN ${slit(k)} THEN ${dlit(f)}" }.mkString(" ")
    s"CAST(${scrambleSql(idCol)} AS DOUBLE) < " +
      s"(CASE $strataCol $cases ELSE ${dlit(default)} END) * $P"
  }
}
