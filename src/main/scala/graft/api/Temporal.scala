package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Library-facing temporal joins — the point-in-time primitives for
  * leak-free feature joins. Both sides carry (keyCol, timeCol, idCol);
  * times are longs (epoch micros or any monotonic unit).
  *
  * The oracled fixture queries ([[graft.operators.TemporalQueries]])
  * are thin bindings of these.
  */
object Temporal {

  /** AS-OF join: for each probe row, the latest quote row of the same
    * key with quote.time ≤ probe.time. One window pass over the tagged
    * union — a single shuffle on the key, no join node, deterministic
    * (time, side, id) tie-breaking. Output: (key, probe_id, probe_time,
    * quote_id, gap). */
  def asofJoin(probes: DataFrame, quotes: DataFrame,
      keyCol: String, timeCol: String, idCol: String): DataFrame = {
    def side(df: DataFrame, tag: Int) = df.select(
      col(keyCol).as("key"), col(timeCol).cast("long").as("t"),
      col(idCol).as("id"), lit(tag).as("tag"))
    val u = side(quotes, 0).unionByName(side(probes, 1))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("t"), col("tag"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // both IGNORE-NULLS carries pick from the same row: the CASEs are
    // null on exactly the same rows and the ordering is total
    u.select(col("*"),
        last(when(col("tag") === 0, col("t")), ignoreNulls = true).over(w).as("q_t"),
        last(when(col("tag") === 0, col("id")), ignoreNulls = true).over(w).as("q_id"))
      .filter(col("tag") === 1 && col("q_t").isNotNull)
      .select(col("key"), col("id").as("probe_id"), col("t").as("probe_time"),
        col("q_id").as("quote_id"), (col("t") - col("q_t")).as("gap"))
  }

  /** Range join: all (probe, quote) pairs of the same key with
    * quote.time in (probe.time - window, probe.time]. Time-bucketed
    * equi-join + exact refine: quotes land in their bucket, each probe
    * checks its own and the previous bucket (bucket width = window ⇒
    * exactly two), so candidates stay O(rows·2) — never the O(n·m)
    * nested loop a raw range predicate plans. Output: (key, probe_id,
    * quote_id, gap). */
  def rangeJoin(probes: DataFrame, quotes: DataFrame,
      keyCol: String, timeCol: String, idCol: String,
      window: Long, inclusive: Boolean = false): DataFrame = {
    // integral DIV, not `/` + cast: float division loses exactness for
    // times beyond 2^53. Times are assumed non-negative (epochs).
    val q = quotes.select(col(keyCol).as("key"),
        col(timeCol).cast("long").as("q_t"), col(idCol).as("quote_id"))
      .withColumn("bucket", expr(s"q_t DIV $window"))
    val p = probes.select(col(keyCol).as("p_key"),
        col(timeCol).cast("long").as("p_t"), col(idCol).as("probe_id"))
      .withColumn("bucket",
        explode(array(expr(s"p_t DIV $window"), expr(s"p_t DIV $window") - 1)))
    val upper: Column =
      if (inclusive) col("q_t") <= col("p_t") else col("q_t") < col("p_t")
    p.join(q,
        p("p_key") === q("key") && p("bucket") === q("bucket") &&
          upper && col("q_t") >= col("p_t") - window)
      .select(col("key"), col("probe_id"), col("quote_id"),
        (col("p_t") - col("q_t")).as("gap"))
  }
}
