package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporal joins over the `events` stream — the point-in-time
  * primitives a training-data pipeline needs for leak-free feature
  * joins. Spark has no native AS-OF/range join operator; per the
  * custom-operator preference order these are COMPOSED from existing
  * ops so Catalyst plans them as ordinary shuffles:
  *
  *  - q28 as-of: tag both streams, one window pass per user carries the
  *    latest left-row forward — one shuffle on user_id, no join node at
  *    all, and deterministic tie-breaking ((ts, tag, event_id) total
  *    order), which a generic ASOF JOIN leaves ambiguous on ts ties.
  *  - q29 range: time-bucketed equi-join + exact refine. Each probe row
  *    checks its own bucket and the previous one (window length =
  *    bucket width ⇒ exactly two), so candidates are O(rows·2) — never
  *    the O(n·m) BroadcastNestedLoopJoin a raw range predicate plans.
  *    Bucket width is the selectivity knob at scale.
  */
object TemporalQueries {

  // -- q28: as-of join (latest view at-or-before each purchase) ---------
  private def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
    graft.api.Temporal.asofJoin(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "view"),
        "user_id", "us", "event_id")
      .select(col("key").as("user_id"), col("probe_id").as("purchase_id"),
        col("probe_time").as("p_us"), col("quote_id").as("view_id"),
        col("gap").as("gap_us"))
  }

  private val asofJoinSql =
    """SELECT user_id, event_id AS purchase_id, us AS p_us,
      |  lv_id AS view_id, us - lv_us AS gap_us
      |FROM (
      |  SELECT user_id, event_id, us, tag,
      |    last_value(CASE WHEN tag = 0 THEN us END IGNORE NULLS) OVER w AS lv_us,
      |    last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS) OVER w AS lv_id
      |  FROM (
      |    SELECT user_id, event_id, epoch_us(ts) AS us,
      |      CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS tag
      |    FROM events WHERE event_type IN ('view', 'purchase')) t
      |  WINDOW w AS (PARTITION BY user_id ORDER BY us, tag, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) x
      |WHERE tag = 1 AND lv_us IS NOT NULL""".stripMargin

  // -- q29: range join (views within 1h before each purchase) -----------
  private val WindowUs = 3600L * 1000 * 1000 // 1 hour, == bucket width

  private def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
    graft.api.Temporal.rangeJoin(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "view"),
        "user_id", "us", "event_id", WindowUs)
      .select(col("key").as("user_id"), col("probe_id").as("purchase_id"),
        col("quote_id").as("view_id"), col("gap").as("gap_us"))
  }

  private val rangeJoinSql =
    s"""SELECT v.user_id, p.event_id AS purchase_id, v.event_id AS view_id,
       |  epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
       |FROM events p JOIN events v
       |  ON p.user_id = v.user_id
       | AND p.event_type = 'purchase' AND v.event_type = 'view'
       | AND epoch_us(v.ts) < epoch_us(p.ts)
       | AND epoch_us(v.ts) >= epoch_us(p.ts) - $WindowUs""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q28_asof_join", asofJoin, Some(asofJoinSql), bench = true),
    QueryDef("q29_range_join", rangeJoin, Some(rangeJoinSql)),
  )
}
