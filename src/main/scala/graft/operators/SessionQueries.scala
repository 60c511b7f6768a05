package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization over `events` — the deterministic, oracle-checked
  * twin of the stateful streaming operator in graft.streaming
  * (mapGroupsWithState). Gap-based: a >30 min silence starts a new
  * session. Classic two-window formulation: lag → new-session flag →
  * running sum as session id → per-session aggregation.
  */
object SessionQueries {

  private val GapUs = 30L * 60 * 1000 * 1000

  private def sessionize(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))))
      .withColumn("new_s",
        when(col("prev").isNull || col("us") - col("prev") > GapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(
        Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("int"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"), max(col("us")).as("end_us"))
  }

  private val sessionizeSql =
    s"""SELECT user_id, session_id, COUNT(*) AS n_events,
       |  MIN(us) AS start_us, MAX(us) AS end_us
       |FROM (
       |  SELECT user_id, event_id, us,
       |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS session_id
       |  FROM (
       |    SELECT user_id, event_id, us,
       |      CASE WHEN prev IS NULL OR us - prev > $GapUs THEN 1 ELSE 0 END AS new_s
       |    FROM (
       |      SELECT user_id, event_id, epoch_us(ts) AS us,
       |        lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
       |          ORDER BY epoch_us(ts), event_id) AS prev
       |      FROM events) a) b) c
       |GROUP BY user_id, session_id""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("st1_sessionize", sessionize, Some(sessionizeSql), bench = true),
  )
}
