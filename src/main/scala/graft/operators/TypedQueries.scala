package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Aggregators

/** Typed Dataset surface: case-class rows + Aggregator (SURVEY.md §2.4).
  * The partial-aggregation plan (ObjectHashAggregate partial+final) is
  * the scalable form of corral's reducer — per-key state merges map-side
  * before the shuffle. */
object TypedQueries {
  import Aggregators._

  private def typedAgg(s: SparkSession, dir: String): DataFrame = {
    implicit val docEnc = Encoders.product[LangDoc]
    implicit val strEnc = Encoders.STRING
    val ds = Tables.documents(s, dir)
      .select(col("lang"), col("n_chars")).as[LangDoc]
    ds.groupByKey(_.lang)
      .agg(MeanChars.toColumn.name("avg_chars"))
      .toDF("lang", "avg_chars")
  }

  // exact long sum → double division: identical to the Aggregator's
  // finish() arithmetic
  private val typedAggSql =
    """SELECT lang, CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
      |FROM documents GROUP BY lang""".stripMargin

  // -- qs1: HyperLogLog distinct-count sketch ---------------------------
  // An approximate operator with an exact oracle: the sketch is
  // deterministic mod-P arithmetic (see Aggregators.Hll), so DuckDB
  // replays bucket assignment, trailing-zero ranks, per-bucket maxima,
  // and the (order-independent-in-IEEE) harmonic estimate bit-for-bit.
  private def hllDistinct(s: SparkSession, dir: String): DataFrame = {
    implicit val longEnc = Encoders.scalaLong
    val events = Tables.events(s, dir)
    val hll = events.select(col("user_id")).as[Long]
      .select(HllDistinct.toColumn.name("n_hll")).toDF()
    events.agg(countDistinct(col("user_id")).as("n_exact")).crossJoin(hll)
  }

  private val hllDistinctSql: String = {
    import Hll._
    val rankCase = (1 to RankCap - 1).map { k =>
      s"WHEN h2 % ${1L << k} = ${1L << (k - 1)} THEN $k"
    }.mkString("CASE ", " ", s" ELSE $RankCap END")
    s"""WITH h0 AS (
       |  SELECT ((user_id % $P) * $A1 + $B1) % $P AS v FROM events),
       |h AS (
       |  SELECT ((v * v + $B2) % $P) % $M AS bucket,
       |         ((v * v + $B2) % $P) // $M AS h2
       |  FROM h0),
       |r AS (SELECT bucket, $rankCase AS rnk FROM h),
       |mx AS (SELECT bucket, MAX(rnk) AS m FROM r GROUP BY bucket),
       |est AS (
       |  -- e0 suffix: parse as DOUBLE (a bare decimal literal is DECIMAL
       |  -- and overflows); shortest-round-trip repr → identical bits
       |  SELECT ${Alpha}e0 * ${M * M} /
       |    (SUM(1.0 / (CAST(1 AS BIGINT) << m)) + ($M - COUNT(*)) * 1.0) AS n_hll
       |  FROM mx)
       |SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_exact, n_hll
       |FROM est""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("a1_typed_agg", typedAgg, Some(typedAggSql)),
    QueryDef("qs1_hll_distinct", hllDistinct, Some(hllDistinctSql)),
  )
}
