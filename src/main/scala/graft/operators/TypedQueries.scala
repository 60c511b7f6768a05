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

  val all: Seq[QueryDef] = Seq(
    QueryDef("a1_typed_agg", typedAgg, Some(typedAggSql)),
  )
}
