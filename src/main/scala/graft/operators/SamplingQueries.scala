package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-rebalancing fixture queries over [[graft.api.Sampling]] —
  * the deterministic mixing step of a training-data pipeline (e.g.
  * "cap English at 10%, keep half of Spanish, most of the tail").
  * Both the Spark filter and the DuckDB oracle evaluate the identical
  * integer congruence per row, so the realized sample hash-matches. */
object SamplingQueries {

  private val Fractions = Map("en" -> 0.1, "es" -> 0.5)
  private val DefaultFraction = 0.9

  private def stratifiedQ(s: SparkSession, dir: String): DataFrame =
    graft.api.Sampling.stratified(Tables.documents(s, dir),
        "lang", "doc_id", Fractions, DefaultFraction)
      .select(col("doc_id"), col("lang"), col("source"))

  private val stratifiedSql =
    s"""SELECT doc_id, lang, source FROM documents
       |WHERE ${graft.api.Sampling.stratifiedSql("lang", "doc_id", Fractions, DefaultFraction)}""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("ds1_stratified_sample", stratifiedQ, Some(stratifiedSql), bench = true),
  )
}
