package graft.mr

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's flagship workload (word count,
  * `/root/reference/examples/word_count/word_count.go`) run through the
  * MR facade, verified by the same SQL oracle as the relational form —
  * proving the facade computes identical results to the declarative path.
  */
object MRQueries {

  /** Tokenizer with the semantics of word_count.go:14-27: lowercase,
    * non-alphanumerics to spaces, split on whitespace. */
  final class WordCountMapper extends Mapper {
    override def map(key: String, value: String): IterableOnce[(String, String)] =
      value.toLowerCase
        .replaceAll("[^a-z0-9\\s]+", " ")
        .split("\\s+")
        .iterator
        .filter(_.nonEmpty)
        .map(w => (w, "1"))
  }

  /** Count reduce (word_count.go:29-35), declared associative so the
    * engine adds the map-side combiner corral lacks. */
  final class SumReducer extends AssociativeReducer {
    override def combine(a: String, b: String): String =
      (a.toLong + b.toLong).toString
  }

  private def mrWordcount(s: SparkSession, dir: String): DataFrame = {
    import MapReduce._
    val lines = Tables.documents(s, dir).select(col("text"))
      .as[String](stringEncoder)
    val out = CorralJob(new WordCountMapper, new SumReducer).runOnLines(lines)
    out.select(col("_1").as("word"), col("_2").cast("long").as("cnt"))
  }

  // same oracle as q2_wordcount — both paths must agree with DuckDB
  private val mrWordcountSql =
    """SELECT word, COUNT(*) AS cnt FROM (
      |  SELECT unnest(string_split_regex(
      |    lower(regexp_replace(text, '[^a-zA-Z0-9\s]+', ' ', 'g')),
      |    '\s+')) AS word
      |  FROM documents) t
      |WHERE word <> '' GROUP BY word""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("mr1_wordcount", mrWordcount, Some(mrWordcountSql)),
  )
}
