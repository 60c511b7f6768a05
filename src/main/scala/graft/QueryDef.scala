package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One judge-facing query: a Spark DataFrame builder plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL.
  *
  * Oracle-parity rules used throughout (see SURVEY.md §7.4):
  *  - every computed column is aliased identically in Spark and SQL;
  *  - large aggregations sum via DECIMAL (exact in both engines), then
  *    cast to DOUBLE, so summation order can't perturb the hash;
  *  - averages are exact-decimal-sum / count in DOUBLE (bit-identical);
  *  - per-row scalar float math is identical IEEE sequences in both.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)
