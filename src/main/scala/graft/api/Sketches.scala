package graft.api

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import graft.functions.Aggregators.HllDistinct

/** Library-facing sketch operators. */
object Sketches {

  /** Approximate distinct count of a long column via the deterministic
    * HyperLogLog aggregator (rel-err ~1.04/sqrt(64) ≈ 13%). One row,
    * column `n_hll`. */
  def hllDistinct(df: DataFrame, longCol: String): DataFrame = {
    implicit val le = Encoders.scalaLong
    df.select(col(longCol)).as[Long]
      .select(HllDistinct.toColumn.name("n_hll")).toDF()
  }
}
