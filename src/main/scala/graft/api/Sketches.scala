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

/** Bounded top-K rows per key as a partial+final aggregate with O(k)
  * state per key — each map task pre-reduces to ≤k rows per key BEFORE
  * the shuffle, where the window-function formulation shuffles every
  * row and sorts whole partitions. Ties break on the id (ascending).
  * Output columns: (keyCol, idCol, orderCol, rank). */
object TopKPerKey {
  import graft.functions.Aggregators.{Priced, TopK, TopKAgg}

  def apply(df: DataFrame, keyCol: String, orderCol: String,
      idCol: String, k: Int): DataFrame = {
    implicit val pe = Encoders.product[Priced]
    implicit val oe = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaDouble, Encoders.scalaInt)
    df.select(col(keyCol).cast("long").as("key"),
        col(orderCol).cast("double").as("price"),
        col(idCol).cast("long").as("id")).as[Priced]
      .groupByKey(_.key)(Encoders.scalaLong)
      .agg(TopKAgg(k).toColumn.name("top"))
      .flatMap { case (key, top) =>
        TopK.entries(top).zipWithIndex.map { case ((p, id), i) =>
          (key, id, p, i + 1)
        }
      }
      .toDF(keyCol, idCol, orderCol, "rank")
  }
}
