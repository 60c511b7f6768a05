package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-join salting: when one join key dominates (a hot order key, a
  * null-ish default), the single reducer owning it becomes the job's
  * critical path. Salting splits the hot key's rows across `salts`
  * shuffle partitions by extending the join key with a deterministic
  * per-row salt on the big side, and replicating the small side once
  * per salt value.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`) covers
  * sort-merge joins automatically; this explicit form works for any
  * join type, survives AQE-off deployments, and is the standard recipe
  * when the small side is replicable.
  */
object Skew {

  /** Inner equi-join `big ⋈ small` on `bigKey === smallKey`, salted.
    * `saltSource` must be a deterministic per-row expression on `big`
    * (e.g. a line number) so results are reproducible. */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: Column, smallKey: Column, saltSource: Column,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<bigint>")))
    saltedBig.join(saltedSmall,
        bigKey === smallKey && saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }
}
