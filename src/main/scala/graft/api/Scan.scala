package graft.api

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive parallelism floor for kernel inputs (r20 optimization
  * round; optimization guide §2.5 "input skew: one huge unsplittable
  * file … repartition immediately after the read", §6 scan-parallelism
  * floor).
  *
  * The driver's sf fixtures are single-file, single-ROW-GROUP parquet:
  * byte-range splitting cannot parallelize them (a parquet reader only
  * consumes row groups whose midpoint lands inside its split), so every
  * scan stage is ONE task at any `maxPartitionBytes` /
  * `minPartitionNum`, and every per-row kernel, barrier
  * materialization, or join probe riding directly on the scan runs
  * serial on a 32-core session. Measured (r20 StageProbe at sf0.1,
  * target/r20opt_stageprobe1.log): q32's candidate join ran 4.9 s in
  * ONE task with 31 cores idle; dd5's probe join 1.4 s in one task;
  * the winnow/simhash/decode kernels 0.5–0.6 s in one task each.
  *
  * [[widen]] inserts a KEYED repartition to the session's default
  * parallelism ONLY when the input's planned partitioning is narrower.
  * Scale behavior: at production scale a corpus scan already has
  * (thousands of) ≥ defaultParallelism partitions, so widen() is a
  * no-op by construction — no production plan changes shape and no
  * corpus-scale re-shuffle is ever introduced; the floor binds exactly
  * in the small-input/many-cores regime where the exchange moves slim
  * kernel-input rows once and the kernel/join then runs core-wide.
  * Hash repartition on the caller's id key, not round-robin:
  * deterministic row→partition assignment under task retry (the
  * SPARK-38388 class of issues) and no sort-before-repartition pass.
  */
object Scan {
  /** Session conf: `off` disables [[widen]] (A/B measurement seam —
    * the r20 before/after evidence was taken by alternating this
    * within one session on the same box window). Default `on`. */
  val WidenConfKey = "spark.graft.scan.widen"

  /** `df` repartitioned to the session default parallelism by `keys`
    * iff its planned partition count is below it; `df` unchanged
    * otherwise (the production no-op case). Inspecting the partition
    * count plans the frame's subtree but executes nothing. */
  def widen(df: DataFrame, keys: Column*): DataFrame = {
    if (df.sparkSession.conf.get(WidenConfKey, "on") == "off") return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df
    else if (keys.nonEmpty) df.repartition(p, keys: _*)
    else df.repartition(p)
  }
}
