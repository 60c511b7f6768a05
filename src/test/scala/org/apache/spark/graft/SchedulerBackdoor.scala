package org.apache.spark.graft

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.SchedulerBackend

/** Test-only accessor for `SparkContext.schedulerBackend`, which is
  * `private[spark]` — lets graft specs assert against the running
  * [[org.apache.spark.scheduler.cluster.lambda.LambdaSchedulerBackend]]. */
object SchedulerBackdoor {
  def backend(sc: SparkContext): SchedulerBackend = sc.schedulerBackend
}
