package org.apache.spark.graft

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.cluster.lambda.LambdaSchedulerBackend

/** Main-source accessor for the FaaS backend's OWN lease count —
  * the instrument the bench's executors-over-time sampler records on
  * `lambda://` masters. `SparkStatusTracker.getExecutorInfos` is the
  * wrong probe under dynamic allocation + shuffle tracking: executors
  * the allocation manager has deactivated-but-retained (tracked
  * shuffle data) drop out of the ACTIVE list while their invocations
  * are still leased and running tasks — the r18 elastic leg read a
  * constant 1 from the status store while per-query parity with the
  * fixed 4-executor leg proved ~cap compute was live. The backend's
  * `activeInvocationIds` is the ground truth the elasticity spec
  * asserts on; this exposes its size to `graft.Bench` (the
  * `schedulerBackend` handle is `private[spark]`, hence the package). */
object LeaseCount {
  def active(sc: SparkContext): Option[Int] = sc.schedulerBackend match {
    case b: LambdaSchedulerBackend => Some(b.activeInvocationIds.size)
    case _ => None
  }
}
