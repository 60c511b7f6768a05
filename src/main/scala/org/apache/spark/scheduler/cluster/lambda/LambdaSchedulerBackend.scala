package org.apache.spark.scheduler.cluster.lambda

import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.Future
import scala.jdk.CollectionConverters._

import org.apache.spark.SparkContext
import org.apache.spark.resource.ResourceProfile
import org.apache.spark.rpc.RpcEndpointAddress
import org.apache.spark.scheduler.TaskSchedulerImpl
import org.apache.spark.scheduler.cluster.CoarseGrainedSchedulerBackend

import graft.lambda.{FaasClient, FaasInvocation, Protocol}

/** Scheduler backend that leases executors from a FaaS endpoint
  * (LAMBDA.md §3.2/§4). Lives under `org.apache.spark.scheduler.cluster`
  * because `CoarseGrainedSchedulerBackend` is `private[spark]` — the
  * same placement Spark's own standalone/YARN/k8s backends use; all
  * graft-owned logic (wire protocol, invoke client, retry policy) stays
  * in `graft.lambda` behind the [[graft.lambda.FaasClient]] seam.
  *
  * Contract (LAMBDA.md §4):
  *  - one function invocation == one short-lived executor lease; the
  *    invocation bootstraps a `CoarseGrainedExecutorBackend` that dials
  *    the driver (outbound-only, FaaS-compatible networking);
  *  - a supervisor loop maintains the target executor count, replacing
  *    dead or lease-expired invocations (the reference re-invokes per
  *    task, `/root/reference/driver.go:129-193`; here Spark's own
  *    DAGScheduler/TaskSchedulerImpl handle task redistribution and the
  *    backend only manages capacity);
  *  - invocation submission failures retry `FaasClient.MaxInvokeRetries`
  *    times (parity: `MaxLambdaRetries = 3`, corlambda/client.go:27-29);
  *  - lease expiry kills the invocation and lets the supervisor replace
  *    it — the spot-instance-loss failure model, which Spark already
  *    handles via `spark.task.maxFailures` + stage re-attempts.
  */
class LambdaSchedulerBackend(
    scheduler: TaskSchedulerImpl,
    sc: SparkContext,
    val functionName: String,
    client: FaasClient)
  extends CoarseGrainedSchedulerBackend(scheduler, sc.env.rpcEnv) {

  private val targetExecutors =
    new AtomicInteger(conf.getInt("spark.executor.instances", 2))
  /** 0 disables lease expiry; real Lambda caps at 900s. */
  private val leaseSeconds = conf.getInt("spark.graft.lambda.leaseSeconds", 900)
  /** With `spark.decommission.enabled`, an invocation is gracefully
    * decommissioned this long before lease expiry (no new tasks; a
    * replacement launches immediately, so capacity never dips) and only
    * killed at expiry proper. Without decommission, expiry is an abrupt
    * kill — the spot-loss model. */
  private val leaseGraceSeconds =
    conf.getInt("spark.graft.lambda.leaseGraceSeconds", 60)
  private val decommissionEnabled =
    conf.getBoolean("spark.decommission.enabled", false)
  private val execCores = conf.getInt("spark.executor.cores", 1)
  private val execMemMb = conf.getSizeAsMb("spark.executor.memory", "1g").toInt

  private val invocations = new ConcurrentHashMap[String, FaasInvocation]()
  private val decommissioning =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val nextExecutorId = new AtomicInteger(0)
  @volatile private var stopping = false

  private val supervisor = Executors.newSingleThreadScheduledExecutor { r =>
    val t = new Thread(r, "faas-lease-supervisor")
    t.setDaemon(true)
    t
  }

  override def start(): Unit = {
    super.start()
    supervisor.scheduleWithFixedDelay(() => superviseSafely(), 0L, 250L,
      TimeUnit.MILLISECONDS)
  }

  private def driverUrl: String = RpcEndpointAddress(
    conf.get("spark.driver.host"),
    conf.get("spark.driver.port").toInt,
    CoarseGrainedSchedulerBackend.ENDPOINT_NAME).toString

  private def superviseSafely(): Unit =
    try supervise()
    catch {
      case _: InterruptedException => ()
      case e: Exception => logWarning(s"lease supervisor: ${e.getMessage}")
    }

  /** One supervision round: reap dead invocations, expire leases, then
    * top back up to the target count. Runs on the single supervisor
    * thread over concurrent maps — deliberately NOT synchronized on
    * this backend: decommissionExecutors takes the TaskSchedulerImpl
    * lock, and Spark's dispatcher calls back into doKillExecutors
    * while holding it, so holding a backend monitor across either
    * call deadlocks (observed: supervisor held the monitor waiting
    * for the scheduler lock; the dispatcher held the scheduler lock
    * waiting for the monitor). */
  private def supervise(): Unit = {
    if (stopping) return
    val graceActive = decommissionEnabled &&
      leaseSeconds > leaseGraceSeconds && leaseGraceSeconds > 0
    invocations.asScala.toSeq.foreach { case (id, inv) =>
      if (!inv.isAlive) {
        // driver also observes the RPC disconnect; a decommissioned
        // executor that drained and self-exited lands here too
        invocations.remove(id)
        decommissioning.remove(id)
      } else if (leaseSeconds > 0 && inv.ageSeconds >= leaseSeconds) {
        logInfo(s"executor $id lease expired after ${inv.ageSeconds}s; reclaiming")
        inv.kill()
        invocations.remove(id)
        decommissioning.remove(id)
      } else if (graceActive && inv.ageSeconds >= leaseSeconds - leaseGraceSeconds &&
          !decommissioning.contains(id)) {
        // T-grace: stop scheduling new tasks on the lease; the top-up
        // below immediately launches its replacement, so target
        // capacity holds through the handover
        logInfo(s"executor $id lease ends in <=${leaseGraceSeconds}s; decommissioning")
        decommissionExecutors(
          Array(id -> org.apache.spark.scheduler.ExecutorDecommissionInfo(
            s"faas lease expiring (executor $id)", None)),
          adjustTargetNumExecutors = false,
          triggeredByExecutor = false)
        decommissioning.add(id)
      }
    }
    // decommissioned leases are winding down — they don't count as
    // capacity (per-key membership check, not size arithmetic: the two
    // structures update non-atomically under concurrent kills)
    val activeIds = invocations.asScala.keys
      .filterNot(decommissioning.contains).toSeq
    var active = activeIds.size
    val target = targetExecutors.get()
    while (active < target && !stopping) {
      launchOne()
      active += 1
    }
    // a lowered target reaps surplus leases (youngest first — oldest
    // have the warmest caches and the nearest natural lease end)
    if (active > target) {
      activeIds.sortBy(-_.toLong).take(active - target).foreach { id =>
        logInfo(s"target lowered to $target; reclaiming surplus executor $id")
        Option(invocations.remove(id)).foreach(_.kill())
        decommissioning.remove(id)
      }
    }
  }

  private def launchOne(): Unit = {
    val id = nextExecutorId.getAndIncrement().toString
    val lease = Protocol.ExecutorLease(
      appId = applicationId(),
      executorId = id,
      driverUrl = driverUrl,
      cores = execCores,
      memoryMb = execMemMb,
      leaseSeconds = leaseSeconds)
    val inv = FaasClient.invokeWithRetries(client, functionName, Protocol.toJson(lease))
    invocations.put(id, inv)
    if (stopping) { // stop() raced the launch: reclaim immediately
      inv.kill()
      invocations.remove(id)
    }
  }

  /** Dynamic-allocation hook: adopt the requested total as the lease
    * target; the supervisor converges to it (including down to 0 —
    * scale-to-zero is the FaaS cost model). An empty request map is a
    * no-op rather than a spurious zeroing. */
  override def doRequestTotalExecutors(
      resourceProfileToTotalExecs: Map[ResourceProfile, Int]): Future[Boolean] = {
    if (resourceProfileToTotalExecs.nonEmpty) {
      targetExecutors.set(resourceProfileToTotalExecs.values.sum)
    }
    Future.successful(true)
  }

  // called from Spark's RPC dispatcher, potentially under the
  // TaskSchedulerImpl lock — must not take a backend-wide monitor
  override def doKillExecutors(executorIds: Seq[String]): Future[Boolean] = {
    executorIds.foreach { id =>
      decommissioning.remove(id)
      Option(invocations.remove(id)).foreach(_.kill())
    }
    Future.successful(true)
  }

  override def stop(): Unit = {
    stopping = true
    supervisor.shutdownNow()
    try super.stop()
    finally {
      invocations.asScala.values.foreach(_.kill())
      invocations.clear()
      client.close()
    }
  }

  // -- test/diagnostic surface -------------------------------------------

  /** The invoke client this backend leases through (e.g. to assert the
    * deployed-package data plane is in use). */
  def faasClient: FaasClient = client

  /** Executor ids with a live function invocation (including leases
    * winding down under decommission). */
  def liveInvocationIds: Set[String] =
    invocations.asScala.filter(_._2.isAlive).keySet.toSet

  /** Live invocations still counted as capacity (not decommissioning). */
  def activeInvocationIds: Set[String] =
    liveInvocationIds.diff(decommissioning.asScala.toSet)

  /** Abruptly kill one invocation (simulated sandbox loss). Returns
    * false if the executor id has no live invocation. */
  def killInvocation(executorId: String): Boolean = {
    decommissioning.remove(executorId)
    Option(invocations.remove(executorId)) match {
      case Some(inv) => inv.kill(); true
      case None => false
    }
  }
}
