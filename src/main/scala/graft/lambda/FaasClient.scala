package graft.lambda

/** A live function invocation hosting one executor — the unit the
  * scheduler backend leases. Mirrors what corral's `lambda.Invoke` call
  * represents (`/root/reference/internal/pkg/corlambda/client.go:236-262`),
  * except an invocation here is long-lived (one executor lease) rather
  * than one map/reduce task — see LAMBDA.md §2 for why that inversion
  * is the right Spark mapping. */
trait FaasInvocation {
  def executorId: String
  def isAlive: Boolean
  /** Reclaim the sandbox (simulates the FaaS control plane killing the
    * function at lease end, or an abrupt sandbox loss). */
  def kill(): Unit
  def ageSeconds: Long
}

/** The invoke seam, mirroring the reference's `LambdaClient` interface
  * so the backend is testable against a mock exactly the way corral
  * tests its client (`/root/reference/internal/pkg/corlambda/client_test.go:78-120`). */
trait FaasClient extends AutoCloseable {
  /** Fire one function invocation. Throws on submission failure (the
    * analogue of `FunctionError` in corral's `tryInvoke`). */
  def invoke(function: String, payload: String): FaasInvocation
  override def close(): Unit = ()
}

object FaasClient {
  /** Reference parity: `MaxLambdaRetries = 3`
    * (`/root/reference/internal/pkg/corlambda/client.go:27-29`). */
  val MaxInvokeRetries = 3

  /** corral's `Invoke` retry loop (`client.go:267-276`): try up to
    * `maxRetries` times, return the first success, rethrow the last
    * failure when out of tries. */
  def invokeWithRetries(client: FaasClient, function: String, payload: String,
      maxRetries: Int = MaxInvokeRetries): FaasInvocation = {
    var last: Throwable = null
    var attempt = 0
    while (attempt < maxRetries) {
      try return client.invoke(function, payload)
      catch { case e: Exception => last = e; attempt += 1 }
    }
    throw new IllegalStateException(
      s"function invocation failed after $maxRetries attempts", last)
  }
}

/** The local FaaS simulator: each invoke spawns a fresh JVM process (the
  * "function sandbox") that bootstraps a `CoarseGrainedExecutorBackend`
  * dialing back to the driver — outbound-only networking, exactly the
  * connectivity a real FaaS sandbox has (LAMBDA.md §3.2). The process
  * boundary is the point: executors come and go per-invocation, share
  * nothing with the driver JVM, and die when killed, so the backend's
  * lease/replace/retry logic is exercised end to end in-sandbox. */
class LocalProcessFaasClient extends FaasClient {

  private final class ProcessInvocation(val executorId: String,
      proc: Process, startNanos: Long) extends FaasInvocation {
    override def isAlive: Boolean = proc.isAlive
    override def kill(): Unit = proc.destroyForcibly()
    override def ageSeconds: Long =
      (System.nanoTime() - startNanos) / 1000000000L
  }

  /** What the sandbox JVM loads. Default: the driver's own classpath
    * (simulator convenience). [[DeployedPackageFaasClient]] overrides
    * this with the DEPLOYED package + runtime — the real FaaS layout. */
  protected[lambda] def classpathFor(function: String): String =
    sys.props("java.class.path")

  /** Each invocation advertises its OWN loopback alias (127.0.0.x) as
    * its host, because a real FaaS sandbox IS its own host: every
    * Lambda invocation runs in an isolated micro-VM with a distinct
    * address. Advertising one shared "localhost" made the whole sim
    * fleet look co-hosted to Spark's scheduler, which silently disables
    * every host-level policy — most visibly speculation, whose
    * different-host rule (TaskSetManager.dequeueSpeculativeTask) could
    * then never place a straggler's copy. All 127.0.0.0/8 addresses
    * bind on Linux loopback, so executor↔executor block transfers keep
    * working. Octet collisions just co-host two invocations — benign. */
  private[lambda] def sandboxHost(executorId: String): String = {
    val digits = executorId.filter(_.isDigit)
    // floorMod, not math.abs: abs(Int.MinValue) is still negative and
    // would produce a malformed octet for a pathological hashCode.
    val n = if (digits.nonEmpty && digits.length <= 6) digits.toLong
            else java.lang.Math.floorMod(executorId.hashCode.toLong, 250L)
    s"127.0.0.${1 + (n % 250)}"
  }

  override def invoke(function: String, payload: String): FaasInvocation = {
    val lease = Protocol.leaseFromJson(payload)
    val host = sandboxHost(lease.executorId)
    val javaBin = java.nio.file.Paths
      .get(sys.props("java.home"), "bin", "java").toString
    // JDK17 module opens: same set spark-submit injects
    val moduleOpts = org.apache.spark.launcher.JavaModuleOptions
      .defaultModuleOptions().split(" ").toSeq.filter(_.nonEmpty)
    val cmd = Seq(javaBin) ++ moduleOpts ++ Seq(
      s"-Xmx${lease.memoryMb}m",
      "-cp", classpathFor(function),
      "org.apache.spark.executor.CoarseGrainedExecutorBackend",
      "--driver-url", lease.driverUrl,
      "--executor-id", lease.executorId,
      "--hostname", host,
      "--bind-address", host,
      "--cores", lease.cores.toString,
      "--app-id", lease.appId,
      "--resourceProfileId", "0")
    val log = java.nio.file.Files
      .createTempFile(s"graft-faas-exec-${lease.executorId}-", ".log").toFile
    log.deleteOnExit()
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(log)
    new ProcessInvocation(lease.executorId, pb.start(), System.nanoTime())
  }
}
