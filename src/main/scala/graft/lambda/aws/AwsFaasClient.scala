package graft.lambda.aws

import java.net.URI
import java.nio.charset.StandardCharsets

import graft.lambda.{FaasClient, FaasInvocation, Protocol}

/** [[FaasClient]] over the real Lambda data plane — the `Invoke` call
  * the reference makes through the Go SDK
  * (`/root/reference/internal/pkg/corlambda/client.go:236-276`),
  * re-expressed as the public REST call
  * (`POST /2015-03-31/functions/{name}/invocations`) signed with
  * [[SigV4]].
  *
  * The invocation type is `Event` (async, HTTP 202): an invocation
  * here hosts a LONG-LIVED executor that dials back to the driver
  * (LAMBDA.md §2's inversion of corral's one-task-per-invoke), so a
  * synchronous `RequestResponse` invoke would pin one supervisor
  * thread per executor for the whole lease. Liveness is therefore
  * lease-clock-based: the public API has no per-invocation status or
  * kill verb, so `isAlive` reports true until the function's
  * configured lease/timeout has elapsed (the sandbox self-terminates
  * then — the same contract the supervisor's relaunch loop already
  * assumes for lease expiry), and `kill()` is a no-op recorded for the
  * caller's accounting. Executor-initiated exit (job end) and
  * crash-rescheduling both flow through Spark's own RPC liveness, not
  * this approximation.
  */
final class AwsFaasClient(
    http: AwsHttpClient,
    region: String,
    lambdaEndpoint: URI) extends FaasClient {

  private final class AwsInvocation(
      val executorId: String,
      leaseSeconds: Long,
      startNanos: Long) extends FaasInvocation {
    @volatile private var killed = false
    override def isAlive: Boolean =
      !killed && (leaseSeconds <= 0 || ageSeconds < leaseSeconds)
    override def kill(): Unit = killed = true
    override def ageSeconds: Long =
      (System.nanoTime() - startNanos) / 1000000000L
  }

  override def invoke(function: String, payload: String): FaasInvocation = {
    val lease = Protocol.leaseFromJson(payload)
    val r = http.request(lambdaEndpoint, region, "lambda", "POST",
      s"/2015-03-31/functions/$function/invocations",
      headers = Seq(
        "content-type" -> "application/json",
        "x-amz-invocation-type" -> "Event"),
      body = payload.getBytes(StandardCharsets.UTF_8))
    // 202 = accepted (Event); 200 covers a RequestResponse-configured
    // stub. A FunctionError header on 200 is a failed submission.
    if (r.status != 202 && r.status != 200)
      throw new IllegalStateException(
        s"Invoke($function) failed: HTTP ${r.status} ${r.bodyString.take(300)}")
    new AwsInvocation(lease.executorId, lease.leaseSeconds, System.nanoTime())
  }
}

object AwsFaasClient {
  /** Production wiring, mirroring [[AwsControlPlane.forRegion]]. */
  def forRegion(region: String,
      creds: Option[SigV4.Credentials] = SigV4.Credentials.fromEnv()): AwsFaasClient = {
    val c = creds.getOrElse(throw new IllegalArgumentException(
      "AWS credentials not found: set AWS_ACCESS_KEY_ID / AWS_SECRET_ACCESS_KEY"))
    new AwsFaasClient(new AwsHttpClient(c), region,
      URI.create(s"https://lambda.$region.amazonaws.com"))
  }
}
