package graft.lambda

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's mocked-client invoke tests
  * (`/root/reference/internal/pkg/corlambda/client_test.go:78-120`:
  * TestInvoke / TestInvokeRetry / TestInvokeOutOfTries) against the
  * [[FaasClient]] seam. */
class FaasClientSpec extends AnyFunSuite {

  private final class StubInvocation(val executorId: String) extends FaasInvocation {
    override def isAlive: Boolean = true
    override def kill(): Unit = ()
    override def ageSeconds: Long = 0L
  }

  /** The `lambdaInvokerMock` shape: fail the first `failures` invokes,
    * then succeed, recording payloads. */
  private final class MockClient(var failures: Int) extends FaasClient {
    var attempts = 0
    var lastPayload: String = _
    override def invoke(function: String, payload: String): FaasInvocation = {
      attempts += 1
      lastPayload = payload
      if (failures > 0) {
        failures -= 1
        throw new RuntimeException("function error")
      }
      new StubInvocation(function)
    }
  }

  test("invoke passes the payload through and returns the invocation") {
    val c = new MockClient(0)
    val inv = FaasClient.invokeWithRetries(c, "fn", """{"x":1}""")
    assert(inv.executorId == "fn" && c.attempts == 1 && c.lastPayload == """{"x":1}""")
  }

  test("invoke retries transient failures (client_test.go TestInvokeRetry)") {
    val c = new MockClient(2)
    FaasClient.invokeWithRetries(c, "fn", "{}")
    assert(c.attempts == 3) // 2 failures + 1 success, within MaxInvokeRetries
  }

  test("invoke surfaces the last error when out of tries (TestInvokeOutOfTries)") {
    val c = new MockClient(Int.MaxValue)
    val e = intercept[IllegalStateException](
      FaasClient.invokeWithRetries(c, "fn", "{}"))
    assert(c.attempts == FaasClient.MaxInvokeRetries)
    assert(e.getCause.getMessage == "function error")
  }

  test("executor lease payload round-trips the wire format") {
    val lease = Protocol.ExecutorLease("app-1", "3",
      "spark://CoarseGrainedScheduler@localhost:7077", 2, 1024, 900)
    assert(Protocol.leaseFromJson(Protocol.toJson(lease)) == lease)
    val json = Protocol.toJson(lease)
    for (f <- Seq("AppID", "ExecutorID", "DriverURL", "Cores", "MemoryMB", "LeaseSeconds"))
      assert(json.contains("\"" + f + "\""), s"missing field $f in $json")
  }

  test("sandboxHost yields a valid loopback octet for every id shape") {
    val c = new LocalProcessFaasClient
    val octet = "^127\\.0\\.0\\.(\\d+)$".r
    // The pathological case: math.abs(Int.MinValue) == Int.MinValue, so
    // the pre-fix fallback produced '127.0.0.-…' for an id hashing to
    // Int.MinValue. "polygenelubricants" is the canonical such string.
    val minId = "polygenelubricants"
    assert(minId.hashCode == Int.MinValue) // fixture self-check
    for (id <- Seq(minId, "7", "1234567890", "exec-42", "", "no-digits-at-all")) {
      val host = c.sandboxHost(id)
      host match {
        case octet(o) =>
          assert(o.toInt >= 1 && o.toInt <= 250, s"octet $o out of range for id '$id'")
        case _ => fail(s"malformed host '$host' for id '$id'")
      }
    }
  }
}
