package graft.lambda

import java.net.{InetSocketAddress, URI, URLEncoder}
import java.nio.charset.StandardCharsets
import java.util.Base64

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.lambda.aws.{AwsControlPlane, AwsFaasClient, AwsHttpClient, SigV4}

/** The AWS bindings against a recorded HTTP-shape fake: an in-process
  * server captures every request the control/data planes emit, and the
  * spec pins the wire shapes of the SDK calls the reference makes
  * (CreateFunction / UpdateFunctionCode / UpdateFunctionConfiguration /
  * DeleteFunction / GetFunction / Invoke — `corlambda/client.go`, and
  * the GetRole / CreateRole / PutRolePolicy / Delete* IAM sequence —
  * `coriam/client.go`). The SigV4 signer itself is pinned against the
  * published AWS reference vector. What this leaves for real AWS is
  * credentials + endpoints only. */
class AwsBindingSpec extends AnyFunSuite with BeforeAndAfterAll {

  // -- SigV4 against the published reference vector -----------------------

  test("SigV4 reproduces the published AWS signing example") {
    // docs.aws.amazon.com SigV4 "calculating the signature" worked
    // example: IAM ListUsers, 2015-08-30, us-east-1
    val creds = SigV4.Credentials("AKIDEXAMPLE",
      "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY")
    val headers = Seq(
      "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
      "host" -> "iam.amazonaws.com",
      "x-amz-date" -> "20150830T123600Z")
    val query = Seq("Action" -> "ListUsers", "Version" -> "2010-05-08")
    val emptyHash = SigV4.sha256Hex(Array.emptyByteArray)
    assert(emptyHash ==
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
    val canonical = SigV4.canonicalRequest("GET", "/", query, headers, emptyHash)
    assert(SigV4.sha256Hex(canonical.getBytes(StandardCharsets.UTF_8)) ==
      "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59")
    val sts = SigV4.stringToSign("20150830T123600Z", "us-east-1", "iam", canonical)
    val key = SigV4.signingKey(creds.secretAccessKey, "20150830", "us-east-1", "iam")
    assert(SigV4.hex(SigV4.hmac(key, sts)) ==
      "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
    val auth = SigV4.authorizationHeader(creds, "GET", "/", query, headers,
      emptyHash, "20150830T123600Z", "us-east-1", "iam")
    assert(auth == "AWS4-HMAC-SHA256 " +
      "Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
      "SignedHeaders=content-type;host;x-amz-date, " +
      "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  // -- the recording fake -------------------------------------------------

  final case class Recorded(
      method: String,
      path: String,
      headers: Map[String, String],
      body: Array[Byte]) {
    def bodyString: String = new String(body, StandardCharsets.UTF_8)
    /** IAM query-protocol action, when this is an IAM request. */
    def iamAction: Option[String] =
      bodyString.split("&").collectFirst {
        case kv if kv.startsWith("Action=") => kv.drop("Action=".length)
      }
  }

  private var server: HttpServer = _
  private val requests = mutable.Buffer[Recorded]()
  /** Per-test scripted behavior: Recorded => (status, body). */
  @volatile private var respond: Recorded => (Int, Array[Byte]) = _

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (exchange: HttpExchange) => {
      val body = exchange.getRequestBody.readAllBytes()
      val headers = exchange.getRequestHeaders.asScala
        .map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v.get(0) }
        .toMap
      val rec = Recorded(exchange.getRequestMethod,
        exchange.getRequestURI.getPath, headers, body)
      requests.synchronized(requests += rec)
      val (status, out) = respond(rec)
      exchange.sendResponseHeaders(status, if (out.isEmpty) -1 else out.length)
      if (out.nonEmpty) exchange.getResponseBody.write(out)
      exchange.close()
    })
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def endpoint: URI =
    URI.create(s"http://127.0.0.1:${server.getAddress.getPort}")

  private def freshPlane(): AwsControlPlane = {
    requests.synchronized(requests.clear())
    new AwsControlPlane(
      new AwsHttpClient(
        SigV4.Credentials("AKIDTEST", "secret", Some("tok")),
        clock = () => java.time.Instant.parse("2026-01-02T03:04:05Z")),
      "us-east-1", endpoint, endpoint)
  }

  private def recorded: Seq[Recorded] = requests.synchronized(requests.toVector)

  private def ok(xmlOrJson: String): (Int, Array[Byte]) =
    (200, xmlOrJson.getBytes(StandardCharsets.UTF_8))
  private def notFound: (Int, Array[Byte]) = (404, Array.emptyByteArray)

  private def roleXml(arn: String, trustDoc: String): String =
    s"<GetRoleResponse><GetRoleResult><Role><Arn>$arn</Arn>" +
      s"<AssumeRolePolicyDocument>${URLEncoder.encode(trustDoc, "UTF-8")}" +
      "</AssumeRolePolicyDocument></Role></GetRoleResult></GetRoleResponse>"

  private def rolePolicyXml(doc: String): String =
    "<GetRolePolicyResponse><GetRolePolicyResult>" +
      s"<PolicyName>${AwsControlPlane.PolicyName}</PolicyName>" +
      s"<PolicyDocument>${URLEncoder.encode(doc, "UTF-8")}</PolicyDocument>" +
      "</GetRolePolicyResult></GetRolePolicyResponse>"

  private def functionJson(name: String, role: String, timeout: Long,
      memory: Long, sha: String): String =
    s"""{"Configuration":{"FunctionName":"$name","Role":"$role",""" +
      s""""Timeout":$timeout,"MemorySize":$memory,"CodeSha256":"$sha"},""" +
      s""""Code":{"Location":"$endpoint/presigned/$name"}}"""

  // -- deploy flows -------------------------------------------------------

  test("fresh deploy drives CreateRole/PutRolePolicy/CreateFunction with pinned shapes") {
    val cp = freshPlane()
    val pkg = "zipbytes".getBytes(StandardCharsets.UTF_8)
    val arn = "arn:aws:iam::123456789012:role/GraftExecutionRole"
    respond = rec => (rec.path, rec.iamAction) match {
      case ("/", Some("GetRole")) => notFound
      case ("/", Some("CreateRole")) => ok(roleXml(arn,
        AwsControlPlane.AssumeRolePolicyDocument))
      case ("/", Some("GetRolePolicy")) => notFound
      case ("/", Some("PutRolePolicy")) => ok("<PutRolePolicyResponse/>")
      case ("/2015-03-31/functions/graft_function", None) => notFound // GetFunction
      case ("/2015-03-31/functions", None) => (201, Array.emptyByteArray)
      case other => fail(s"unexpected request: $other")
    }
    val outcome = Deployer.deploy(cp,
      FunctionConfig("graft_function", timeoutSeconds = 900L, memoryMb = 1500L), pkg)
    assert(outcome == Deployer.Created)

    val rs = recorded
    // the exact verb sequence of DeployPermissions + DeployFunction
    assert(rs.map(r => (r.method, r.path, r.iamAction)) == Seq(
      ("POST", "/", Some("GetRole")),
      ("POST", "/", Some("CreateRole")),
      ("POST", "/", Some("GetRolePolicy")),
      ("POST", "/", Some("PutRolePolicy")),
      ("GET", "/2015-03-31/functions/graft_function", None),
      ("POST", "/2015-03-31/functions", None)))

    // IAM wire shape: query protocol, form-encoded, versioned
    val createRole = rs(1)
    assert(createRole.headers("content-type") == "application/x-www-form-urlencoded")
    assert(createRole.bodyString.startsWith("Action=CreateRole&Version=2010-05-08&"))
    assert(createRole.bodyString.contains("RoleName=GraftExecutionRole"))
    assert(createRole.bodyString.contains("AssumeRolePolicyDocument="))

    // Lambda CreateFunction shape: the CreateFunctionInput fields the
    // reference builds (client.go:209-218), ZipFile base64 of the pkg
    val create = rs.last
    assert(create.headers("content-type") == "application/json")
    val body = org.json4s.jackson.JsonMethods.parse(create.bodyString)
    import org.json4s._
    assert(body \ "FunctionName" == JString("graft_function"))
    assert(body \ "Role" == JString(arn))
    assert(body \ "Handler" == JString(AwsControlPlane.Handler))
    assert(body \ "Runtime" == JString(AwsControlPlane.Runtime))
    assert(body \ "Timeout" == JInt(900))
    assert(body \ "MemorySize" == JInt(1500))
    assert(body \ "Code" \ "ZipFile" ==
      JString(Base64.getEncoder.encodeToString(pkg)))

    // every signed request carries SigV4 with the right scope and the
    // session token header it signed
    rs.foreach { r =>
      val auth = r.headers("authorization")
      val service = if (r.path == "/") "iam" else "lambda"
      assert(auth.startsWith(
        s"AWS4-HMAC-SHA256 Credential=AKIDTEST/20260102/us-east-1/$service/aws4_request, "),
        auth)
      assert(auth.contains("SignedHeaders="))
      assert(auth.contains("host;") || auth.contains(";host"), auth)
      assert(r.headers.contains("x-amz-date"))
      assert(r.headers("x-amz-security-token") == "tok")
      assert(auth.matches(".*Signature=[0-9a-f]{64}$"), auth)
    }
  }

  test("up-to-date deploy makes no update calls; drift updates code then config") {
    val cp = freshPlane()
    val pkg = "v2-bytes".getBytes(StandardCharsets.UTF_8)
    val sha = Deployer.codeSha256(pkg)
    val arn = "arn:aws:iam::123456789012:role/GraftExecutionRole"
    // role + function both current
    respond = rec => (rec.path, rec.iamAction) match {
      case ("/", Some("GetRole")) => ok(roleXml(arn,
        AwsControlPlane.AssumeRolePolicyDocument))
      case ("/", Some("GetRolePolicy")) => ok(rolePolicyXml(
        AwsControlPlane.AttachPolicyDocument))
      case ("/2015-03-31/functions/fn2", None) =>
        ok(functionJson("fn2", arn, 900L, 1500L, sha))
      case other => fail(s"unexpected request: $other")
    }
    assert(Deployer.deploy(cp,
      FunctionConfig("fn2", timeoutSeconds = 900L, memoryMb = 1500L),
      pkg) == Deployer.UpToDate)
    assert(!recorded.exists(_.method == "PUT"))

    // now drift both: stale SHA, different memory
    requests.synchronized(requests.clear())
    respond = rec => (rec.path, rec.iamAction) match {
      case ("/", Some("GetRole")) => ok(roleXml(arn,
        AwsControlPlane.AssumeRolePolicyDocument))
      case ("/", Some("GetRolePolicy")) => ok(rolePolicyXml(
        AwsControlPlane.AttachPolicyDocument))
      case ("/2015-03-31/functions/fn2", None) =>
        ok(functionJson("fn2", arn, 900L, 3000L, "stale-sha"))
      case ("/2015-03-31/functions/fn2/code", None) => ok("{}")
      case ("/2015-03-31/functions/fn2/configuration", None) => ok("{}")
      case other => fail(s"unexpected request: $other")
    }
    assert(Deployer.deploy(cp,
      FunctionConfig("fn2", timeoutSeconds = 900L, memoryMb = 1500L),
      pkg) == Deployer.Updated(codeChanged = true, configChanged = true))
    val puts = recorded.filter(_.method == "PUT")
    assert(puts.map(_.path) == Seq("/2015-03-31/functions/fn2/code",
      "/2015-03-31/functions/fn2/configuration"))
    import org.json4s._
    val codeBody = org.json4s.jackson.JsonMethods.parse(puts(0).bodyString)
    assert(codeBody \ "ZipFile" == JString(Base64.getEncoder.encodeToString(pkg)))
    val cfgBody = org.json4s.jackson.JsonMethods.parse(puts(1).bodyString)
    assert(cfgBody \ "Role" == JString(arn))
    assert(cfgBody \ "Timeout" == JInt(900))
    assert(cfgBody \ "MemorySize" == JInt(1500))
  }

  test("a 409 on CreateFunction maps to the contract conflict exception") {
    val cp = freshPlane()
    respond = rec => rec.path match {
      case "/2015-03-31/functions" =>
        (409, """{"message":"Function already exist"}"""
          .getBytes(StandardCharsets.UTF_8))
      case other => fail(s"unexpected request: $other")
    }
    val e = intercept[FunctionAlreadyExistsException](
      cp.createFunction(FunctionConfig("racer", roleArn = "arn:x"), Array[Byte](1)))
    assert(e.functionName == "racer")
  }

  test("delete verbs tolerate absence the way corral does") {
    val cp = freshPlane()
    respond = rec => (rec.path, rec.iamAction) match {
      case (p, None) if p.startsWith("/2015-03-31/functions/gone") => notFound
      case ("/", Some("DeleteRolePolicy")) => notFound
      case ("/", Some("DeleteRole")) => notFound
      case other => fail(s"unexpected request: $other")
    }
    assert(!cp.deleteFunction("gone"))
    assert(!cp.deleteRole("gone-role"))

    requests.synchronized(requests.clear())
    respond = rec => (rec.path, rec.iamAction) match {
      case (p, None) if p.startsWith("/2015-03-31/functions/fn3") =>
        (204, Array.emptyByteArray)
      case ("/", Some("DeleteRolePolicy")) => ok("<DeleteRolePolicyResponse/>")
      case ("/", Some("DeleteRole")) => ok("<DeleteRoleResponse/>")
      case other => fail(s"unexpected request: $other")
    }
    assert(cp.deleteFunction("fn3"))
    assert(cp.deleteRole("fn3-role"))
    // policy deleted before role (coriam DeletePermissions order)
    assert(recorded.flatMap(_.iamAction) == Seq("DeleteRolePolicy", "DeleteRole"))
  }

  test("downloadPackage follows the pre-signed Code.Location with an unsigned GET") {
    val cp = freshPlane()
    val pkg = "the-zip".getBytes(StandardCharsets.UTF_8)
    respond = rec => rec.path match {
      case "/2015-03-31/functions/fn4" =>
        ok(functionJson("fn4", "arn:x", 900L, 1500L, Deployer.codeSha256(pkg)))
      case "/presigned/fn4" => (200, pkg)
      case other => fail(s"unexpected request: $other")
    }
    assert(cp.downloadPackage("fn4").sameElements(pkg))
    val dl = recorded.find(_.path == "/presigned/fn4").get
    assert(!dl.headers.contains("authorization"),
      "pre-signed download must not be re-signed")
  }

  test("Invoke posts the payload as an async Event and leases by clock") {
    requests.synchronized(requests.clear())
    val client = new AwsFaasClient(
      new AwsHttpClient(SigV4.Credentials("AKIDTEST", "secret")),
      "eu-west-1", endpoint)
    respond = rec => rec.path match {
      case "/2015-03-31/functions/graft_function/invocations" =>
        (202, Array.emptyByteArray)
      case other => fail(s"unexpected request: $other")
    }
    val lease = Protocol.ExecutorLease(
      driverUrl = "spark://CoarseGrainedScheduler@host:7077",
      executorId = "7", cores = 2, memoryMb = 1500, appId = "app-1",
      leaseSeconds = 900)
    val inv = client.invoke("graft_function", Protocol.toJson(lease))
    assert(inv.executorId == "7")
    assert(inv.isAlive) // age 0 < lease 900
    inv.kill()
    assert(!inv.isAlive)

    val r = recorded.last
    assert(r.method == "POST")
    assert(r.headers("x-amz-invocation-type") == "Event")
    assert(r.headers("authorization").contains("/eu-west-1/lambda/aws4_request"))
    // the payload rides unmodified — the Go runtime's parser on the
    // other side reads exactly this JSON (Protocol wire parity)
    assert(Protocol.leaseFromJson(r.bodyString) == lease)
  }
}
