package graft.lambda.aws

import java.net.URI
import java.nio.charset.StandardCharsets
import java.util.Base64

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.lambda.{DeployedFunction, FaasControlPlane, FunctionAlreadyExistsException, FunctionConfig}

/** [[FaasControlPlane]] over the real AWS control-plane APIs — the
  * binding the reference drives through the Go SDK
  * (`/root/reference/internal/pkg/corlambda/client.go:78-126` for the
  * Lambda verbs, `coriam/client.go:163-196` for the IAM verbs),
  * re-expressed as the underlying public REST calls signed with
  * [[SigV4]] so it compiles and unit-tests in-sandbox with no SDK jar:
  *
  *  - Lambda (JSON REST, API version 2015-03-31): GetFunction,
  *    CreateFunction, UpdateFunctionCode, UpdateFunctionConfiguration,
  *    DeleteFunction — request bodies mirror the SDK input shapes the
  *    reference builds (`CreateFunctionInput` etc.).
  *  - IAM (query protocol, form-encoded POST, version 2010-05-08):
  *    GetRole, CreateRole, UpdateAssumeRolePolicy, GetRolePolicy,
  *    PutRolePolicy, DeleteRolePolicy, DeleteRole — the exact verb
  *    sequence of coriam's `DeployPermissions`/`DeletePermissions`.
  *
  * Endpoints are injectable: AwsBindingSpec points them at an
  * in-process recording fake and pins every wire shape; production
  * uses [[AwsControlPlane.forRegion]]. What still needs real AWS is
  * exactly credentials + endpoints — no code.
  */
final class AwsControlPlane(
    http: AwsHttpClient,
    region: String,
    lambdaEndpoint: URI,
    iamEndpoint: URI) extends FaasControlPlane {

  import AwsControlPlane._

  private def lambdaReq(method: String, path: String,
      body: String = null): http.Response =
    http.request(lambdaEndpoint, region, "lambda", method, path,
      headers =
        if (body == null) Seq.empty
        else Seq("content-type" -> "application/json"),
      body =
        if (body == null) Array.emptyByteArray
        else body.getBytes(StandardCharsets.UTF_8))

  private def iamReq(action: String, params: (String, String)*): http.Response = {
    val body = (("Action" -> action) +: ("Version" -> IamApiVersion) +: params)
      .map { case (k, v) => s"${SigV4.uriEncode(k)}=${SigV4.uriEncode(v)}" }
      .mkString("&")
    http.request(iamEndpoint, region, "iam", "POST", "/",
      headers = Seq("content-type" -> "application/x-www-form-urlencoded"),
      body = body.getBytes(StandardCharsets.UTF_8))
  }

  private def fail(what: String, r: http.Response): Nothing =
    throw new IllegalStateException(s"$what failed: HTTP ${r.status} ${r.bodyString.take(500)}")

  // -- Lambda verbs -------------------------------------------------------

  override def getFunction(name: String): Option[DeployedFunction] =
    getFunctionRaw(name).map { v =>
      val cfg = v \ "Configuration"
      DeployedFunction(
        FunctionConfig(
          name = jstrField(cfg, "FunctionName"),
          roleArn = jstrField(cfg, "Role"),
          timeoutSeconds = jlongField(cfg, "Timeout"),
          memoryMb = jlongField(cfg, "MemorySize")),
        codeSha256 = jstrField(cfg, "CodeSha256"))
    }

  private def getFunctionRaw(name: String): Option[JValue] = {
    val r = lambdaReq("GET", s"/2015-03-31/functions/$name")
    r.status match {
      case 200 => Some(JsonMethods.parse(r.bodyString))
      case 404 => None
      case _ => fail(s"GetFunction($name)", r)
    }
  }

  override def createFunction(config: FunctionConfig, pkg: Array[Byte]): Unit = {
    // CreateFunctionInput shape (client.go:209-218); Runtime/Handler
    // are the JVM analogue of the reference's go1.x/"main"
    val body = JsonMethods.compact(JsonMethods.render(JObject(
      "FunctionName" -> JString(config.name),
      "Role" -> JString(config.roleArn),
      "Handler" -> JString(Handler),
      "Runtime" -> JString(Runtime),
      "Timeout" -> JInt(BigInt(config.timeoutSeconds)),
      "MemorySize" -> JInt(BigInt(config.memoryMb)),
      "Code" -> JObject(
        "ZipFile" -> JString(Base64.getEncoder.encodeToString(pkg))))))
    val r = lambdaReq("POST", "/2015-03-31/functions", body)
    r.status match {
      case 200 | 201 => ()
      // ResourceConflictException → the trait's contract exception,
      // which deploy()'s lost-create-race recovery keys on
      case 409 => throw new FunctionAlreadyExistsException(config.name)
      case _ => fail(s"CreateFunction(${config.name})", r)
    }
  }

  override def updateFunctionCode(name: String, pkg: Array[Byte]): Unit = {
    val body = JsonMethods.compact(JsonMethods.render(JObject(
      "ZipFile" -> JString(Base64.getEncoder.encodeToString(pkg)))))
    val r = lambdaReq("PUT", s"/2015-03-31/functions/$name/code", body)
    r.status match {
      case 200 => ()
      case 404 => throw new IllegalStateException(
        s"function '$name' not found (ResourceNotFound)")
      case _ => fail(s"UpdateFunctionCode($name)", r)
    }
  }

  override def updateFunctionConfig(config: FunctionConfig): Unit = {
    // UpdateFunctionConfigurationInput (client.go:68-74): role,
    // timeout, memory — the three fields corral's drift check reads
    val body = JsonMethods.compact(JsonMethods.render(JObject(
      "Role" -> JString(config.roleArn),
      "Timeout" -> JInt(BigInt(config.timeoutSeconds)),
      "MemorySize" -> JInt(BigInt(config.memoryMb)))))
    val r = lambdaReq("PUT",
      s"/2015-03-31/functions/${config.name}/configuration", body)
    r.status match {
      case 200 => ()
      case 404 => throw new IllegalStateException(
        s"function '${config.name}' not found (ResourceNotFound)")
      case _ => fail(s"UpdateFunctionConfiguration(${config.name})", r)
    }
  }

  override def deleteFunction(name: String): Boolean = {
    val r = lambdaReq("DELETE", s"/2015-03-31/functions/$name")
    r.status match {
      case 200 | 204 => true
      case 404 => false // corral swallows ResourceNotFound (client.go:111-117)
      case _ => fail(s"DeleteFunction($name)", r)
    }
  }

  override def downloadPackage(name: String): Array[Byte] = {
    val v = getFunctionRaw(name).getOrElse(throw new IllegalArgumentException(
      s"function '$name' not found (ResourceNotFound)"))
    // GetFunction returns a pre-signed Code.Location URL (its own
    // signature rides the query string — an unsigned GET)
    val loc = jstrField(v \ "Code", "Location")
    val r = http.getUnsigned(URI.create(loc))
    if (r.status != 200) fail(s"package download for '$name'", r)
    r.body
  }

  // -- IAM verbs ----------------------------------------------------------

  override def getRole(name: String): Option[String] = {
    val r = iamReq("GetRole", "RoleName" -> name)
    r.status match {
      case 200 => Some(xmlText(r.bodyString, "Arn").getOrElse(
        fail(s"GetRole($name): no Arn in response", r)))
      case 404 => None // NoSuchEntityException
      case _ => fail(s"GetRole($name)", r)
    }
  }

  /** coriam `DeployPermissions` (`client.go:163-174`): deployRole
    * (create-or-repair trust document) then deployPolicy
    * (put-or-repair the inline policy); returns the role ARN. */
  override def ensureRole(name: String): String = {
    val get = iamReq("GetRole", "RoleName" -> name)
    val arn = get.status match {
      case 200 =>
        val arn = xmlText(get.bodyString, "Arn").getOrElse(
          fail(s"GetRole($name): no Arn", get))
        // GetRole returns the trust document URL-encoded
        val trust = xmlText(get.bodyString, "AssumeRolePolicyDocument")
          .map(d => java.net.URLDecoder.decode(d, StandardCharsets.UTF_8))
        if (!trust.contains(AssumeRolePolicyDocument)) {
          val upd = iamReq("UpdateAssumeRolePolicy", "RoleName" -> name,
            "PolicyDocument" -> AssumeRolePolicyDocument)
          if (upd.status != 200) fail(s"UpdateAssumeRolePolicy($name)", upd)
        }
        arn
      case 404 =>
        val cr = iamReq("CreateRole", "RoleName" -> name,
          "AssumeRolePolicyDocument" -> AssumeRolePolicyDocument)
        if (cr.status != 200) fail(s"CreateRole($name)", cr)
        xmlText(cr.bodyString, "Arn").getOrElse(
          fail(s"CreateRole($name): no Arn", cr))
      case _ => fail(s"GetRole($name)", get)
    }
    val getPol = iamReq("GetRolePolicy", "RoleName" -> name,
      "PolicyName" -> PolicyName)
    val needPut = getPol.status match {
      case 200 =>
        val doc = xmlText(getPol.bodyString, "PolicyDocument")
          .map(d => java.net.URLDecoder.decode(d, StandardCharsets.UTF_8))
        !doc.contains(AttachPolicyDocument)
      case 404 => true
      case _ => fail(s"GetRolePolicy($name)", getPol)
    }
    if (needPut) {
      val put = iamReq("PutRolePolicy", "RoleName" -> name,
        "PolicyName" -> PolicyName, "PolicyDocument" -> AttachPolicyDocument)
      if (put.status != 200) fail(s"PutRolePolicy($name)", put)
    }
    arn
  }

  /** coriam `DeletePermissions` (`client.go:178-196`): inline policy
    * first, then the role; both tolerate NoSuchEntity. */
  override def deleteRole(name: String): Boolean = {
    val dp = iamReq("DeleteRolePolicy", "RoleName" -> name,
      "PolicyName" -> PolicyName)
    if (dp.status != 200 && dp.status != 404)
      fail(s"DeleteRolePolicy($name)", dp)
    val dr = iamReq("DeleteRole", "RoleName" -> name)
    dr.status match {
      case 200 => true
      case 404 => false
      case _ => fail(s"DeleteRole($name)", dr)
    }
  }

  // -- parsing helpers ----------------------------------------------------

  private def jstrField(v: JValue, field: String): String = v \ field match {
    case JString(s) => s
    case other => throw new IllegalStateException(s"bad $field in AWS response: $other")
  }
  private def jlongField(v: JValue, field: String): Long = v \ field match {
    case JInt(n) => n.longValue
    case JLong(n) => n
    case JDouble(d) => d.toLong
    case other => throw new IllegalStateException(s"bad $field in AWS response: $other")
  }
}

object AwsControlPlane {
  val IamApiVersion = "2010-05-08"

  /** corral's `corralPolicyName` analogue (`coriam/client.go`). */
  val PolicyName = "GraftExecutionPolicy"

  /** The JVM runtime + handler the deployed package runs under —
    * the analogue of the reference's `go1.x` + "main"
    * (`client.go:211-213`). */
  val Runtime = "java17"
  val Handler = "graft.lambda.Handler::handleRequest"

  /** The REAL AWS trust document — coriam's `AssumePolicyDocument`
    * (`/root/reference/internal/pkg/coriam/client.go:19-33`),
    * re-typed from the public IAM document grammar (the in-sandbox
    * plane uses an abstract stand-in; this binding speaks actual IAM). */
  val AssumeRolePolicyDocument: String =
    """{"Version":"2012-10-17","Statement":[{"Effect":"Allow","Principal":{"Service":["lambda.amazonaws.com"]},"Action":"sts:AssumeRole"}]}"""

  /** coriam's `AttachPolicyDocument` (`coriam/client.go:35-56`): S3
    * access, function self-invocation, CloudWatch logs. */
  val AttachPolicyDocument: String =
    """{"Version":"2012-10-17","Statement":[{"Effect":"Allow","Action":["s3:*"],"Resource":"*"},{"Effect":"Allow","Action":["lambda:InvokeFunction"],"Resource":"*"},{"Effect":"Allow","Action":["logs:CreateLogGroup","logs:CreateLogStream","logs:PutLogEvents"],"Resource":"arn:aws:logs:*:*:*"}]}"""

  /** Production wiring: regional Lambda endpoint + the global IAM
    * endpoint, credentials from the standard environment variables. */
  def forRegion(region: String,
      creds: Option[SigV4.Credentials] = SigV4.Credentials.fromEnv()): AwsControlPlane = {
    val c = creds.getOrElse(throw new IllegalArgumentException(
      "AWS credentials not found: set AWS_ACCESS_KEY_ID / AWS_SECRET_ACCESS_KEY"))
    new AwsControlPlane(new AwsHttpClient(c), region,
      URI.create(s"https://lambda.$region.amazonaws.com"),
      URI.create("https://iam.amazonaws.com"))
  }

  /** Tiny scalar extractor for the IAM query protocol's XML responses
    * (the verbs above read single flat text elements only — Arn,
    * AssumeRolePolicyDocument, PolicyDocument — so a full XML stack is
    * not warranted; a DocumentBuilder would also be fine, this is
    * dependency-free and obvious). Returns the FIRST occurrence. */
  private[aws] def xmlText(xml: String, tag: String): Option[String] = {
    val open = s"<$tag>"
    val close = s"</$tag>"
    val i = xml.indexOf(open)
    if (i < 0) None
    else {
      val j = xml.indexOf(close, i + open.length)
      if (j < 0) None
      else Some(xml.substring(i + open.length, j)
        .replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", "\"").replace("&#39;", "'")
        .replace("&amp;", "&"))
    }
  }
}
