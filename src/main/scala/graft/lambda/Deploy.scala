package graft.lambda

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, File}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import java.util.Base64
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.util.control.NonFatal

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Self-deploy / undeploy — reference F20 (`/root/reference/lambda.go:147-183`,
  * `corlambda/client.go:78-126`, `coriam/client.go:163-196`): the driver
  * packages ITS OWN code, publishes it as the FaaS function its executors
  * run, and tears function + role down again. Everything control-plane
  * specific sits behind [[FaasControlPlane]] — the same seam discipline as
  * F18's [[FaasClient]] — so the deploy/undeploy verbs and their
  * create-or-update-by-SHA semantics are fully testable in-sandbox against
  * [[LocalDirControlPlane]]; a real AWS binding would implement the trait
  * over the Lambda/IAM SDK calls the reference makes (CreateFunction /
  * UpdateFunctionCode / UpdateFunctionConfiguration / DeleteFunction,
  * GetRole / CreateRole / PutRolePolicy).
  */

/** Function configuration — corlambda's `FunctionConfig`
  * (`client.go:38-44`). Corral defaults: memory 1500 MB, timeout 180 s,
  * managed role (`/root/reference/config.go:22-25`). */
final case class FunctionConfig(
    name: String,
    roleArn: String = "",
    timeoutSeconds: Long = 180L,
    memoryMb: Long = 1500L)

/** What the control plane reports for a deployed function — the subset of
  * `GetFunctionOutput.Configuration` the reference's update decisions read
  * (`client.go:55-64`): role/timeout/memory plus the stored package SHA. */
final case class DeployedFunction(config: FunctionConfig, codeSha256: String)

/** The control-plane seam: the Lambda + IAM API subset corral's deploy
  * path drives. `deleteFunction`/`deleteRole` return whether the entity
  * existed and MUST tolerate absence (corral swallows
  * `ResourceNotFoundException`, `client.go:111-117`). `ensureRole` is the
  * reference's `DeployPermissions` verb (`coriam/client.go:163-174`):
  * create-or-update the execution role + its attached policy, return the
  * role ARN. */
/** The name-conflict signal of the control-plane contract: every
  * [[FaasControlPlane.createFunction]] implementation MUST throw this
  * (not its SDK's own conflict type) when the function name already
  * exists — it is what [[Deployer.deploy]]'s lost-create-race recovery
  * keys on, so an AWS binding must map `ResourceConflictException` to
  * it rather than letting the SDK exception escape. */
final class FunctionAlreadyExistsException(val functionName: String)
    extends RuntimeException(
      s"function '$functionName' already exists (ResourceConflict)")

trait FaasControlPlane {
  def getFunction(name: String): Option[DeployedFunction]
  /** MUST throw [[FunctionAlreadyExistsException]] when the name is
    * already taken (the reference surfaces AWS's
    * `ResourceConflictException` here, `client.go:104-106`). */
  def createFunction(config: FunctionConfig, pkg: Array[Byte]): Unit
  def updateFunctionCode(name: String, pkg: Array[Byte]): Unit
  def updateFunctionConfig(config: FunctionConfig): Unit
  /** Idempotent: returns false (not an error) when the function is absent. */
  def deleteFunction(name: String): Boolean
  /** The `GetFunction` code-location download — the bytes last published
    * by create/updateFunctionCode. */
  def downloadPackage(name: String): Array[Byte]
  def getRole(name: String): Option[String]
  def ensureRole(name: String): String
  /** Idempotent: returns false when the role is absent. */
  def deleteRole(name: String): Boolean
}

object Deployer {

  /** corral's `corralRoleName = "CorralExecutionRole"`
    * (`/root/reference/lambda.go:24-25`). */
  val RoleName = "GraftExecutionRole"

  /** Role trust + permissions documents — the shape of coriam's
    * `AssumePolicyDocument` / `AttachPolicyDocument` constants
    * (`coriam/policy.go`): the FaaS runtime may assume the role; the
    * function may read/write the object store, invoke functions, and
    * write logs. Stored by the control plane so `ensureRole` can
    * detect and repair drift (`coriam/client.go:107-124`). */
  val AssumeRolePolicy: String =
    """{"Version":"1","Statement":[{"Effect":"Allow","Principal":{"Service":"faas"},"Action":"AssumeRole"}]}"""
  val AttachPolicy: String =
    """{"Version":"1","Statement":[{"Effect":"Allow","Action":["storage:*","faas:Invoke","logs:Write"],"Resource":"*"}]}"""

  sealed trait DeployOutcome
  /** Function did not exist; created fresh (`client.go:104-106`). */
  case object Created extends DeployOutcome
  /** Function existed; code and/or config were out of date
    * (`client.go:86-99`). */
  final case class Updated(codeChanged: Boolean, configChanged: Boolean)
      extends DeployOutcome
  /** Neither code SHA nor config differed — deploy is a no-op
    * ("Function is already up-to-date", `client.go:98-100`). */
  case object UpToDate extends DeployOutcome

  /** Base64(SHA-256) of the package — byte-for-byte the comparison key
    * corral uses against the deployed `CodeSha256`
    * (`functionNeedsUpdate`, `client.go:55-60`). */
  def codeSha256(pkg: Array[Byte]): String =
    Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-256").digest(pkg))

  /** Filesystem-safe form of a base64 SHA (one definition — the
    * content-addressed store and the sandbox dirs must always agree).
    * Base64url without padding ('+'→'-', '/'→'_', '=' dropped): for the
    * fixed-length SHA-256 digests this encodes, the mapping is
    * INJECTIVE, so two distinct SHAs can never collide to one filename
    * (the earlier '-'-folding could, letting a later write overwrite an
    * older function's zip and permanently fail its content check). */
  def safeSha(sha: String): String =
    sha.map {
      case '+' => '-'
      case '/' => '_'
      case c => c
    }.filterNot(_ == '=')

  /** The pre-round-12 non-injective encoding ('+','/','=' all → '-'),
    * kept only so [[LocalDirControlPlane.downloadPackage]] can read a
    * persistent plane written by an older build. */
  private[lambda] def legacySafeSha(sha: String): String =
    sha.map(c => if (c.isLetterOrDigit) c else '-')

  /** Best-effort recursive delete (children first); per-entry failures
    * are swallowed — both users (function teardown, sandbox
    * reclamation) prefer leaving a stray entry over throwing halfway
    * through a teardown and mis-reporting it. */
  private[lambda] def deleteRecursively(path: Path): Unit =
    if (Files.isDirectory(path)) {
      val files = Files.walk(path)
      try {
        import scala.jdk.CollectionConverters._
        files.iterator().asScala.toVector.reverseIterator
          .foreach(p => try Files.deleteIfExists(p) catch { case NonFatal(_) => () })
      } finally files.close()
    } else {
      try Files.deleteIfExists(path) catch { case NonFatal(_) => () }
      ()
    }

  /** Where this build's own code lives (classes directory under sbt, a
    * jar when assembled) — the JVM analogue of corral cross-compiling
    * "the current directory" into the function binary
    * (`crossCompile`, `client.go:124-150`). */
  def defaultCodeLocation(): File =
    new File(Deployer.getClass.getProtectionDomain.getCodeSource.getLocation.toURI)

  // Fixed DOS timestamp (no timezone dependence) so identical code bytes
  // always zip to identical package bytes: re-deploying an unchanged
  // build must hash equal and no-op, across machines and locales.
  private val FixedEntryTime = java.time.LocalDateTime.of(2010, 1, 1, 0, 0)

  /** Deterministic package build — the analogue of `buildPackage`
    * (`client.go:150-189`): a directory zips as its sorted recursive
    * file tree, a single file (an assembled jar) as one entry. Entry
    * order, names, and timestamps are all fixed functions of the
    * content, so package bytes — and therefore [[codeSha256]] — are
    * reproducible, which is what makes redeploy-if-changed meaningful. */
  def buildPackage(codeLocation: File): Array[Byte] = {
    require(codeLocation.exists(), s"code location does not exist: $codeLocation")
    val out = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(out, StandardCharsets.UTF_8)
    try {
      if (codeLocation.isFile) {
        writeEntry(zip, codeLocation.getName, Files.readAllBytes(codeLocation.toPath))
      } else {
        val root = codeLocation.toPath
        val files = Files.walk(root)
        val sorted = try {
          import scala.jdk.CollectionConverters._
          files.iterator().asScala
            .filter(Files.isRegularFile(_))
            .map(p => root.relativize(p).toString.replace(File.separatorChar, '/'))
            .toVector.sorted
        } finally files.close()
        sorted.foreach { rel =>
          writeEntry(zip, rel, Files.readAllBytes(root.resolve(rel)))
        }
      }
    } finally zip.close()
    out.toByteArray
  }

  private def writeEntry(zip: ZipOutputStream, name: String, bytes: Array[Byte]): Unit = {
    val e = new ZipEntry(name)
    e.setTimeLocal(FixedEntryTime)
    zip.putNextEntry(e)
    zip.write(bytes)
    zip.closeEntry()
  }

  /** Unpack a package into `target` (created if needed). Entry paths are
    * confined to the target directory — a crafted `../` entry fails loud
    * rather than escaping the sandbox. */
  def unzipTo(pkg: Array[Byte], target: Path): Unit = {
    Files.createDirectories(target)
    val norm = target.toAbsolutePath.normalize
    val zin = new ZipInputStream(new ByteArrayInputStream(pkg), StandardCharsets.UTF_8)
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val dest = norm.resolve(e.getName).normalize
          require(dest.startsWith(norm),
            s"package entry escapes the sandbox: ${e.getName}")
          Files.createDirectories(dest.getParent)
          Files.copy(zin, dest, StandardCopyOption.REPLACE_EXISTING)
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
  }

  /** `lambdaExecutor.Deploy` + `DeployFunction` (`lambda.go:147-169`,
    * `client.go:78-106`): ensure the execution role when managed, then
    * create the function if absent, else update exactly what drifted —
    * code when the package SHA differs from the deployed `CodeSha256`,
    * config when role/timeout/memory differ — and no-op when neither
    * did. */
  def deploy(
      cp: FaasControlPlane,
      config: FunctionConfig,
      pkg: Array[Byte],
      manageRole: Boolean = true,
      roleName: String = RoleName): DeployOutcome = {
    val roleArn = if (manageRole) cp.ensureRole(roleName) else config.roleArn
    val cfg = config.copy(roleArn = roleArn)
    cp.getFunction(cfg.name) match {
      case Some(existing) =>
        val codeChanged = codeSha256(pkg) != existing.codeSha256
        if (codeChanged) cp.updateFunctionCode(cfg.name, pkg)
        val configChanged = cfg.roleArn != existing.config.roleArn ||
          cfg.timeoutSeconds != existing.config.timeoutSeconds ||
          cfg.memoryMb != existing.config.memoryMb
        if (configChanged) cp.updateFunctionConfig(cfg)
        if (codeChanged || configChanged) Updated(codeChanged, configChanged)
        else UpToDate
      case None =>
        try { cp.createFunction(cfg, pkg); Created }
        catch {
          case _: FunctionAlreadyExistsException =>
            // lost a create race: another deployer published the name
            // first (the trait contract maps the control plane's
            // conflict signal — AWS ResourceConflictException — to this
            // dedicated type) — converge through the update path
            // instead of failing the session
            deploy(cp, config, pkg, manageRole, roleName)
        }
    }
  }

  /** `lambdaExecutor.Undeploy` (`lambda.go:171-183`): delete the function,
    * then the managed role; each step tolerates absence and LOGS (not
    * throws) on failure, so a half-deployed state always tears down as
    * far as it can. Returns (functionExisted, roleExisted). */
  def undeploy(
      cp: FaasControlPlane,
      functionName: String,
      roleName: String = RoleName): (Boolean, Boolean) = {
    val f = try cp.deleteFunction(functionName) catch {
      case NonFatal(e) =>
        System.err.println(s"error undeploying function '$functionName': $e")
        false
    }
    val r = try cp.deleteRole(roleName) catch {
      case NonFatal(e) =>
        System.err.println(s"error undeploying role '$roleName': $e")
        false
    }
    (f, r)
  }
}

/** In-sandbox control plane: the function/role registry as a directory
  * tree — `functions/<name>/{function.json,package.zip}` and
  * `roles/<name>.json` — standing in for the Lambda/IAM control plane the
  * same way `graftfs://` stands in for the object store and
  * `lambda://local-sim` for the data plane. Metadata publishes by
  * write-temp + atomic rename (the asset lifecycle's discipline), and
  * `function.json` is the existence point: a function is deployed iff its
  * metadata file is readable. */
final class LocalDirControlPlane(root: Path) extends FaasControlPlane {

  private def functionDir(name: String) = root.resolve("functions").resolve(name)
  private def functionJson(name: String) = functionDir(name).resolve("function.json")
  // packages are CONTENT-ADDRESSED by their SHA, so `function.json` is
  // the single publish point: concurrent deployers each write their own
  // zip object (identical content = identical name = idempotent) and
  // the last metadata rename wins WHOLE — the published SHA can never
  // point at another writer's half-superseded bytes. Superseded zips
  // are kept until deleteFunction (the asset lifecycle's
  // keep-superseded discipline: a reader mid-download is never yanked).
  private def packageZip(name: String, sha: String) =
    functionDir(name).resolve(s"package-${Deployer.safeSha(sha)}.zip")
  private def roleJson(name: String) = root.resolve("roles").resolve(s"$name.json")

  private def atomicWrite(path: Path, bytes: Array[Byte]): Unit = {
    Files.createDirectories(path.getParent)
    // unique temp name: concurrent deployers against a SHARED control
    // plane must not truncate each other's in-flight publish (a fixed
    // sibling name lets writer A clobber writer B's tmp mid-write).
    // Plain Files.write, NOT createTempFile: the latter's 0600 POSIX
    // default would survive the rename and make a multi-user shared
    // plane's metadata unreadable to other principals
    val tmp = path.resolveSibling(
      s"${path.getFileName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def str(v: JValue, field: String): String = v \ field match {
    case JString(s) => s
    case other => throw new IllegalArgumentException(s"bad $field: $other")
  }
  private def long(v: JValue, field: String): Long = v \ field match {
    case JInt(n) => n.longValue
    case other => throw new IllegalArgumentException(s"bad $field: $other")
  }

  private def writeFunctionJson(config: FunctionConfig, sha: String): Unit =
    atomicWrite(functionJson(config.name), JsonMethods.compact(JsonMethods.render(
      JObject(
        "Name" -> JString(config.name),
        "RoleArn" -> JString(config.roleArn),
        "TimeoutSeconds" -> JInt(BigInt(config.timeoutSeconds)),
        "MemoryMb" -> JInt(BigInt(config.memoryMb)),
        "CodeSha256" -> JString(sha)))).getBytes(StandardCharsets.UTF_8))

  override def getFunction(name: String): Option[DeployedFunction] = {
    val p = functionJson(name)
    if (!Files.isRegularFile(p)) None
    else {
      val v = JsonMethods.parse(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      Some(DeployedFunction(
        FunctionConfig(
          name = str(v, "Name"),
          roleArn = str(v, "RoleArn"),
          timeoutSeconds = long(v, "TimeoutSeconds"),
          memoryMb = long(v, "MemoryMb")),
        codeSha256 = str(v, "CodeSha256")))
    }
  }

  override def createFunction(config: FunctionConfig, pkg: Array[Byte]): Unit = {
    if (getFunction(config.name).isDefined)
      throw new FunctionAlreadyExistsException(config.name)
    // package first, metadata last: function.json is the publish point
    val sha = Deployer.codeSha256(pkg)
    atomicWrite(packageZip(config.name, sha), pkg)
    writeFunctionJson(config, sha)
  }

  override def updateFunctionCode(name: String, pkg: Array[Byte]): Unit = {
    val existing = getFunction(name).getOrElse(
      throw new IllegalStateException(s"function '$name' not found (ResourceNotFound)"))
    val sha = Deployer.codeSha256(pkg)
    atomicWrite(packageZip(name, sha), pkg)
    // re-read the config just before the metadata publish: the write is
    // a read-modify-write of function.json, and publishing from the
    // stale pre-package read would silently revert a config update that
    // raced in during the package write (a lost update, worse than the
    // last-writer-wins a serialized control plane gives). The narrower
    // window between this read and the rename remains — acceptable for
    // the in-sandbox plane, whose real counterpart serializes the API.
    val cfg = getFunction(name).map(_.config).getOrElse(existing.config)
    writeFunctionJson(cfg, sha)
  }

  override def updateFunctionConfig(config: FunctionConfig): Unit = {
    val existing = getFunction(config.name).getOrElse(
      throw new IllegalStateException(s"function '${config.name}' not found (ResourceNotFound)"))
    writeFunctionJson(config, existing.codeSha256)
  }

  override def deleteFunction(name: String): Boolean = {
    val existed = Files.isRegularFile(functionJson(name))
    // metadata first (unpublish), then the whole dir best-effort
    // RECURSIVELY — a crashed publish's stray .tmp files must not make
    // the teardown throw halfway and mis-report, and a file appearing
    // concurrently (a racing redeploy) just survives for that deploy's
    // own publish to own: delete-vs-deploy races resolve last-writer-
    // wins, same as the real control plane's serialized API would
    Files.deleteIfExists(functionJson(name))
    Deployer.deleteRecursively(functionDir(name))
    existed
  }

  override def downloadPackage(name: String): Array[Byte] = {
    val fn = getFunction(name).getOrElse(throw new IllegalArgumentException(
      s"function '$name' not found (ResourceNotFound)"))
    val addressed = packageZip(name, fn.codeSha256)
    // older layouts: the dash-folded content-addressed name, then the
    // pre-content-addressing fixed `package.zip`; a persistent control
    // plane deployed by an older build reads through the fallbacks (and
    // still verifies — its json SHA came from those bytes)
    val legacyDashed = functionDir(name)
      .resolve(s"package-${Deployer.legacySafeSha(fn.codeSha256)}.zip")
    val legacy = functionDir(name).resolve("package.zip")
    val source =
      if (Files.isRegularFile(addressed)) addressed
      else if (Files.isRegularFile(legacyDashed)) legacyDashed
      else if (Files.isRegularFile(legacy)) legacy
      else throw new IllegalArgumentException(
        s"package object for '$name' is missing from the control plane " +
          "(ResourceNotFound; if this plane predates content-addressed " +
          "packages, redeploy the function)")
    val bytes = readPackage(source, name)
    // fail loud on store corruption: the content address must verify
    require(Deployer.codeSha256(bytes) == fn.codeSha256,
      s"package for '$name' does not match its published CodeSha256")
    bytes
  }

  /** The read half of [[downloadPackage]], separated so the
    * check-then-read race window is directly testable: a racing
    * deleteFunction can remove the file between the existence check and
    * the read — surface it as the same graceful ResourceNotFound the
    * missing-object path gives, not a raw NoSuchFileException (the
    * supervisor catches and retries either way). */
  private[lambda] def readPackage(source: Path, name: String): Array[Byte] =
    try Files.readAllBytes(source)
    catch {
      case _: java.nio.file.NoSuchFileException =>
        throw new IllegalArgumentException(
          s"package object for '$name' vanished mid-download " +
            "(ResourceNotFound; a concurrent undeploy removed it)")
    }

  private def roleArnOf(name: String) = s"arn:graft:iam::role/$name"

  override def getRole(name: String): Option[String] =
    if (Files.isRegularFile(roleJson(name))) Some(roleArnOf(name)) else None

  /** `DeployPermissions` (`coriam/client.go:163-174`): create the role if
    * absent; if present with drifted trust/permissions documents, rewrite
    * them (`deployRole`/`deployPolicy`'s update paths); return the ARN. */
  override def ensureRole(name: String): String = {
    val doc = JsonMethods.compact(JsonMethods.render(JObject(
      "Arn" -> JString(roleArnOf(name)),
      "AssumeRolePolicy" -> JString(Deployer.AssumeRolePolicy),
      "AttachedPolicy" -> JString(Deployer.AttachPolicy))))
    val p = roleJson(name)
    val current =
      if (Files.isRegularFile(p)) new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      else null
    if (current != doc) atomicWrite(p, doc.getBytes(StandardCharsets.UTF_8))
    roleArnOf(name)
  }

  override def deleteRole(name: String): Boolean =
    Files.deleteIfExists(roleJson(name))
}

/** FaaS client whose invocations run the DEPLOYED package, not the
  * driver's classpath: the function's code comes from the control plane
  * (downloaded once per package SHA, unpacked into a sandbox directory),
  * and the launched executor's classpath is that sandbox plus the Spark
  * runtime — exactly a FaaS sandbox's layout, where the platform provides
  * the runtime and the deployed zip provides the function. The driver's
  * own code location is EXCLUDED from the child classpath, so an executor
  * can only resolve engine classes from the deployed artifact — which is
  * what makes the self-deploy verb load-bearing rather than decorative
  * (DeployLambdaSimSpec proves a job runs end-to-end this way). */
final class DeployedPackageFaasClient(
    cp: FaasControlPlane,
    sandboxRoot: Path) extends LocalProcessFaasClient {

  /** Last classpath handed to a launched invocation (test seam). */
  @volatile private[graft] var lastClasspath: String = null

  // full classpath string per function@sha — the unzip, the jar listing,
  // and the string build all happen once; the supervisor's 250 ms
  // relaunch loop then reads a constant
  private val unpacked =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  // serializes unpack against close(): the backend shuts its supervisor
  // down without awaiting termination, so a launch already in flight
  // could otherwise re-unzip into the sandbox AFTER close() swept it —
  // re-leaking the directory reclamation exists to prevent
  private val lifecycle = new Object
  private var closed = false

  /** The "FaaS runtime" half of the sandbox classpath: the driver's
    * classpath minus its own code location. Invariant for the life of
    * the client, so computed (and canonicalized) exactly once — the
    * supervisor re-launches invocations every 250 ms after kills and
    * lease expiries, and per-invoke canonicalization of every jar path
    * is filesystem I/O for a constant answer. */
  private lazy val runtimeEntries: Seq[String] = {
    val ownCode =
      try Deployer.defaultCodeLocation().getCanonicalPath
      catch { case NonFatal(_) => null }
    sys.props("java.class.path").split(File.pathSeparator).toSeq.filter { e =>
      e.nonEmpty && (ownCode == null ||
        (try new File(e).getCanonicalPath != ownCode catch { case NonFatal(_) => true }))
    }
  }

  override protected[lambda] def classpathFor(function: String): String = {
    val fn = cp.getFunction(function).getOrElse(throw new IllegalStateException(
      s"function '$function' is not deployed; deploy first " +
        "(Deployer.deploy — reference lambda.go:147-169)"))
    val cpStr = lifecycle.synchronized {
      if (closed) throw new IllegalStateException(
        "FaaS client is closed; no further invocations can launch")
      unpacked.computeIfAbsent(s"$function@${fn.codeSha256}", { _ =>
        val dir = sandboxRoot.resolve(s"$function-${Deployer.safeSha(fn.codeSha256)}")
        Deployer.unzipTo(cp.downloadPackage(function), dir)
        // a directory classpath entry only loads LOOSE class files — a
        // package built from an assembled jar unpacks to <dir>/<app>.jar,
        // which must ride the classpath as its own entry or nothing in
        // it resolves (the classes-directory layout has no such jars)
        val jarEntries = {
          val files = Files.list(dir)
          try {
            import scala.jdk.CollectionConverters._
            files.iterator().asScala
              .filter(p => p.getFileName.toString.endsWith(".jar"))
              .map(_.toAbsolutePath.toString).toVector.sorted
          } finally files.close()
        }
        (dir.toAbsolutePath.toString +: (jarEntries ++ runtimeEntries))
          .mkString(File.pathSeparator)
      })
    }
    lastClasspath = cpStr
    cpStr
  }

  /** Reclaim the unpacked-package sandbox: the backend closes its
    * client on stop, and without this every session leaks a full
    * unpacked copy of the build under the temp root. Serialized with
    * [[classpathFor]] so an in-flight launch cannot re-populate the
    * sandbox after the sweep. */
  override def close(): Unit = lifecycle.synchronized {
    closed = true
    unpacked.clear()
    Deployer.deleteRecursively(sandboxRoot)
  }
}

/** Wires `--master lambda://<function>` (any name other than `local-sim`)
  * to a control plane + the deployed-package data plane, with corral's
  * deploy-on-start behavior (`driver.go:185-187`: the driver deploys
  * before running whenever the lambda backend is selected; idempotent via
  * the SHA check). */
object FaasDeploy extends org.apache.spark.internal.Logging {
  val ControlPlaneDirKey = "spark.graft.faas.controlPlaneDir"
  /** Deploy-on-start (reference `run()` always deploys; disable to
    * require a pre-deployed function). */
  val AutoDeployKey = "spark.graft.faas.autoDeploy"
  /** corral `lambdaManageRole` (default true, `config.go:25`). */
  val ManageRoleKey = "spark.graft.faas.manageRole"
  /** corral `lambdaRoleARN` — used when the role is NOT managed. */
  val RoleArnKey = "spark.graft.faas.roleArn"

  def clientFor(conf: org.apache.spark.SparkConf, function: String): FaasClient = {
    val dir = conf.getOption(ControlPlaneDirKey).getOrElse(
      throw new IllegalArgumentException(
        s"lambda://$function needs a FaaS control plane: set $ControlPlaneDirKey " +
          "to the deployment root (LAMBDA.md §5), or use lambda://local-sim"))
    val cp = new LocalDirControlPlane(Paths.get(dir))
    if (conf.getBoolean(AutoDeployKey, defaultValue = true)) {
      // leaseSeconds=0 means "never expire the lease" to the backend;
      // a function timeout must still be a positive wall-clock budget
      val lease = conf.getInt("spark.graft.lambda.leaseSeconds", 900)
      val cfg = FunctionConfig(
        name = function,
        roleArn = conf.get(RoleArnKey, ""),
        // the function's wall-clock budget is the executor lease
        timeoutSeconds = if (lease > 0) lease.toLong else 900L,
        memoryMb = conf.getSizeAsMb("spark.executor.memory", "1g"))
      val outcome = Deployer.deploy(cp, cfg,
        Deployer.buildPackage(Deployer.defaultCodeLocation()),
        manageRole = conf.getBoolean(ManageRoleKey, defaultValue = true))
      logInfo(s"deployed function '$function': $outcome")
    } else {
      // fail at session start, not in the supervisor's retry loop: with
      // auto-deploy off, an undeployed function would otherwise surface
      // as an endlessly-relaunching invocation that never registers
      require(cp.getFunction(function).isDefined,
        s"$AutoDeployKey=false and function '$function' is not deployed; " +
          "deploy it first (Deployer.deploy) or enable auto-deploy")
    }
    new DeployedPackageFaasClient(cp,
      Files.createTempDirectory("graft-faas-sandbox-"))
  }
}
