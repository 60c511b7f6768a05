package graft.lambda

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** F20 self-deploy/undeploy semantics against the in-sandbox control
  * plane — the unit twin of the reference's mocked-client deploy tests
  * (`/root/reference/internal/pkg/corlambda/client_test.go`,
  * `/root/reference/lambda_test.go:126-141`): create-or-update by
  * package SHA, config drift detection, idempotent teardown. */
class DeploySpec extends AnyFunSuite {

  private def tempDir(prefix: String): Path =
    Files.createTempDirectory(prefix)

  private def writeCode(dir: Path, files: (String, String)*): Unit =
    files.foreach { case (rel, content) =>
      val p = dir.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    }

  // -- package build ------------------------------------------------------

  test("buildPackage is deterministic: same tree -> identical bytes and SHA") {
    val a = tempDir("graft-deploy-code-")
    writeCode(a, "pkg/A.class" -> "alpha", "pkg/sub/B.class" -> "beta", "top.txt" -> "t")
    val p1 = Deployer.buildPackage(a.toFile)
    val p2 = Deployer.buildPackage(a.toFile)
    assert(p1.sameElements(p2))
    assert(Deployer.codeSha256(p1) == Deployer.codeSha256(p2))
    // a second tree with identical content hashes identically too
    // (rebuild-without-change must no-op on redeploy)
    val b = tempDir("graft-deploy-code-")
    writeCode(b, "pkg/A.class" -> "alpha", "pkg/sub/B.class" -> "beta", "top.txt" -> "t")
    assert(Deployer.codeSha256(Deployer.buildPackage(b.toFile)) == Deployer.codeSha256(p1))
  }

  test("buildPackage SHA changes when any file's content changes") {
    val a = tempDir("graft-deploy-code-")
    writeCode(a, "pkg/A.class" -> "alpha")
    val sha1 = Deployer.codeSha256(Deployer.buildPackage(a.toFile))
    writeCode(a, "pkg/A.class" -> "alpha2")
    val sha2 = Deployer.codeSha256(Deployer.buildPackage(a.toFile))
    assert(sha1 != sha2)
  }

  test("buildPackage of a single file (assembled jar) zips one entry") {
    val dir = tempDir("graft-deploy-jar-")
    val jar = dir.resolve("app.jar")
    Files.write(jar, "jarbytes".getBytes(StandardCharsets.UTF_8))
    val pkg = Deployer.buildPackage(jar.toFile)
    val out = tempDir("graft-deploy-unzip-")
    Deployer.unzipTo(pkg, out)
    assert(new String(Files.readAllBytes(out.resolve("app.jar")), StandardCharsets.UTF_8) == "jarbytes")
  }

  test("codeSha256 is base64(sha256) — corral's functionNeedsUpdate key") {
    val bytes = "function code".getBytes(StandardCharsets.UTF_8)
    val expected = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-256").digest(bytes))
    assert(Deployer.codeSha256(bytes) == expected)
  }

  test("unzipTo round-trips the tree and rejects path escapes (zip-slip)") {
    val code = tempDir("graft-deploy-code-")
    writeCode(code, "a/b.class" -> "bb", "c.class" -> "cc")
    val out = tempDir("graft-deploy-unzip-")
    Deployer.unzipTo(Deployer.buildPackage(code.toFile), out)
    assert(new String(Files.readAllBytes(out.resolve("a/b.class")), StandardCharsets.UTF_8) == "bb")
    assert(new String(Files.readAllBytes(out.resolve("c.class")), StandardCharsets.UTF_8) == "cc")

    // craft a package whose entry walks out of the target
    val bout = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(bout)
    zip.putNextEntry(new java.util.zip.ZipEntry("../evil.txt"))
    zip.write("x".getBytes(StandardCharsets.UTF_8))
    zip.closeEntry(); zip.close()
    val e = intercept[IllegalArgumentException] {
      Deployer.unzipTo(bout.toByteArray, tempDir("graft-deploy-slip-"))
    }
    assert(e.getMessage.contains("escapes"))
  }

  // -- deploy lifecycle ---------------------------------------------------

  private def freshPlane(): (LocalDirControlPlane, Path) = {
    val root = tempDir("graft-cp-")
    (new LocalDirControlPlane(root), root)
  }

  test("deploy lifecycle: create, no-op, code update, config update") {
    val (cp, _) = freshPlane()
    val code = tempDir("graft-deploy-code-")
    writeCode(code, "A.class" -> "v1")
    val cfg = FunctionConfig("fn", timeoutSeconds = 180, memoryMb = 1500)

    val pkg1 = Deployer.buildPackage(code.toFile)
    assert(Deployer.deploy(cp, cfg, pkg1) == Deployer.Created)
    val deployed = cp.getFunction("fn").get
    assert(deployed.codeSha256 == Deployer.codeSha256(pkg1))
    // the managed role was created and wired into the function config
    assert(deployed.config.roleArn == cp.getRole(Deployer.RoleName).get)

    // unchanged code + config -> "already up-to-date" no-op (client.go:98-100)
    assert(Deployer.deploy(cp, cfg, pkg1) == Deployer.UpToDate)

    // changed code only -> UpdateFunctionCode (client.go:86-90)
    writeCode(code, "A.class" -> "v2")
    val pkg2 = Deployer.buildPackage(code.toFile)
    assert(Deployer.deploy(cp, cfg, pkg2) == Deployer.Updated(codeChanged = true, configChanged = false))
    assert(cp.getFunction("fn").get.codeSha256 == Deployer.codeSha256(pkg2))
    assert(cp.downloadPackage("fn").sameElements(pkg2))

    // changed config only -> UpdateFunctionConfiguration (client.go:91-95)
    val bigger = cfg.copy(memoryMb = 3000)
    assert(Deployer.deploy(cp, bigger, pkg2) == Deployer.Updated(codeChanged = false, configChanged = true))
    assert(cp.getFunction("fn").get.config.memoryMb == 3000)

    // both at once
    writeCode(code, "A.class" -> "v3")
    val pkg3 = Deployer.buildPackage(code.toFile)
    assert(Deployer.deploy(cp, bigger.copy(timeoutSeconds = 900), pkg3) ==
      Deployer.Updated(codeChanged = true, configChanged = true))
  }

  test("manageRole=false uses the caller's role ARN and creates no role") {
    val (cp, _) = freshPlane()
    val code = tempDir("graft-deploy-code-")
    writeCode(code, "A.class" -> "x")
    val cfg = FunctionConfig("fn2", roleArn = "arn:external:role/ops")
    Deployer.deploy(cp, cfg, Deployer.buildPackage(code.toFile), manageRole = false)
    assert(cp.getFunction("fn2").get.config.roleArn == "arn:external:role/ops")
    assert(cp.getRole(Deployer.RoleName).isEmpty)
  }

  test("ensureRole is idempotent and repairs a drifted role document") {
    val (cp, root) = freshPlane()
    val arn = cp.ensureRole("TestRole")
    assert(arn == cp.ensureRole("TestRole"))
    // drift the stored document; ensureRole must rewrite it
    val roleFile = root.resolve("roles/TestRole.json")
    val good = Files.readAllBytes(roleFile)
    Files.write(roleFile, """{"Arn":"tampered"}""".getBytes(StandardCharsets.UTF_8))
    cp.ensureRole("TestRole")
    assert(Files.readAllBytes(roleFile).sameElements(good))
  }

  test("undeploy removes function and role; repeat is a tolerated no-op") {
    val (cp, _) = freshPlane()
    val code = tempDir("graft-deploy-code-")
    writeCode(code, "A.class" -> "x")
    Deployer.deploy(cp, FunctionConfig("fn3"), Deployer.buildPackage(code.toFile))
    assert(Deployer.undeploy(cp, "fn3") == (true, true))
    assert(cp.getFunction("fn3").isEmpty)
    assert(cp.getRole(Deployer.RoleName).isEmpty)
    // absence is not an error (corral swallows ResourceNotFound, client.go:111-117)
    assert(Deployer.undeploy(cp, "fn3") == (false, false))
  }

  test("control plane refuses create-on-existing and update-on-missing") {
    val (cp, _) = freshPlane()
    val code = tempDir("graft-deploy-code-")
    writeCode(code, "A.class" -> "x")
    val pkg = Deployer.buildPackage(code.toFile)
    cp.createFunction(FunctionConfig("fn4"), pkg)
    intercept[FunctionAlreadyExistsException](cp.createFunction(FunctionConfig("fn4"), pkg))
    intercept[IllegalStateException](cp.updateFunctionCode("missing", pkg))
    intercept[IllegalStateException](cp.updateFunctionConfig(FunctionConfig("missing")))
    intercept[IllegalArgumentException](cp.downloadPackage("missing"))
  }

  // -- deployed-package data plane ---------------------------------------

  test("DeployedPackageFaasClient classpath = sandbox + runtime, own code excluded") {
    val (cp, _) = freshPlane()
    val code = tempDir("graft-deploy-code-")
    writeCode(code, "pkg/Engine.class" -> "engine-bytes")
    Deployer.deploy(cp, FunctionConfig("fn5"), Deployer.buildPackage(code.toFile))
    val sandbox = tempDir("graft-sandbox-")
    val client = new DeployedPackageFaasClient(cp, sandbox)
    val cpStr = client.classpathFor("fn5")
    val entries = cpStr.split(java.io.File.pathSeparator)
    // head is the unpacked package, populated from the deployed zip
    assert(entries.head.startsWith(sandbox.toString))
    assert(Files.isRegularFile(java.nio.file.Paths.get(entries.head, "pkg/Engine.class")))
    // the driver's own code location must NOT leak into the sandbox JVM
    val own = Deployer.defaultCodeLocation().getCanonicalPath
    assert(entries.tail.forall(e => new java.io.File(e).getCanonicalPath != own))
    assert(client.lastClasspath == cpStr)

    // an undeployed function fails loud, pointing at the deploy verb
    val e = intercept[IllegalStateException](client.classpathFor("nope"))
    assert(e.getMessage.contains("not deployed"))
  }

  test("a lost create race converges through the update path instead of failing") {
    val (real, _) = freshPlane()
    val code = tempDir("graft-deploy-code-")
    writeCode(code, "A.class" -> "winner")
    val winnerPkg = Deployer.buildPackage(code.toFile)
    // a control plane whose first getFunction sees the pre-create gap:
    // the racing winner publishes between our read and our create
    val raced = new FaasControlPlane {
      private var first = true
      override def getFunction(name: String) =
        if (first) { first = false; Deployer.deploy(real, FunctionConfig(name), winnerPkg); None }
        else real.getFunction(name)
      override def createFunction(c: FunctionConfig, p: Array[Byte]) = real.createFunction(c, p)
      override def updateFunctionCode(n: String, p: Array[Byte]) = real.updateFunctionCode(n, p)
      override def updateFunctionConfig(c: FunctionConfig) = real.updateFunctionConfig(c)
      override def deleteFunction(n: String) = real.deleteFunction(n)
      override def downloadPackage(n: String) = real.downloadPackage(n)
      override def getRole(n: String) = real.getRole(n)
      override def ensureRole(n: String) = real.ensureRole(n)
      override def deleteRole(n: String) = real.deleteRole(n)
    }
    writeCode(code, "A.class" -> "loser")
    val loserPkg = Deployer.buildPackage(code.toFile)
    // the loser's deploy must not crash with ResourceConflict; it
    // converges as an update over the winner's function
    val outcome = Deployer.deploy(raced, FunctionConfig("racecreate"), loserPkg)
    assert(outcome == Deployer.Updated(codeChanged = true, configChanged = false))
    assert(real.getFunction("racecreate").get.codeSha256 == Deployer.codeSha256(loserPkg))
  }

  test("legacy fixed-name package layout still downloads (pre-content-addressing plane)") {
    val (cp, root) = freshPlane()
    val code = tempDir("graft-deploy-code-")
    writeCode(code, "A.class" -> "old-build")
    val pkg = Deployer.buildPackage(code.toFile)
    Deployer.deploy(cp, FunctionConfig("oldfn"), pkg)
    // rewrite the store into the old layout: one fixed package.zip
    val dir = root.resolve("functions/oldfn")
    import scala.jdk.CollectionConverters._
    val addressed = Files.list(dir).iterator().asScala
      .find(_.getFileName.toString.startsWith("package-")).get
    Files.move(addressed, dir.resolve("package.zip"))
    assert(cp.downloadPackage("oldfn").sameElements(pkg))
  }

  test("a closed client refuses further launches instead of re-populating the sandbox") {
    val (cp, _) = freshPlane()
    val code = tempDir("graft-deploy-code-")
    writeCode(code, "A.class" -> "x")
    Deployer.deploy(cp, FunctionConfig("fn9"), Deployer.buildPackage(code.toFile))
    val sandbox = tempDir("graft-sandbox-")
    val client = new DeployedPackageFaasClient(cp, sandbox)
    client.close()
    intercept[IllegalStateException](client.classpathFor("fn9"))
    assert(!Files.exists(sandbox))
  }

  test("concurrent code updates stay coherent: published SHA always matches its package") {
    val (cp, _) = freshPlane()
    val code = tempDir("graft-deploy-code-")
    writeCode(code, "A.class" -> "v0")
    Deployer.deploy(cp, FunctionConfig("racefn"), Deployer.buildPackage(code.toFile))

    // 8 deployers race different versions at the same function; packages
    // are content-addressed and function.json renames whole, so whatever
    // interleaving wins, the published (SHA, bytes) pair must verify
    val versions = (1 to 8).map { i =>
      val d = tempDir("graft-deploy-code-")
      writeCode(d, "A.class" -> s"v$i")
      Deployer.buildPackage(d.toFile)
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = versions.map { pkg =>
        pool.submit(new Runnable {
          override def run(): Unit =
            Deployer.deploy(cp, FunctionConfig("racefn"), pkg)
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()

    val fn = cp.getFunction("racefn").get
    val stored = cp.downloadPackage("racefn") // verifies SHA internally
    assert(Deployer.codeSha256(stored) == fn.codeSha256)
    assert(versions.map(Deployer.codeSha256).contains(fn.codeSha256),
      "published SHA is none of the deployed versions")
  }

  test("jar-built package rides the sandbox classpath as a jar entry") {
    val (cp, _) = freshPlane()
    val dir = tempDir("graft-deploy-jar-")
    val jar = dir.resolve("app.jar")
    Files.write(jar, "jarbytes".getBytes(StandardCharsets.UTF_8))
    Deployer.deploy(cp, FunctionConfig("jarfn"), Deployer.buildPackage(jar.toFile))
    val sandbox = tempDir("graft-sandbox-")
    val client = new DeployedPackageFaasClient(cp, sandbox)
    val entries = client.classpathFor("jarfn").split(java.io.File.pathSeparator)
    // the unpacked jar is its own classpath entry — a directory entry
    // alone would never load classes out of a nested jar
    assert(entries.exists(e => e.startsWith(sandbox.toString) && e.endsWith("app.jar")),
      s"unpacked jar missing from classpath: ${entries.take(3).mkString(":")}")
  }

  test("client close() reclaims the unpacked sandbox") {
    val (cp, _) = freshPlane()
    val code = tempDir("graft-deploy-code-")
    writeCode(code, "A.class" -> "x")
    Deployer.deploy(cp, FunctionConfig("fn6"), Deployer.buildPackage(code.toFile))
    val sandbox = tempDir("graft-sandbox-")
    val client = new DeployedPackageFaasClient(cp, sandbox)
    client.classpathFor("fn6")
    assert(Files.isRegularFile(sandbox.resolve(
      Files.list(sandbox).findFirst.get.getFileName).resolve("A.class")))
    client.close()
    assert(!Files.exists(sandbox), "sandbox not reclaimed on close")
  }

  test("deleteFunction survives stray temp files (crashed publish)") {
    val (cp, root) = freshPlane()
    val code = tempDir("graft-deploy-code-")
    writeCode(code, "A.class" -> "x")
    Deployer.deploy(cp, FunctionConfig("fn7"), Deployer.buildPackage(code.toFile))
    // simulate a crash between temp-write and rename
    Files.write(root.resolve("functions/fn7/package.zip.12345.tmp"),
      "partial".getBytes(StandardCharsets.UTF_8))
    assert(cp.deleteFunction("fn7"))
    assert(!Files.exists(root.resolve("functions/fn7")), "function dir left behind")
  }

  test("autoDeploy=false against an undeployed function fails at start, not in the lease loop") {
    val (_, root) = freshPlane()
    val conf = new org.apache.spark.SparkConf(false)
      .set(FaasDeploy.ControlPlaneDirKey, root.toString)
      .set(FaasDeploy.AutoDeployKey, "false")
    val e = intercept[IllegalArgumentException](FaasDeploy.clientFor(conf, "ghost"))
    assert(e.getMessage.contains("not deployed"))
  }

  test("leaseSeconds=0 (never expire) deploys a positive function timeout") {
    val (cp, root) = freshPlane()
    val conf = new org.apache.spark.SparkConf(false)
      .set(FaasDeploy.ControlPlaneDirKey, root.toString)
      .set("spark.graft.lambda.leaseSeconds", "0")
    FaasDeploy.clientFor(conf, "fn8").close()
    assert(cp.getFunction("fn8").get.config.timeoutSeconds == 900L)
  }

  // -- CLI + config cascade surface --------------------------------------

  test("Main parses --lambda and --undeploy (corral driver.go:218-233)") {
    val c = graft.Main.parseArgs(Seq("--lambda", "-o", "/tmp/out", "in.txt"))
    assert(c.lambda && !c.undeploy)
    // --undeploy needs no inputs/out, exactly like the reference
    val u = graft.Main.parseArgs(Seq("--undeploy"))
    assert(u.undeploy)
  }

  test("Main --undeploy tears down via the configured control plane") {
    val (cp, root) = freshPlane()
    val code = tempDir("graft-deploy-code-")
    writeCode(code, "A.class" -> "x")
    Deployer.deploy(cp, FunctionConfig("graft_function"), Deployer.buildPackage(code.toFile))
    val gconf = graft.GraftSession.Conf(faasControlPlane = Some(root.toString))
    assert(graft.Main.undeploy(gconf) == (true, true))
    assert(cp.getFunction("graft_function").isEmpty)
    // no control plane configured -> fail loud, not a silent no-op
    intercept[IllegalArgumentException](graft.Main.undeploy(graft.GraftSession.Conf()))
  }

  test("config cascade carries the FaaS function name and control plane") {
    val conf = graft.GraftSession.fromEnv(
      env = Map("GRAFT_LAMBDA_FUNCTION_NAME" -> "envfn"),
      rc = Map("lambdaFunctionName" -> "rcfn", "faasControlPlane" -> "/cp/from/rc"))
    assert(conf.faasFunction == "envfn") // env over rc
    assert(conf.faasControlPlane.contains("/cp/from/rc"))
    // default mirrors corral's "corral_function" (config.go:22)
    assert(graft.GraftSession.fromEnv(env = Map.empty, rc = Map.empty).faasFunction == "graft_function")
  }

  // -- round-12 hardening: contract exceptions + injective addressing ----

  test("createFunction signals a name conflict with the contract exception type") {
    val (cp, _) = freshPlane()
    val code = tempDir("graft-deploy-code-")
    writeCode(code, "A.class" -> "x")
    val pkg = Deployer.buildPackage(code.toFile)
    cp.createFunction(FunctionConfig("dupfn"), pkg)
    // the trait contract: conflicts surface as FunctionAlreadyExists,
    // the one type deploy()'s lost-race recovery keys on — NOT a
    // plane-specific IllegalArgumentException
    val e = intercept[FunctionAlreadyExistsException](
      cp.createFunction(FunctionConfig("dupfn"), pkg))
    assert(e.functionName == "dupfn")
  }

  test("safeSha is injective over base64 SHAs (distinct digests, distinct filenames)") {
    // the old '-'-folding collided '+' '/' '=' — these pairs are the
    // collision classes it had; base64url-without-padding separates them
    assert(Deployer.safeSha("ab+cd=") != Deployer.safeSha("ab/cd="))
    assert(Deployer.safeSha("ab+cd=") != Deployer.safeSha("ab=cd="))
    // and stays filesystem-safe: no path separators or padding chars
    val enc = Deployer.safeSha("A+B/C=")
    assert(!enc.exists(c => c == '/' || c == '+' || c == '='))
    // real digests round-trip distinctly
    val s1 = Deployer.codeSha256("one".getBytes(StandardCharsets.UTF_8))
    val s2 = Deployer.codeSha256("two".getBytes(StandardCharsets.UTF_8))
    assert(Deployer.safeSha(s1) != Deployer.safeSha(s2))
  }

  test("dash-folded package names from an older build still download") {
    val (cp, root) = freshPlane()
    val code = tempDir("graft-deploy-code-")
    writeCode(code, "A.class" -> "dash-era-build")
    val pkg = Deployer.buildPackage(code.toFile)
    Deployer.deploy(cp, FunctionConfig("dashfn"), pkg)
    // rewrite the store into the round-11 layout: dash-folded SHA name
    val dir = root.resolve("functions/dashfn")
    val sha = cp.getFunction("dashfn").get.codeSha256
    import scala.jdk.CollectionConverters._
    val addressed = Files.list(dir).iterator().asScala
      .find(_.getFileName.toString.startsWith("package-")).get
    Files.move(addressed, dir.resolve(s"package-${Deployer.legacySafeSha(sha)}.zip"))
    assert(cp.downloadPackage("dashfn").sameElements(pkg))
  }

  test("a package vanishing mid-download surfaces as ResourceNotFound, not NoSuchFile") {
    val (cp, root) = freshPlane()
    // the deleteFunction-races-download interleaving: the existence
    // check passed, then the file was removed before the read — the
    // read half must rethrow as the graceful ResourceNotFound shape
    val gone = root.resolve("functions/vanfn/package-gone.zip")
    val e = intercept[IllegalArgumentException](cp.readPackage(gone, "vanfn"))
    assert(e.getMessage.contains("ResourceNotFound"))
  }
}
