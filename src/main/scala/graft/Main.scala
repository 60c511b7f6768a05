package graft

import graft.mr.{CorralJob, MRQueries, Mapper, Reducer, TextKV}
import org.apache.spark.sql.SparkSession

/** User-facing CLI driver — the engine's front door, mirroring the
  * reference's `Driver.Main()` (`/root/reference/driver.go:226-262`):
  * positional input globs, `--out` output location, flags layered over
  * the `GRAFT_*` env cascade. Runs a (multi-stage) MR-facade job end to
  * end and writes `output-part-<i>` TSV files, so a corral user can
  * point this at a directory of text files and get the same artifact
  * corral's driver produces (behavior pinned by MainSpec, porting
  * `/root/reference/driver_test.go:82-116`).
  *
  * The reference compiles user jobs into the binary; here the
  * `--job` flag selects from the built-in job registry (the shipped
  * example jobs), and library users compose [[graft.mr.CorralJob]]
  * directly for custom hooks.
  *
  * Usage:
  *   graft.Main [--job name[,name...]] [--bins N] [-v] -o OUT input...
  */
object Main {

  /** Identity reduce — streams every value through unchanged. */
  object IdentityReducer extends Reducer {
    override def reduce(key: String, values: Iterator[String]): IterableOnce[(String, String)] =
      values.map(v => (key, v))
  }

  /** Built-in jobs (the reference's examples directory, as a registry).
    * A name maps to a stage LIST so multi-stage examples (amplab3's
    * two-job pipeline) run under one name, like the reference's
    * NewMultiStageDriver binaries. */
  val jobRegistry: Map[String, () => Seq[CorralJob]] = Map(
    "wordcount" -> (() => Seq(CorralJob(new MRQueries.WordCountMapper, new MRQueries.SumReducer))),
    "identity" -> (() => Seq(CorralJob(MRQueries.IdentityMapper, IdentityReducer)))
  ) ++ graft.mr.AmplabJobs.registry

  final case class CliConf(
      inputs: Seq[String] = Nil,
      out: String = "",
      jobs: Seq[String] = Seq("wordcount"),
      bins: Option[Int] = None,
      verbose: Boolean = false,
      // corral's backend flags (driver.go:218-233): `--lambda` runs the
      // job on the FaaS backend (deploy-on-start included); `--undeploy`
      // tears down function + role WITHOUT running the driver
      lambda: Boolean = false,
      undeploy: Boolean = false)

  def parseArgs(argv: Seq[String]): CliConf = {
    @annotation.tailrec
    def loop(rest: List[String], c: CliConf): CliConf = rest match {
      case ("-o" | "--out") :: v :: t => loop(t, c.copy(out = v))
      case "--job" :: v :: t => loop(t, c.copy(jobs = v.split(",").toSeq))
      case "--bins" :: v :: t => loop(t, c.copy(bins = Some(v.toInt)))
      case ("-v" | "--verbose") :: t => loop(t, c.copy(verbose = true))
      case "--lambda" :: t => loop(t, c.copy(lambda = true))
      case "--undeploy" :: t => loop(t, c.copy(undeploy = true))
      case flag :: _ if flag.startsWith("-") =>
        throw new IllegalArgumentException(s"unknown flag: $flag")
      case in :: t => loop(t, c.copy(inputs = c.inputs :+ in))
      case Nil => c
    }
    val c = loop(argv.toList, CliConf())
    if (!c.undeploy) { // corral's --undeploy returns before input parsing
      require(c.inputs.nonEmpty, "at least one input path/glob required")
      require(c.out.nonEmpty, "--out is required")
    }
    val unknown = c.jobs.filterNot(jobRegistry.contains)
    require(unknown.isEmpty,
      s"unknown job(s): ${unknown.mkString(",")}; known: ${jobRegistry.keys.mkString(",")}")
    c
  }

  /** Run the job pipeline on an existing session. Multi-job pipelines
    * materialize each intermediate stage as TSV under `out/job<i>/` and
    * feed it to the next job — the reference's exact chaining
    * (`/root/reference/driver.go:195-216`: "inputs of next job =
    * outputs of current"). Returns the final output file paths. */
  def run(spark: SparkSession, conf: CliConf): Seq[String] = {
    val jobs = conf.jobs.flatMap(name => jobRegistry(name)().map(_.copy(numBins = conf.bins)))
    var ds = TextKV.read(spark, conf.inputs: _*)
    jobs.zipWithIndex.foreach { case (job, i) =>
      if (i < jobs.length - 1) {
        val stageDir = s"${conf.out}/job$i"
        TextKV.writeTsv(job.run(ds), stageDir)
        ds = TextKV.readTsv(spark, stageDir)
      }
    }
    TextKV.writeTsvNumbered(jobs.last.run(ds), conf.out)
  }

  /** `--undeploy` (reference driver.go:222-233): tear down the deployed
    * function and managed role, WITHOUT starting a driver/session.
    * Returns (functionExisted, roleExisted). */
  def undeploy(gconf: GraftSession.Conf): (Boolean, Boolean) = {
    val dir = gconf.faasControlPlane.getOrElse(throw new IllegalArgumentException(
      "--undeploy needs a control plane: set GRAFT_FAAS_CONTROL_PLANE " +
        "(or graftrc faasControlPlane)"))
    val (f, r) = graft.lambda.Deployer.undeploy(
      new graft.lambda.LocalDirControlPlane(java.nio.file.Paths.get(dir)),
      gconf.faasFunction)
    println(s"undeployed function '${gconf.faasFunction}' (existed: $f); " +
      s"role '${graft.lambda.Deployer.RoleName}' (existed: $r)")
    (f, r)
  }

  /** `--lambda` (reference driver.go:246-249): run on the FaaS backend —
    * master `lambda://<function>` against the configured control plane,
    * deploy-on-start included (the cluster manager's autoDeploy). */
  def lambdaBuilder(gconf: GraftSession.Conf): org.apache.spark.sql.SparkSession.Builder = {
    val dir = gconf.faasControlPlane.getOrElse(throw new IllegalArgumentException(
      "--lambda needs a control plane: set GRAFT_FAAS_CONTROL_PLANE " +
        "(or graftrc faasControlPlane)"))
    GraftSession.builder(gconf, local = false)
      .master(graft.lambda.LambdaClusterManager.SCHEME + gconf.faasFunction)
      .config(graft.lambda.FaasDeploy.ControlPlaneDirKey, dir)
      // FaaS sandboxes dial out to the driver; bind it somewhere routable
      .config("spark.driver.host", "localhost")
      .config("spark.driver.bindAddress", "localhost")
  }

  def main(argv: Array[String]): Unit = {
    val conf = parseArgs(argv.toIndexedSeq)
    val gconf = GraftSession.fromEnv()
    if (conf.undeploy) { undeploy(gconf); return }
    val builder =
      if (conf.lambda) lambdaBuilder(gconf) else GraftSession.builder(gconf)
    val spark = builder.appName("graft").getOrCreate()
    if (!conf.verbose) spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val files = run(spark, conf)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"Job Execution Time: $secs%.2f s (${files.length} output files)")
    spark.stop()
  }
}
