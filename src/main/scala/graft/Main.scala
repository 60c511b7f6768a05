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
      verbose: Boolean = false)

  def parseArgs(argv: Seq[String]): CliConf = {
    @annotation.tailrec
    def loop(rest: List[String], c: CliConf): CliConf = rest match {
      case ("-o" | "--out") :: v :: t => loop(t, c.copy(out = v))
      case "--job" :: v :: t => loop(t, c.copy(jobs = v.split(",").toSeq))
      case "--bins" :: v :: t => loop(t, c.copy(bins = Some(v.toInt)))
      case ("-v" | "--verbose") :: t => loop(t, c.copy(verbose = true))
      case flag :: _ if flag.startsWith("-") =>
        throw new IllegalArgumentException(s"unknown flag: $flag")
      case in :: t => loop(t, c.copy(inputs = c.inputs :+ in))
      case Nil => c
    }
    val c = loop(argv.toList, CliConf())
    require(c.inputs.nonEmpty, "at least one input path/glob required")
    require(c.out.nonEmpty, "--out is required")
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

  def main(argv: Array[String]): Unit = {
    val conf = parseArgs(argv.toIndexedSeq)
    val gconf = GraftSession.fromEnv()
    val spark = GraftSession.builder(gconf).appName("graft").getOrCreate()
    if (!conf.verbose) spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val files = run(spark, conf)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"Job Execution Time: $secs%.2f s (${files.length} output files)")
    spark.stop()
  }
}
