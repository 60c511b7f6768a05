package graft.mr

import java.util.Locale

/** The reference's Amplab benchmark example jobs as CLI-registry
  * entries, so the front door covers the whole examples directory
  * (`/root/reference/examples/README.md:5-24`):
  *
  *  - amplab1 — scan filter (`/root/reference/examples/amplab1/amplab1.go:15-33`)
  *  - amplab2 — substring-key revenue sum (`/root/reference/examples/amplab2/amplab2.go:22-43`)
  *  - amplab3 — two-stage reduce-side join + aggregate
  *    (`/root/reference/examples/amplab3/amplab3.go:36-121`)
  *
  * Hooks keep corral's algorithms (string KV, reduce-side buffering,
  * hand-rolled averages); the declarative twins of these workloads live
  * in `graft.operators.RelationalQueries` (q3/q4/q7).
  */
object AmplabJobs {

  /** Identity reduce that streams values (amplab1.go:29-33). */
  object StreamReducer extends Reducer {
    override def reduce(key: String, values: Iterator[String]): IterableOnce[(String, String)] =
      values.map(key -> _)
  }

  private val RankCutoff = 50 // amplab1.go:11

  /** amplab1.go:15-27: 3-field rankings CSV, keep pageRank > 50. A
    * non-numeric rank is skipped (Go's `err == nil` guard). */
  final class Amplab1Mapper extends Mapper {
    override def map(key: String, value: String): IterableOnce[(String, String)] = {
      val f = value.split(",", -1)
      if (f.length != 3) Iterator.empty
      else f(1).trim.toIntOption match {
        case Some(rank) if rank > RankCutoff => Iterator(f(0) -> f(1))
        case _ => Iterator.empty
      }
    }
  }

  private val SubStrX = 8 // amplab2.go:11

  /** amplab2.go:22-32: 9-field uservisits CSV → (sourceIP[:8], adRevenue). */
  final class Amplab2Mapper extends Mapper {
    override def map(key: String, value: String): IterableOnce[(String, String)] = {
      val f = value.split(",", -1)
      if (f.length != 9) Iterator.empty
      else Iterator(f(0).take(SubStrX) -> f(3))
    }
  }

  /** amplab2.go:34-43: sum parseable revenues, emit Go's "%f" format. */
  final class Amplab2SumReducer extends Reducer {
    override def reduce(key: String, values: Iterator[String]): IterableOnce[(String, String)] = {
      var total = 0.0
      values.foreach(v => v.toDoubleOption.foreach(total += _))
      Iterator(key -> String.format(Locale.ROOT, "%f", Double.box(total)))
    }
  }

  // -- amplab3: two-stage join + aggregate ------------------------------

  private val CutoffDate = java.time.LocalDate.of(2000, 1, 1) // amplab3.go:18

  // Full float syntax: Double.toString switches to scientific notation
  // below 1e-3 (e.g. 2.5E-4), so the pattern must accept signed exponents.
  private val numField =
    java.util.regex.Pattern.compile("\"(\\w+)\":(-?[0-9]+(?:\\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)")

  private def parseFields(s: String): Map[String, String] = {
    val m = numField.matcher(s)
    val b = Map.newBuilder[String, String]
    while (m.find()) b += (m.group(1) -> m.group(2))
    b.result()
  }

  /** amplab3.go:36-68: tag-by-arity — 3 fields is a ranking keyed by
    * pageURL, 9 fields a visit keyed by destURL and filtered on the
    * visit date. Unparseable rank/revenue default to 0 (Go's ignored
    * error returns zero values). */
  final class Amplab3JoinMapper extends Mapper {
    override def map(key: String, value: String): IterableOnce[(String, String)] = {
      val f = value.split(",", -1)
      if (f.length == 3) {
        val rank = f(1).trim.toIntOption.getOrElse(0)
        Iterator(f(0) -> s"""{"t":0,"rank":$rank}""")
      } else if (f.length == 9) {
        // amplab3.go:54-57 ignores the time.Parse error, so a malformed
        // date yields Go's zero time (0001-01-01) which is before the
        // cutoff — malformed-date visits are still emitted. Mirror that.
        val beforeCutoff =
          try java.time.LocalDate.parse(f(2)).isBefore(CutoffDate)
          catch { case _: java.time.format.DateTimeParseException => true }
        if (beforeCutoff) {
          val rev = f(3).toDoubleOption.getOrElse(0.0)
          Iterator(f(1) -> s"""{"t":1,"rev":$rev,"ip":"${f(0)}"}""")
        } else Iterator.empty
      } else Iterator.empty
    }
  }

  /** amplab3.go:75-97: buffer visits until the (unique) ranking record
    * for the URL arrives, then re-key each joined visit by sourceIP. */
  final class Amplab3JoinReducer extends Reducer {
    private val ipField = java.util.regex.Pattern.compile("\"ip\":\"([^\"]*)\"")

    override def reduce(key: String, values: Iterator[String]): IterableOnce[(String, String)] = {
      var rank: Option[Int] = None
      val pending = scala.collection.mutable.ArrayBuffer.empty[String]
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      def emit(r: Int, v: String): Unit = {
        val rev = parseFields(v)("rev")
        val m = ipField.matcher(v)
        require(m.find(), s"visit record without ip: $v")
        out += (m.group(1) -> s"""{"rank":$r,"rev":$rev}""")
      }
      values.foreach { v =>
        if (v.contains("\"t\":0")) {
          val r = parseFields(v)("rank").toInt
          rank = Some(r)
          pending.foreach(emit(r, _)); pending.clear()
        } else rank match {
          case Some(r) => emit(r, v)
          case None => pending += v
        }
      }
      out
    }
  }

  /** amplab3.go:103-120: per-IP averages of page rank and ad revenue,
    * emitted in Go's "%f\t%f" format. */
  final class Amplab3AvgReducer extends Reducer {
    override def reduce(key: String, values: Iterator[String]): IterableOnce[(String, String)] = {
      var sumRank = 0L; var sumRev = 0.0; var n = 0L
      values.foreach { v =>
        val f = parseFields(v)
        sumRank += f("rank").toLong; sumRev += f("rev").toDouble; n += 1
      }
      Iterator(key -> String.format(Locale.ROOT, "%f\t%f",
        Double.box(sumRank.toDouble / n), Double.box(sumRev / n)))
    }
  }

  /** Registry entries: job name → stage list (amplab3 is the reference's
    * NewMultiStageDriver two-job pipeline, amplab3.go:123-131). */
  val registry: Map[String, () => Seq[CorralJob]] = Map(
    "amplab1" -> (() => Seq(CorralJob(new Amplab1Mapper, StreamReducer))),
    "amplab2" -> (() => Seq(CorralJob(new Amplab2Mapper, new Amplab2SumReducer))),
    "amplab3" -> (() => Seq(
      CorralJob(new Amplab3JoinMapper, new Amplab3JoinReducer),
      CorralJob(MRQueries.IdentityMapper, new Amplab3AvgReducer))))
}
