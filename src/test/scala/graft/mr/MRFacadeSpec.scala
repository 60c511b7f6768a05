package graft.mr

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Serializable map/reduce fixtures (top-level so Spark closures don't
  * capture the test class). */
object MRFixtures {
  final class TokenMapper extends Mapper {
    def map(key: String, value: String): IterableOnce[(String, String)] =
      value.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, "1"))
  }
  final class CountReducer extends Reducer {
    def reduce(key: String, values: Iterator[String]): IterableOnce[(String, String)] =
      Iterator(key -> values.size.toString)
  }
  final class PrefixFilterMapper(prefix: String) extends Mapper {
    def map(k: String, v: String): IterableOnce[(String, String)] =
      if (k.startsWith(prefix)) Iterator(k -> v) else Iterator.empty
  }
  final class IdentityReducer extends Reducer {
    def reduce(k: String, vs: Iterator[String]): IterableOnce[(String, String)] =
      vs.map(k -> _)
  }
  final class MaxReducer extends Reducer {
    def reduce(k: String, vs: Iterator[String]): IterableOnce[(String, String)] =
      Iterator(k -> vs.map(_.toInt).max.toString)
  }
  /** Emits a running per-task record count (reference stateful mapper,
    * driver_test.go:166-219). */
  final class StatefulMapper extends Mapper {
    private var seen = 0
    def map(k: String, v: String): IterableOnce[(String, String)] = {
      seen += 1
      Iterator(("count", seen.toString))
    }
  }
  val lenPartition: (String, Int) => Int = (key, n) => key.length % n
}

/** Corral-semantics tests, ported from the reference suite:
  * wordcount e2e (`driver_test.go:82-116`), multi-stage with prefix
  * filter (`driver_test.go:118-153`), custom partitioner routing
  * (`emitter_test.go:129-155`), stateful mapper (`driver_test.go:166-219`),
  * input-record decode edge cases (`job_test.go:9-27`). Assertions are
  * order-insensitive — corral guarantees grouping, never order
  * (`README.md:213-215`).
  */
class MRFacadeSpec extends AnyFunSuite with SparkSpec {
  import MapReduce._
  import MRFixtures._

  private def lines(ls: String*) = {
    val s = spark
    s.createDataset(ls)(stringEncoder)
  }

  test("wordcount end-to-end (driver_test.go:82-116)") {
    val in = lines("the quick brown fox", "the lazy dog", "the fox")
    val out = CorralJob(new TokenMapper, new CountReducer).runOnLines(in)
      .collect().toMap
    assert(out == Map("the" -> "3", "quick" -> "1", "brown" -> "1",
      "fox" -> "2", "lazy" -> "1", "dog" -> "1"))
  }

  test("associative (combiner) reducer agrees with plain reducer") {
    val in = lines("a b a", "b b c", "a")
    val plain = CorralJob(new TokenMapper, new CountReducer).runOnLines(in)
      .collect().toMap
    val assoc = CorralJob(new TokenMapper, new MRQueries.SumReducer).runOnLines(in)
      .collect().toMap
    assert(plain == assoc)
  }

  test("multi-stage: wordcount then prefix filter (driver_test.go:118-153)") {
    val wc = CorralJob(new TokenMapper, new CountReducer)
    val prefixJob = CorralJob(new PrefixFilterMapper("f"), new IdentityReducer)
    val in = lines("foo bar foo", "baz fizz foo")
    val out = MultiStageDriver(Seq(wc, prefixJob)).run(
      in.map(l => ("", l))(kvEncoder)).collect().toMap
    assert(out == Map("foo" -> "3", "fizz" -> "1"))
  }

  test("multi-stage materialized round-trips through TSV") {
    val wc = CorralJob(new TokenMapper, new CountReducer)
    val in = lines("x y x", "y z").map(l => ("", l))(kvEncoder)
    val tmp = java.nio.file.Files.createTempDirectory("graft-mr").toString
    val out = MultiStageDriver(Seq(wc)).runMaterialized(in, tmp).collect().toMap
    assert(out == Map("x" -> "2", "y" -> "2", "z" -> "1"))
  }

  test("materialized intermediates are cleaned up once the last stage lands (F12, job.go:146-152)") {
    val wc = CorralJob(new TokenMapper, new CountReducer)
    val prefixJob = CorralJob(new PrefixFilterMapper("f"), new IdentityReducer)
    val in = lines("foo bar foo", "baz fizz foo").map(l => ("", l))(kvEncoder)
    val tmp = java.nio.file.Files.createTempDirectory("graft-mr-clean").toString
    val out = MultiStageDriver(Seq(wc, prefixJob)).runMaterialized(in, tmp)
    // job0 (intermediate) is deleted eagerly; job1 must survive — the
    // returned Dataset still reads from it lazily
    assert(!new java.io.File(s"$tmp/job0").exists())
    assert(new java.io.File(s"$tmp/job1").exists())
    assert(out.collect().toMap == Map("foo" -> "3", "fizz" -> "1"))
  }

  test("custom partition function routes every key to its bin (emitter_test.go:129-155)") {
    val job = CorralJob(new TokenMapper, new CountReducer,
      partitionFunc = Some(lenPartition), numBins = Some(4))
    val in = lines("a bb ccc dddd a bb")
    val out = job.runOnLines(in).collect().toMap
    assert(out == Map("a" -> "2", "bb" -> "2", "ccc" -> "1", "dddd" -> "1"))
    // routing honored exactly: key lands in partition lenPartition(key, 4)
    val mapped = in.flatMap(l => new TokenMapper().map("", l))(kvEncoder)
    val parts = mapped.rdd.map(kv => (kv._1, kv._2))
      .partitionBy(new MapReduce.FuncPartitioner(4, lenPartition))
      .mapPartitionsWithIndex((i, it) => it.map(kv => (i, kv._1)))
      .collect()
    assert(parts.nonEmpty)
    assert(parts.forall { case (bin, key) => bin == lenPartition(key, 4) })
  }

  test("stateful mapper keeps state within a partition (driver_test.go:166-219)") {
    val in = lines("r1", "r2", "r3", "r4").repartition(1)
    val out = CorralJob(new StatefulMapper, new MaxReducer)
      .runOnLines(in).collect().toMap
    assert(out == Map("count" -> "4")) // state accumulated across the task
  }

  test("splitInputRecord edge cases (job_test.go:9-27)") {
    assert(TextKV.splitInputRecord("k\tv") == (("k", "v")))
    assert(TextKV.splitInputRecord("no tab here") == (("", "no tab here")))
    assert(TextKV.splitInputRecord("a\tb\tc") == (("", "a\tb\tc")))
    assert(TextKV.splitInputRecord("") == (("", "")))
    assert(TextKV.splitInputRecord("k\t") == (("k", "")))
  }

  test("no input produces no output without crashing (driver_test.go:155-164)") {
    val in = lines()
    val out = CorralJob(new TokenMapper, new CountReducer).runOnLines(in)
    assert(out.count() == 0)
  }

  test("custom-partitioner path streams runs; partial consumers can't corrupt groups") {
    // a reducer that reads only the FIRST value — leftovers of the run
    // must be skipped, not bleed into the next key's group
    object FirstOnly extends Reducer {
      override def reduce(key: String, values: Iterator[String]): IterableOnce[(String, String)] =
        Iterator(key -> values.next())
    }
    val in = lines("a a a bb bb ccc a bb ccc ccc ccc")
    val out = CorralJob(new TokenMapper, FirstOnly,
      partitionFunc = Some(lenPartition), numBins = Some(3))
      .runOnLines(in).collect().toMap
    assert(out == Map("a" -> "1", "bb" -> "1", "ccc" -> "1"))
  }

  test("GroupedRuns walks sorted runs lazily and completely") {
    val recs = Seq("a" -> "1", "a" -> "2", "b" -> "3", "c" -> "4", "c" -> "5")
    val groups = new MapReduce.GroupedRuns(recs.iterator.buffered)
      .map { case (k, vs) => k -> vs.toList }.toList
    assert(groups == List("a" -> List("1", "2"), "b" -> List("3"), "c" -> List("4", "5")))
    // partial consumption: take nothing from each run
    val keysOnly = new MapReduce.GroupedRuns(recs.iterator.buffered)
      .map(_._1).toList
    assert(keysOnly == List("a", "b", "c"))
  }
}
