package graft.mr

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's flagship workload (word count,
  * `/root/reference/examples/word_count/word_count.go`) run through the
  * MR facade, verified by the same SQL oracle as the relational form —
  * proving the facade computes identical results to the declarative path.
  */
object MRQueries {

  /** Tokenizer with the semantics of word_count.go:14-27: lowercase,
    * non-alphanumerics to spaces, split on whitespace. */
  final class WordCountMapper extends Mapper {
    override def map(key: String, value: String): IterableOnce[(String, String)] =
      value.toLowerCase
        .replaceAll("[^a-z0-9\\s]+", " ")
        .split("\\s+")
        .iterator
        .filter(_.nonEmpty)
        .map(w => (w, "1"))
  }

  /** Count reduce (word_count.go:29-35), declared associative so the
    * engine adds the map-side combiner corral lacks. */
  final class SumReducer extends AssociativeReducer {
    override def combine(a: String, b: String): String =
      (a.toLong + b.toLong).toString
  }

  private def mrWordcount(s: SparkSession, dir: String): DataFrame = {
    import MapReduce._
    val lines = Tables.documents(s, dir).select(col("text"))
      .as[String](stringEncoder)
    val out = CorralJob(new WordCountMapper, new SumReducer).runOnLines(lines)
    out.select(col("_1").as("word"), col("_2").cast("long").as("cnt"))
  }

  // same oracle as q2_wordcount — both paths must agree with DuckDB
  private val mrWordcountSql =
    """SELECT word, COUNT(*) AS cnt FROM (
      |  SELECT unnest(string_split_regex(
      |    lower(regexp_replace(text, '[^a-zA-Z0-9\s]+', ' ', 'g')),
      |    '\s+')) AS word
      |  FROM documents) t
      |WHERE word <> '' GROUP BY word""".stripMargin

  // -------------------------------------------------------------------
  // mr2: the reference's flagship multi-stage workload (AMPLab Q3,
  // `/root/reference/examples/amplab3/amplab3.go`) re-enacted through
  // the facade: two heterogeneous CSV streams tagged by arity
  // (amplab3.go:37-68), JSON-encoded records in the value string
  // (amplab3.go:26-33,70-73), reduce-side join buffering rows until the
  // unique build row arrives (amplab3.go:75-97), then a second stage
  // computing per-key averages by hand (amplab3.go:103-120).
  // Money/quantity carried as exact integer cents so the hand-rolled
  // average is bit-identical to the SQL oracle.
  // -------------------------------------------------------------------

  private val jsonNum = java.util.regex.Pattern.compile("\"(\\w+)\":(-?\\d+)")

  private def parseJsonLongs(s: String): Map[String, Long] = {
    val m = jsonNum.matcher(s)
    val b = Map.newBuilder[String, Long]
    while (m.find()) b += (m.group(1) -> m.group(2).toLong)
    b.result()
  }

  /** Tag-by-arity mapper: 3-field lines are orders (filtered on date),
    * 4-field lines are lineitems; both keyed by order key. */
  final class TagJoinMapper extends Mapper {
    override def map(key: String, value: String): IterableOnce[(String, String)] = {
      val f = value.split(",", -1)
      if (f.length == 3) {
        if (f(2) < "1998-01-01") // ISO date: string order = date order
          Iterator(f(0) -> s"""{"t":0,"custkey":${f(1).toLong}}""")
        else Iterator.empty
      } else if (f.length == 4) {
        val qc = Math.round(f(2).toDouble * 100) // centi-units, exact
        val pc = Math.round(f(3).toDouble * 100) // cents, exact
        Iterator(f(0) -> s"""{"t":1,"qc":$qc,"pc":$pc}""")
      } else Iterator.empty
    }
  }

  /** Reduce-side inner join: buffers lineitems until the (unique) order
    * record arrives, then streams — corral's exact algorithm. */
  final class JoinReducer extends Reducer {
    override def reduce(key: String, values: Iterator[String]): IterableOnce[(String, String)] = {
      var custkey: Option[Long] = None
      val pending = scala.collection.mutable.ArrayBuffer.empty[String]
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      def emit(ck: Long, v: String): Unit = {
        val r = parseJsonLongs(v)
        out += (ck.toString -> s"""{"qc":${r("qc")},"pc":${r("pc")}}""")
      }
      values.foreach { v =>
        if (v.contains("\"t\":0")) {
          val ck = parseJsonLongs(v)("custkey")
          custkey = Some(ck)
          pending.foreach(emit(ck, _)); pending.clear()
        } else custkey match {
          case Some(ck) => emit(ck, v)
          case None => pending += v
        }
      }
      out
    }
  }

  /** Stage-2: per-customer averages from exact integer sums
    * (amplab3.go:103-120's sum/count by hand). */
  final class AvgReducer extends Reducer {
    override def reduce(key: String, values: Iterator[String]): IterableOnce[(String, String)] = {
      var qc = 0L; var pc = 0L; var n = 0L
      values.foreach { v =>
        val r = parseJsonLongs(v)
        qc += r("qc"); pc += r("pc"); n += 1
      }
      val avgRev = (pc.toDouble / 100.0) / n
      val avgQty = (qc.toDouble / 100.0) / n
      Iterator(key -> s"$avgRev|$avgQty")
    }
  }

  /** The two heterogeneous CSV streams, as the reference jobs read them. */
  private def csvLines(s: SparkSession, dir: String) = {
    import MapReduce.stringEncoder
    val oLines = Tables.orders(s, dir).select(concat_ws(",",
      col("o_orderkey"), col("o_custkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd")).as("value"))
    // r20 A/B note: widening the unioned CSV-LINE stream measured and
    // REJECTED (mr2 off 2.05 s vs on 2.59 s min-of-3,
    // target/r20opt_ab4.log — the concatenated-string exchange costs
    // more than the parallel map saves).
    // r21 (verdict item 7): StageProbe re-attribution shows the map
    // stage SKEWED, not merely serial — 4 tasks, maxTask 0.82 s, and
    // the straggler is the lineitem side (600 k rows through
    // concat_ws + split + Tagged per row) while orders finishes in a
    // fraction of that. Widening the RAW lineitem scan BELOW the
    // concat (narrow typed columns cross the exchange, not the
    // concatenated strings) splits exactly the straggler.
    val lLines = graft.api.Scan.widen(
        Tables.lineitem(s, dir), col("l_orderkey"))
      .select(concat_ws(",",
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice")).as("value"))
    oLines.union(lLines).as[String](stringEncoder)
  }

  private def mrJoinAvg(s: SparkSession, dir: String): DataFrame = {
    import MapReduce._
    val lines = csvLines(s, dir)
    val driver = MultiStageDriver(Seq(
      CorralJob(new TagJoinMapper, new JoinReducer),
      CorralJob(IdentityMapper, new AvgReducer)))
    val out = driver.run(lines.map(l => ("", l))(kvEncoder))
    out.select(
      col("_1").cast("long").as("o_custkey"),
      split(col("_2"), "\\|").getItem(0).cast("double").as("avg_rev"),
      split(col("_2"), "\\|").getItem(1).cast("double").as("avg_qty"))
  }

  object IdentityMapper extends Mapper {
    override def map(key: String, value: String): IterableOnce[(String, String)] =
      Iterator(key -> value)
  }

  // -------------------------------------------------------------------
  // mr2 (typed): the same two-stage reduce-side join through the typed
  // facade — identical hooks and algorithm (tag streams, buffer until
  // the unique order record arrives, hand-rolled averages over exact
  // integer cents), but intermediate records are Encoder-backed case
  // classes, so the shuffle carries compact Tungsten rows instead of
  // JSON-in-string KV. The string-KV twin below (mr2s) measures
  // corral's actual wire cost; this is the same job at scale-friendly
  // serialization.
  // -------------------------------------------------------------------

  /** Tagged stage-1 record: t=0 → order (a=custkey); t=1 → lineitem
    * (a=quantity-cents, b=price-cents). */
  final case class Tagged(t: Byte, a: Long, b: Long)
  final case class Joined(custkey: Long, qc: Long, pc: Long)

  final class TypedTagJoinMapper extends TypedMapper[String, Long, Tagged] {
    override def map(value: String): IterableOnce[(Long, Tagged)] = {
      val f = value.split(",", -1)
      if (f.length == 3) {
        if (f(2) < "1998-01-01") // ISO date: string order = date order
          Iterator(f(0).toLong -> Tagged(0, f(1).toLong, 0L))
        else Iterator.empty
      } else if (f.length == 4) {
        Iterator(f(0).toLong -> Tagged(1,
          Math.round(f(2).toDouble * 100), Math.round(f(3).toDouble * 100)))
      } else Iterator.empty
    }
  }

  final class TypedJoinReducer extends TypedReducer[Long, Tagged, Joined] {
    override def reduce(key: Long, values: Iterator[Tagged]): IterableOnce[Joined] = {
      var custkey = -1L
      val pending = scala.collection.mutable.ArrayBuffer.empty[Tagged]
      val out = scala.collection.mutable.ArrayBuffer.empty[Joined]
      values.foreach { v =>
        if (v.t == 0) {
          custkey = v.a
          pending.foreach(p => out += Joined(custkey, p.a, p.b)); pending.clear()
        } else if (custkey >= 0) out += Joined(custkey, v.a, v.b)
        else pending += v
      }
      out
    }
  }

  final class ReKeyByCustMapper extends TypedMapper[Joined, Long, Joined] {
    override def map(r: Joined): IterableOnce[(Long, Joined)] =
      Iterator(r.custkey -> r)
  }

  final class TypedAvgReducer extends TypedReducer[Long, Joined, (Long, Double, Double)] {
    override def reduce(key: Long, values: Iterator[Joined]): IterableOnce[(Long, Double, Double)] = {
      var qc = 0L; var pc = 0L; var n = 0L
      values.foreach { r => qc += r.qc; pc += r.pc; n += 1 }
      Iterator((key, (pc.toDouble / 100.0) / n, (qc.toDouble / 100.0) / n))
    }
  }

  private def mrJoinAvgTyped(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val lines = csvLines(s, dir)
    val stage1 = TypedJob(new TypedTagJoinMapper, new TypedJoinReducer)
    val stage2 = TypedJob(new ReKeyByCustMapper, new TypedAvgReducer)
    stage2.run(stage1.run(lines))
      .toDF("o_custkey", "avg_rev", "avg_qty")
  }

  // same oracle as the declarative two-stage pipeline (q8_two_stage)
  private val mrJoinAvgSql =
    """SELECT o_custkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_rev,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY o_custkey""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("mr1_wordcount", mrWordcount, Some(mrWordcountSql)),
    // typed facade is the benched form; the string-KV twin stays oracled
    // (not benched) as the measured corral-fidelity wire format
    QueryDef("mr2_join_avg", mrJoinAvgTyped, Some(mrJoinAvgSql), bench = true),
    QueryDef("mr2s_join_avg_kv", mrJoinAvg, Some(mrJoinAvgSql)),
  )
}
