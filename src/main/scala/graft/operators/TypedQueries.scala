package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Aggregators

/** Typed Dataset surface: case-class rows + Aggregator (SURVEY.md §2.4).
  * The partial-aggregation plan (ObjectHashAggregate partial+final) is
  * the scalable form of corral's reducer — per-key state merges map-side
  * before the shuffle. */
object TypedQueries {
  import Aggregators._

  private def typedAgg(s: SparkSession, dir: String): DataFrame = {
    implicit val docEnc = Encoders.product[LangDoc]
    implicit val strEnc = Encoders.STRING
    val ds = Tables.documents(s, dir)
      .select(col("lang"), col("n_chars")).as[LangDoc]
    ds.groupByKey(_.lang)
      .agg(MeanChars.toColumn.name("avg_chars"))
      .toDF("lang", "avg_chars")
  }

  // exact long sum → double division: identical to the Aggregator's
  // finish() arithmetic
  private val typedAggSql =
    """SELECT lang, CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
      |FROM documents GROUP BY lang""".stripMargin

  // -- qs1: HyperLogLog distinct-count sketch ---------------------------
  // An approximate operator with an exact oracle: the sketch is
  // deterministic mod-P arithmetic (see Aggregators.Hll), so DuckDB
  // replays bucket assignment, trailing-zero ranks, per-bucket maxima,
  // and the (order-independent-in-IEEE) harmonic estimate bit-for-bit.
  private def hllDistinct(s: SparkSession, dir: String): DataFrame = {
    implicit val longEnc = Encoders.scalaLong
    val events = Tables.events(s, dir)
    val hll = events.select(col("user_id")).as[Long]
      .select(HllDistinct.toColumn.name("n_hll")).toDF()
    events.agg(countDistinct(col("user_id")).as("n_exact")).crossJoin(hll)
  }

  // shared HLL SQL pieces (qs1 global + qs4 per-key use the identical
  // sketch arithmetic — one generator so a constant tweak cannot
  // desynchronize the two oracles)
  private def hllRankCase: String = {
    import Hll._
    (1 to RankCap - 1).map { k =>
      s"WHEN h2 % ${1L << k} = ${1L << (k - 1)} THEN $k"
    }.mkString("CASE ", " ", s" ELSE $RankCap END")
  }

  // e0 suffix: parse as DOUBLE (a bare decimal literal is DECIMAL and
  // overflows); shortest-round-trip repr → identical bits
  private def hllRawEstSql: String = {
    import Hll._
    s"${Alpha}e0 * ${M * M} / " +
      s"(SUM(1.0 / (CAST(1 AS BIGINT) << m)) + ($M - COUNT(*)) * 1.0)"
  }

  // small-range linear counting M*ln(M/zeros): a pure function of the
  // integer zeros, replayed as literals from the JVM's own Math.log so
  // DuckDB's ln() can't introduce a last-bit mismatch
  private def hllCorrectedSql: String = {
    import Hll._
    val linearCase = (1 to M).map(z => s"WHEN $z THEN ${linearCount(z)}e0")
      .mkString(" ") + " ELSE raw"
    s"CASE WHEN raw <= ${2.5 * M}e0 AND zeros > 0 " +
      s"THEN CASE zeros $linearCase END ELSE raw END"
  }

  private val hllDistinctSql: String = {
    import Hll._
    s"""WITH h0 AS (
       |  SELECT ((user_id % $P) * $A1 + $B1) % $P AS v FROM events),
       |h AS (
       |  SELECT ((v * v + $B2) % $P) % $M AS bucket,
       |         ((v * v + $B2) % $P) // $M AS h2
       |  FROM h0),
       |r AS (SELECT bucket, $hllRankCase AS rnk FROM h),
       |mx AS (SELECT bucket, MAX(rnk) AS m FROM r GROUP BY bucket),
       |est AS (
       |  SELECT $hllRawEstSql AS raw,
       |         $M - COUNT(*) AS zeros
       |  FROM mx)
       |SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_exact,
       |  $hllCorrectedSql AS n_hll
       |FROM est""".stripMargin
  }

  // -- qs2: count-min sketch heavy hitters ------------------------------
  // A linear sketch is just a group-by in disguise: the d×w counter
  // table is sum(1) grouped by (row, hash_row(key) mod w) — Spark plans
  // it as an ordinary partial+final HashAggregate, and DuckDB replays
  // it exactly (deterministic affine+quadratic column hashes, exact
  // integer counts). The query materializes the sketch from the
  // wordcount stream, then reports the CMS estimate (min over rows)
  // next to the exact count for the top-10 exact words — estimate ≥
  // exact always, equality when no collision.
  private val CmsD = 4
  private val CmsW = 1024
  private val CmsP = graft.functions.PolyHashConstants.P
  private val CmsA = Seq(1103515245L, 214013L, 69069L, 1664525L)
  private val CmsB = Seq(12345L, 2531011L, 362437L, 1013904223L)

  private def cmsTopK(s: SparkSession, dir: String): DataFrame = {
    graft.functions.HashFunctions.register(s)
    val words = Tables.documents(s, dir)
      .select(explode(graft.functions.HashFunctions.tokenizeWords(col("text")))
        .as("word"))
    val sketch = graft.api.Sketches.cmsSketch(words, "word", CmsD, CmsW)
    // exact top-10 words (deterministic tie-break on word)
    val top = words.groupBy(col("word")).agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("word")).limit(10)
    top.join(
      graft.api.Sketches.cmsEstimate(sketch, top, "word", CmsD, CmsW), "word")
  }

  private val cmsTopKSql: String = {
    val hashCols = (0 until CmsD).map { j =>
      s"(((h0 * ${CmsA(j)} + ${CmsB(j)}) % $CmsP) * ((h0 * ${CmsA(j)} + ${CmsB(j)}) % $CmsP) + ${CmsB((j + 1) % CmsD)}) % $CmsP % $CmsW AS c$j"
    }.mkString(",\n    ")
    val cellBranches = (0 until CmsD).map { j =>
      s"SELECT word, $j AS row, c$j AS cell FROM hashed"
    }.mkString("\nUNION ALL\n")
    s"""WITH words AS (
       |  SELECT unnest(string_split_regex(
       |    lower(regexp_replace(text, '[^a-zA-Z0-9\\s]+', ' ', 'g')),
       |    '\\s+')) AS word
       |  FROM documents),
       |w AS (SELECT word FROM words WHERE word <> ''),
       |hashed AS (
       |  SELECT word, $hashCols
       |  FROM (SELECT word, ${graft.functions.HashFunctions.strHashPSql("word")} AS h0 FROM w) t),
       |cells AS (
       |$cellBranches),
       |sketch AS (
       |  SELECT row, cell, COUNT(*) AS cnt FROM cells GROUP BY row, cell),
       |top AS (
       |  SELECT word, COUNT(*) AS exact FROM w GROUP BY word
       |  ORDER BY exact DESC, word LIMIT 10),
       |probes AS (
       |  SELECT t.word, t.exact, c.row, c.cell
       |  FROM top t JOIN (SELECT DISTINCT * FROM cells) c ON t.word = c.word)
       |SELECT p.word, p.exact, MIN(s.cnt) AS cms_est
       |FROM probes p JOIN sketch s ON p.row = s.row AND p.cell = s.cell
       |GROUP BY p.word, p.exact""".stripMargin
  }

  // -- q30: bounded top-K per key via aggregation -----------------------
  // Same result set as the window formulation (q16's shape) but as a
  // partial+final aggregate with O(K) state per key: each map task
  // pre-reduces to ≤K rows per key BEFORE the shuffle, where the
  // window form shuffles every row and sorts whole partitions. At
  // K ≪ group size this is the 100 TB-safe top-k.
  private def topKAgg(s: SparkSession, dir: String): DataFrame =
    graft.api.TopKPerKey(Tables.orders(s, dir),
      "o_custkey", "o_totalprice", "o_orderkey", TopK.K)

  private val topKAggSql =
    s"""SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
       |  SELECT o_custkey, o_orderkey, o_totalprice,
       |    CAST(row_number() OVER (PARTITION BY o_custkey
       |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rank
       |  FROM orders) t
       |WHERE rank <= ${TopK.K}""".stripMargin

  // -- qs4: per-key HLL distinct ----------------------------------------
  // The grouped form of qs1 — one 64-byte sketch buffer PER KEY,
  // merged map-side before the shuffle (ObjectHashAggregate partial+
  // final), which is how approximate distinct actually runs in a
  // pipeline ("distinct users per event type" at 100 TB shuffles
  // nKeys·64 bytes, not nRows ids). Exact count-distinct rides along
  // per group; the oracle replays sketch AND correction per group.
  private def hllPerKey(s: SparkSession, dir: String): DataFrame = {
    val hllU = udaf(HllDistinct, Encoders.scalaLong)
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"),
        hllU(col("user_id")).as("n_hll"))
  }

  private val hllPerKeySql: String = {
    import Hll._
    s"""WITH h0 AS (
       |  SELECT event_type, ((user_id % $P) * $A1 + $B1) % $P AS v FROM events),
       |h AS (
       |  SELECT event_type, ((v * v + $B2) % $P) % $M AS bucket,
       |         ((v * v + $B2) % $P) // $M AS h2
       |  FROM h0),
       |r AS (SELECT event_type, bucket, $hllRankCase AS rnk FROM h),
       |mx AS (SELECT event_type, bucket, MAX(rnk) AS m FROM r GROUP BY 1, 2),
       |est AS (
       |  SELECT event_type, $hllRawEstSql AS raw,
       |    $M - COUNT(*) AS zeros
       |  FROM mx GROUP BY 1),
       |ex AS (
       |  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
       |  FROM events GROUP BY 1)
       |SELECT ex.event_type, n_exact,
       |  $hllCorrectedSql AS n_hll
       |-- null-safe join: Spark's groupBy emits a NULL-key group, which
       |-- JOIN USING would drop
       |FROM ex JOIN est ON ex.event_type IS NOT DISTINCT FROM est.event_type""".stripMargin
  }

  // -- qs3: Bloom-filter runtime semi-join ------------------------------
  // The explicit form of the 100 TB join optimization: build a kB-sized
  // Bloom filter over the dim keys (BUILDING-segment customers), probe
  // it as a codegen'd scan filter on the fact table (orders) BEFORE any
  // join, then verify against the exact semi-join. The hash family is
  // seed-free affine-mod-P (HashKernels.bloomPos), so the oracle
  // replays every bit position: n_pass counts matches PLUS the
  // deterministic false positives, n_true the exact matches — the gap
  // IS the (1-e^(-kn/m))^k rate made visible and hash-checked.
  private val BloomBits = 4096
  private val BloomK = 3

  private def bloomSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k")).distinct()
    val bloom = graft.api.Sketches.bloomFilter(dim, "k", BloomBits, BloomK)
    val passed = graft.api.Sketches.bloomProbe(
      Tables.orders(s, dir), "o_custkey", bloom, BloomK)
    passed.join(broadcast(dim), passed("o_custkey") === dim("k"), "left_outer")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_pass"), count(col("k")).as("n_true"))
  }

  private val bloomSemiJoinSql: String = {
    import graft.functions.PolyHashConstants.{P, SimA, SimB}
    // HashKernels.bloomPos verbatim: affine then quadratic scramble
    def pos(i: Int, key: String) = {
      val h = s"((($key % $P) * ${SimA(i)} + ${SimB(i)}) % $P)"
      s"($h * $h + 2531011) % $P % $BloomBits"
    }
    val bits = (0 until BloomK)
      .map(i => s"  SELECT DISTINCT ${pos(i, "k")} AS pos FROM dim")
      .mkString("\n  UNION\n")
    val probe = (0 until BloomK)
      .map(i => s"${pos(i, "o_custkey")} IN (SELECT pos FROM bits)")
      .mkString("\n    AND ")
    s"""WITH dim AS (
       |  SELECT DISTINCT c_custkey AS k FROM customer
       |  WHERE c_mktsegment = 'BUILDING'),
       |bits AS (
       |$bits),
       |passed AS (
       |  SELECT o_orderstatus, o_custkey FROM orders
       |  WHERE $probe)
       |SELECT o_orderstatus, COUNT(*) AS n_pass,
       |  COUNT(CASE WHEN o_custkey IN (SELECT k FROM dim) THEN 1 END) AS n_true
       |FROM passed GROUP BY o_orderstatus""".stripMargin
  }

  // -- qs5: histogram-sketch quantiles ----------------------------------
  // q26's exact percentile() buffers every value per group; this is the
  // constant-memory sketch form (see Sketches.histQuantile). Same
  // grouping and value column as q26 so the two are directly
  // comparable; QualitySpec pins |sketch − exact| ≤ one bin width.
  private val HistQs = Seq(0.5, 0.9)

  private def histQuantileQ(s: SparkSession, dir: String): DataFrame =
    graft.api.Sketches.histQuantile(
      Tables.lineitem(s, dir), "l_returnflag", "l_extendedprice", HistQs)

  private val histQuantileSql = graft.api.Sketches.histQuantileSql(
    "lineitem", "l_returnflag", "l_extendedprice", HistQs)

  val all: Seq[QueryDef] = Seq(
    QueryDef("a1_typed_agg", typedAgg, Some(typedAggSql)),
    QueryDef("qs1_hll_distinct", hllDistinct, Some(hllDistinctSql)),
    QueryDef("qs2_cms_topk", cmsTopK, Some(cmsTopKSql)),
    QueryDef("qs3_bloom_semijoin", bloomSemiJoin, Some(bloomSemiJoinSql), bench = true),
    QueryDef("qs4_hll_per_key", hllPerKey, Some(hllPerKeySql), bench = true),
    QueryDef("qs5_hist_quantile", histQuantileQ, Some(histQuantileSql), bench = true),
    QueryDef("q30_topk_agg", topKAgg, Some(topKAggSql), bench = true),
  )
}
