package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operators derived from the reference's bundled examples
  * (SURVEY.md §2.2, D1–D13) plus the "freebies" the reference explicitly
  * lacks (§2.3: sort/top-k, distinct, set ops, window functions, rollup,
  * semi/anti/broadcast joins).
  *
  * Reference semantics citations are per-query below; the Spark plans are
  * declarative so Catalyst pushes filters/projections into the parquet
  * scans and picks broadcast-hash joins for the small dimension sides —
  * the two properties that matter most at 100 TB.
  */
object RelationalQueries {

  /** Exact sum of a 2-decimal-valued DOUBLE column: cast to DECIMAL(18,2)
    * (exact, order-insensitive sum in both Spark and DuckDB) then back to
    * DOUBLE for a stable schema. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Bit-deterministic average: exact decimal sum cast to double, divided
    * by the exact count — same IEEE division in both engines. */
  private def davg(c: Column): Column = dsum(c) / count(lit(1))

  // ---------------------------------------------------------------------
  // D3: projection + predicate filter ("scan query", amplab1.go:11-27)
  // ---------------------------------------------------------------------
  private def scanFilter(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  private val scanFilterSql =
    """SELECT l_orderkey, l_linenumber, l_quantity
      |FROM lineitem WHERE l_quantity > 45""".stripMargin

  // ---------------------------------------------------------------------
  // D4 + D5: substring group key + SUM with cast (amplab2.go:22-43)
  // ---------------------------------------------------------------------
  private def substrSum(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .groupBy(substring(col("p_name"), 1, 4).as("name_prefix"))
      .agg(dsum(col("p_retailprice")).as("sum_price"))

  private val substrSumSql =
    """SELECT substring(p_name, 1, 4) AS name_prefix,
      |       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM part GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // D2/D5/D8-class headline aggregation (flagship; TPC-H Q1-shaped)
  // ---------------------------------------------------------------------
  private def pricingSummary(s: SparkSession, dir: String): DataFrame =
    // r20: the fixture scan is one task, so the decimal partial
    // aggregate over the full table ran serial (~0.8 s of the row's
    // ~1.1 s); widen moves slim rows once and aggregates scan-wide
    // (Scan.widen — no-op at production scan widths)
    graft.api.Scan.widen(Tables.lineitem(s, dir), col("l_orderkey"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))).cast("double").as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))

  private val pricingSummarySql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // D6: date parse + range predicate (amplab3.go:16-18,57-63)
  // ---------------------------------------------------------------------
  private def dateFilter(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        col("o_totalprice"))

  private val dateFilterSql =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_totalprice
      |FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'""".stripMargin

  // ---------------------------------------------------------------------
  // D7: inner equi-join with date filter (amplab3 stage 1, amplab3.go:37-97)
  // Shuffle-on-key join in corral; here Catalyst picks the strategy.
  // ---------------------------------------------------------------------
  private def innerJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
    val l = Tables.lineitem(s, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
  }

  private val innerJoinSql =
    """SELECT o_orderkey, o_custkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'""".stripMargin

  // ---------------------------------------------------------------------
  // D8 (+D9 composed): join → multi-AVG aggregation (amplab3.go:103-120)
  // ---------------------------------------------------------------------
  private def joinAgg(s: SparkSession, dir: String): DataFrame =
    innerJoin(s, dir)
      .groupBy(col("o_custkey"))
      .agg(
        dsum(col("l_extendedprice")).as("sum_rev"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("n_lines"))

  private val joinAggSql =
    """SELECT o_custkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_rev,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY o_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // D9: explicit two-stage pipeline (driver.go:195-216) — stage outputs
  // compose lazily; Catalyst fuses them into one physical plan (no
  // materialization barrier, unlike corral's per-stage TSV round-trip).
  // ---------------------------------------------------------------------
  private def twoStage(s: SparkSession, dir: String): DataFrame = {
    val stages: Seq[DataFrame => DataFrame] = Seq(
      df => df, // stage 1 output = the join (identity re-key, amplab3.go:99-101)
      df => df.groupBy(col("o_custkey"))
        .agg(davg(col("l_extendedprice")).as("avg_rev"),
          davg(col("l_quantity")).as("avg_qty")))
    stages.foldLeft(innerJoin(s, dir))((acc, stage) => stage(acc))
  }

  private val twoStageSql =
    """SELECT o_custkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_rev,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY o_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // D10: prefix filter (driver_test.go:47-63)
  // ---------------------------------------------------------------------
  private def prefixFilter(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(col("p_name").startsWith("s"))
      .select(col("p_partkey"), col("p_name"))

  private val prefixFilterSql =
    "SELECT p_partkey, p_name FROM part WHERE p_name LIKE 's%'"

  // ---------------------------------------------------------------------
  // D11: identity map/reduce (amplab1.go:29-33) — pass-through scan.
  // ---------------------------------------------------------------------
  private def identity(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir).select(col("r_regionkey"), col("r_name"))

  private val identitySql = "SELECT r_regionkey, r_name FROM region"

  // ---------------------------------------------------------------------
  // D12: parse-with-skip-on-error (amplab1.go:23-26 Atoi; null on failure)
  // ---------------------------------------------------------------------
  private def tryParse(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        expr("try_cast(replace(source, 'src', '') AS INT)").as("src_num"))

  private val tryParseSql =
    """SELECT doc_id, TRY_CAST(replace(source, 'src', '') AS INTEGER) AS src_num
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------------
  // D13: JSON decode of record-in-value (amplab3.go:70-73,80-82)
  // ---------------------------------------------------------------------
  private def jsonDecode(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))

  private val jsonDecodeSql =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |FROM events""".stripMargin

  /** D13's encode direction: struct → compact JSON value string (the
    * reference JSON-marshals records into the value, amplab3.go:70-73). */
  private def jsonEncode(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .select(col("event_id"), to_json(struct(col("k"))).as("rec"))

  private val jsonEncodeSql =
    """SELECT event_id,
      |  CAST(json_object('k',
      |    CAST(json_extract_string(props, '$.k') AS INTEGER)) AS VARCHAR) AS rec
      |FROM events""".stripMargin

  // ---------------------------------------------------------------------
  // Freebies (§2.3 — absent from the reference, native in Spark)
  // ---------------------------------------------------------------------
  private def topK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .limit(10)

  private val topKSql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  private def distinctQ(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_mktsegment")).distinct()

  private val distinctSql = "SELECT DISTINCT c_mktsegment FROM customer"

  private def setOps(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
    val sup = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
    c.intersect(sup)
  }

  private val setOpsSql =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin

  private def unionExcept(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
    val sup = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
    val r0 = Tables.nation(s, dir).filter(col("n_regionkey") === 0)
      .select(col("n_nationkey").as("nationkey"))
    c.union(sup).distinct().except(r0)
  }

  private val unionExceptSql =
    """SELECT c_nationkey AS nationkey FROM customer
      |UNION
      |SELECT s_nationkey AS nationkey FROM supplier
      |EXCEPT
      |SELECT n_nationkey AS nationkey FROM nation WHERE n_regionkey = 0""".stripMargin

  private def windowTopN(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
  }

  private val windowTopNSql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      |  FROM orders) t WHERE rn <= 3""".stripMargin

  private def cubeQ(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))

  private val cubeSql =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  private def rollupQ(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"))

  private val rollupSql =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  private def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    Tables.customer(s, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  private val semiJoinSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** Customers with no high-value order — anti join against a filtered
    * build side (filter applied before the join, so the build hash table
    * stays small at scale). */
  private def antiJoin(s: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
    Tables.customer(s, dir)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  private val antiJoinSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin

  /** Star join with explicit broadcast of both small dimensions — at
    * 100 TB the fact side streams map-side with zero shuffle for the
    * dimension joins; only the final groupBy exchanges. */
  private def broadcastStar(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))

  private val broadcastStarSql =
    """SELECT r_name, COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  /** Tumbling event-time window aggregation over `events` (batch form;
    * streaming twin lives in graft.streaming). */
  private def eventWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))

  // window start emitted as a string: timestamp columns round-trip with
  // engine-dependent tz-awareness, strings don't
  private val eventWindowSql =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS wstart,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Distinct aggregation (two-phase partial-distinct plan in Spark);
    * the approximate HLL twin is asserted within 5% in RegistrySpec —
    * its sketch isn't oracle-comparable across engines. */
  private def countDistinct_(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count_distinct(col("l_partkey")).as("nd_parts"),
        count(lit(1)).as("n"))

  private val countDistinctSql =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_parts, COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** rank / dense_rank / lag in one pass over a single window spec. */
  private def windowFns(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        lag(col("c_custkey"), 1).over(w).as("prev_cust"))
      .filter(col("rnk") <= 5)
  }

  private val windowFnsSql =
    """SELECT c_mktsegment, c_custkey, c_acctbal, rnk, drnk, prev_cust FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    CAST(rank() OVER w AS INTEGER) AS rnk,
      |    CAST(dense_rank() OVER w AS INTEGER) AS drnk,
      |    lag(c_custkey, 1) OVER w AS prev_cust
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_mktsegment
      |               ORDER BY c_acctbal DESC, c_custkey)) t
      |WHERE rnk <= 5""".stripMargin

  /** Exact percentiles (sort-based): Spark's `percentile` and DuckDB's
    * `quantile_cont` share the R-7 linear-interpolation definition and
    * produce bit-identical doubles on the same inputs. */
  private def percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("med_price"),
        expr("percentile(l_extendedprice, 0.9)").as("p90_price"),
        expr("percentile(l_quantity, 0.25)").as("q1_qty"))

  private val percentilesSql =
    """SELECT l_returnflag,
      |  quantile_cont(l_extendedprice, 0.5) AS med_price,
      |  quantile_cont(l_extendedprice, 0.9) AS p90_price,
      |  quantile_cont(l_quantity, 0.25) AS q1_qty
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q1_pricing_summary", pricingSummary, Some(pricingSummarySql), bench = true),
    QueryDef("q3_scan_filter", scanFilter, Some(scanFilterSql), bench = true),
    QueryDef("q4_substr_sum", substrSum, Some(substrSumSql)),
    QueryDef("q5_date_filter", dateFilter, Some(dateFilterSql)),
    QueryDef("q6_join", innerJoin, Some(innerJoinSql), bench = true),
    QueryDef("q7_join_agg", joinAgg, Some(joinAggSql), bench = true),
    QueryDef("q8_two_stage", twoStage, Some(twoStageSql)),
    QueryDef("q9_prefix_filter", prefixFilter, Some(prefixFilterSql)),
    QueryDef("q10_identity", identity, Some(identitySql)),
    QueryDef("q11_try_parse", tryParse, Some(tryParseSql)),
    QueryDef("q12_json_decode", jsonDecode, Some(jsonDecodeSql)),
    QueryDef("q27_json_encode", jsonEncode, Some(jsonEncodeSql)),
    QueryDef("q13_topk", topK, Some(topKSql)),
    QueryDef("q14_distinct", distinctQ, Some(distinctSql)),
    QueryDef("q15_setops", setOps, Some(setOpsSql)),
    QueryDef("q23_union_except", unionExcept, Some(unionExceptSql)),
    QueryDef("q16_window_topn", windowTopN, Some(windowTopNSql), bench = true),
    QueryDef("q17_rollup", rollupQ, Some(rollupSql)),
    QueryDef("q22_cube", cubeQ, Some(cubeSql)),
    QueryDef("q24_count_distinct", countDistinct_, Some(countDistinctSql)),
    QueryDef("q25_window_fns", windowFns, Some(windowFnsSql)),
    QueryDef("q26_percentiles", percentiles, Some(percentilesSql)),
    QueryDef("q18_semijoin", semiJoin, Some(semiJoinSql)),
    QueryDef("q19_antijoin", antiJoin, Some(antiJoinSql)),
    QueryDef("q20_broadcast_star", broadcastStar, Some(broadcastStarSql), bench = true),
    QueryDef("q21_event_window", eventWindow, Some(eventWindowSql), bench = true),
  )
}
