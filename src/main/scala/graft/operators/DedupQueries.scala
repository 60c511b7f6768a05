package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{HashFunctions, TextFunctions, VectorFunctions}

/** Deduplication suite for training-data pipelines (north-star extension;
  * SURVEY.md §7.2 step 6): exact, n-gram Jaccard, MinHash+LSH, SimHash,
  * and embedding-cosine near-dup.
  *
  * Scale design: every variant avoids the O(n²) all-pairs join —
  * exact dedup is a hash groupBy; Jaccard blocks on (lang, length
  * bucket); MinHash/SimHash reduce candidate generation to an equi-join
  * on band/bucket keys, which Spark executes as an ordinary shuffled
  * hash join. At 100 TB the all-pairs form is impossible; the banded
  * forms shuffle only O(n·bands) rows.
  */
object DedupQueries {

  // -- dd1: exact dedup — groupBy content fingerprint -------------------
  private def exact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(TextFunctions.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  private val exactSql =
    """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
      |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  // -- dd2: exact n-gram Jaccard with blocking --------------------------
  // Blocking key = (lang, n_chars DIV 100): near-identical docs share it
  // with high probability; candidate pairs per block are quadratic only
  // in block size, never in corpus size.
  /** Shingle sets represented as sorted distinct 64-bit hashes: hashing
    * happens once per document, every pairwise comparison is then a
    * primitive O(n+m) merge (SortedLongIntersectCount) instead of a
    * per-element string-set intersection. The DuckDB oracle intersects
    * the string sets directly — identical cardinalities (64-bit
    * collisions are ~1e-10 at oracle scale). */
  private def shingled(s: SparkSession, dir: String): DataFrame = {
    HashFunctions.register(s)
    Tables.documents(s, dir).select(
      col("doc_id"), col("lang"),
      expr("n_chars DIV 100").as("lb"),
      HashFunctions.shingleHashes(col("text")).as("hs"))
      .withColumn("nh", size(col("hs")))
      // materialization barrier: both sides of the pair join (and the
      // null-filter the planner infers from the join keys) read the
      // computed hs column instead of re-deriving it from text — the
      // optimizer would otherwise clone the shingle expression into
      // every consumer. At cluster scale this is a persist-to-disk of
      // the shingled projection, standard for multi-use intermediates.
      .localCheckpoint(false)
  }

  /** Overlapped blocking with home/guest roles: each document sits in
    * its own bucket as "home" and the next bucket as "guest". Any pair
    * whose lengths differ by < 100 chars then meets exactly once —
    * same-bucket pairs as home/home, adjacent-bucket pairs as
    * guest/home — and guest/guest meetings are skipped, so no
    * boundary-straddling misses, no duplicate comparisons, no DISTINCT. */
  private def overlapBlocked(s: SparkSession, dir: String): DataFrame = {
    val s0 = shingled(s, dir)
    s0.withColumn("lbx", col("lb")).withColumn("guest", lit(0))
      .unionByName(
        s0.withColumn("lbx", col("lb") + 1).withColumn("guest", lit(1)))
  }

  private def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    // one blocked projection, aliased twice: both join sides share the
    // same checkpointed materialization
    val ob = overlapBlocked(s, dir)
    val a = ob.alias("a")
    val b = ob.alias("b")
    val inter = HashFunctions.sortedIntersectCount(col("a.hs"), col("b.hs"))
    val jac = inter.cast("double") / (col("a.nh") + col("b.nh") - inter)
    a.join(b,
        col("a.lang") === col("b.lang") && col("a.lbx") === col("b.lbx") &&
          col("a.doc_id") < col("b.doc_id") &&
          !(col("a.guest") === 1 && col("b.guest") === 1))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        jac.as("jac"))
      .filter(col("jac") >= 0.5)
  }

  private val ngramJaccardSql =
    s"""WITH sh0 AS (
       |  SELECT doc_id, lang, n_chars // 100 AS lb,
       |    ${TextFunctions.shingles3Sql} AS sh
       |  FROM (SELECT doc_id, lang, n_chars,
       |          string_split_regex(trim(text), '\\s+') AS toks
       |        FROM documents) t),
       |sh AS (
       |  SELECT doc_id, lang, lb AS lbx, 0 AS guest, sh FROM sh0
       |  UNION ALL
       |  SELECT doc_id, lang, lb + 1 AS lbx, 1 AS guest, sh FROM sh0)
       |SELECT doc_a, doc_b, jac FROM (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jac
       |  FROM sh a JOIN sh b
       |    ON a.lang = b.lang AND a.lbx = b.lbx AND a.doc_id < b.doc_id
       |   AND NOT (a.guest = 1 AND b.guest = 1)) p
       |WHERE jac >= 0.5""".stripMargin

  // -- dd3: MinHash + LSH banding ---------------------------------------
  // 32 minhashes over xxhash64'd shingles, 8 bands × 4 rows; candidates
  // from band-bucket equi-joins, then exact-Jaccard verification at 0.8.
  // (xxhash64 is Spark-internal → no SQL oracle; recall vs dd2 is
  // asserted in DedupSpec instead.)
  private val Bands = 8
  private val RowsPerBand = graft.functions.MinHashConstants.K / Bands

  private def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val docs = shingled(s, dir).filter(col("nh") > 0)
      .select(col("doc_id"), col("hs"), col("nh"),
        HashFunctions.minhashSig(col("hs")).as("sig"))
    // explode into (band, bandKey) — hash of the band's slice of the sig
    val banded = docs.select(
      col("doc_id"), col("hs"), col("nh"),
      posexplode(transform(sequence(lit(0), lit(Bands - 1)), b =>
        xxhash64(slice(col("sig"), b * lit(RowsPerBand) + lit(1), lit(RowsPerBand))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    val a = banded.alias("a")
    val b = banded.alias("b")
    val inter = HashFunctions.sortedIntersectCount(col("a.hs"), col("b.hs"))
    val jac = inter.cast("double") / (col("a.nh") + col("b.nh") - inter)
    a.join(b,
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        jac.as("jac"))
      .distinct() // same pair can collide in several bands
      .filter(col("jac") >= 0.8)
  }

  // -- dd4: SimHash (64-bit) + Hamming-distance pairs -------------------
  // Per token: xxhash64 → ±1 vote per bit; signature bit = sign of vote
  // sum. Near-dups = pairs with popcount(xor) <= 3. Candidate
  // generation splits the signature into 4 exact 16-bit pieces: by
  // pigeonhole, hamming <= 3 implies at least one identical piece, so
  // an equi-join on (piece_idx, piece_value) finds ALL qualifying
  // pairs — complete, and O(n·4) shuffled rows at any corpus size.
  private def simhash(s: SparkSession, dir: String): DataFrame = {
    HashFunctions.register(s)
    val docs = Tables.documents(s, dir)
      .select(
        col("doc_id"),
        transform(array_distinct(split(trim(col("text")), "\\s+")),
          t => xxhash64(t)).as("hs"))
      .select(col("doc_id"), HashFunctions.simhash64(col("hs")).as("sig"))
    val pieces = docs.select(
        col("doc_id"), col("sig"),
        posexplode(array((0 until 4).map(i =>
          shiftright(col("sig"), 16 * i).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "piece").withColumnRenamed("col", "pval")
    val a = pieces.alias("a")
    val b = pieces.alias("b")
    val hamming = bit_count(col("a.sig").bitwiseXOR(col("b.sig")))
    a.join(b,
        col("a.piece") === col("b.piece") && col("a.pval") === col("b.pval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming.as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct() // a pair may agree on several pieces
  }

  // -- dd5: embedding-cosine near-dup -----------------------------------
  // Candidates from hyperplane-LSH band buckets (the s2 machinery with a
  // dedup-tuned geometry), exact-cosine verification inside buckets via
  // the native FloatVecDot expression. The join is an equi-join on
  // (tbl, sig) — O(n·tables) shuffled rows, never an all-pairs
  // BroadcastNestedLoopJoin. Selectivity knob: planes ~ log(corpus) keeps
  // expected bucket size bounded as n grows; 6 planes × 8 tables is the
  // fixture's point (recall ≥ 0.98 for true near-dups at cos ≥ 0.9; the
  // fixture's max pair cos is 0.51, so the 0.4 threshold deliberately
  // probes the low-similarity regime where one-shot LSH recall is ~0.5 —
  // more tables or multi-probe buys recall linearly at that end).
  private val DupTables = 8
  private val DupPlanes = 6

  private def embedDup(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, dir).select(
      col("vec_id"), col("embedding"),
      VectorFunctions.norm(col("embedding")).as("nrm"))
    val tagged = e.select(
        col("vec_id"), col("embedding"), col("nrm"),
        posexplode(VectorFunctions.lshSignatures(
          col("embedding"), DupTables, DupPlanes)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "sig")
    val a = tagged.alias("a")
    val b = tagged.alias("b")
    val cos = VectorFunctions.cosinePre(
      VectorFunctions.dot(col("a.embedding"), col("b.embedding")),
      col("a.nrm"), col("b.nrm"))
    a.join(b,
        col("a.tbl") === col("b.tbl") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cos.as("cos"))
      .filter(col("cos") >= 0.4)
      .distinct() // a pair may share buckets in several tables
  }

  private val embedDupSql = {
    val cos = s"(${VectorFunctions.dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm))"
    s"""WITH c AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${VectorFunctions.dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |sigs AS (
       |${VectorFunctions.lshSigsSql(DupTables, DupPlanes)})
       |SELECT DISTINCT vec_a, vec_b, cos FROM (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $cos AS cos
       |  FROM sigs a JOIN sigs b
       |    ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id) p
       |WHERE cos >= 0.4""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("dd1_exact_dedup", exact, Some(exactSql), bench = true),
    QueryDef("dd2_ngram_jaccard", ngramJaccard, Some(ngramJaccardSql), bench = true),
    QueryDef("dd3_minhash_lsh", minhashLsh, None, bench = true),
    QueryDef("dd4_simhash", simhash, None),
    QueryDef("dd5_embed_dup", embedDup, Some(embedDupSql)),
  )
}
