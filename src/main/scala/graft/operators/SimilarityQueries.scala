package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (north-star extension).
  *
  *  - s1: brute-force cosine top-k — the correctness baseline. The
  *    (small) query set is broadcast against the corpus, so the corpus
  *    side streams with no shuffle; the only exchange is the final
  *    per-query top-k.
  *  - s2: random-hyperplane LSH — signatures from a native expression
  *    (deterministic integer-congruential hyperplanes), candidates from
  *    a bucket equi-join, exact re-rank inside the bucket. Candidate
  *    generation is O(n·tables) shuffled rows instead of O(n·queries)
  *    dot products — the scale path.
  *  - s3: IVF (inverted-file) — corpus partitioned into cells around
  *    deterministic seed centroids, queries probe the nearest 2 cells.
  *    No driver-side training loop: assignment is a broadcast join +
  *    window top-1, fully distributed.
  */
object SimilarityQueries {

  private val K = 5          // neighbors per query
  private val NQueries = 10  // vec_id < 10 are the probe vectors
  private val NCells = 16    // IVF cells (seeded by vec_id < 16)
  private val NProbe = 2     // IVF cells probed per query

  private def corpus(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    Tables.embeddings(s, dir).select(
      col("vec_id"), col("embedding"),
      VectorFunctions.norm(col("embedding")).as("nrm"))
  }

  // -- s1: brute-force cosine top-k ------------------------------------
  private def bruteTopK(s: SparkSession, dir: String): DataFrame = {
    val c = corpus(s, dir)
    val q = c.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val cos = VectorFunctions.cosinePre(
      VectorFunctions.dot(col("q_emb"), col("embedding")),
      col("q_nrm"), col("nrm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    c.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
  }

  private val bruteTopKSql = {
    val cos = VectorFunctions.cosineSql("q.embedding", "c.embedding")
    s"""SELECT q_id, n_id, cos, rank FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id, $cos AS cos,
       |    CAST(row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY $cos DESC, c.vec_id) AS INTEGER) AS rank
       |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id < $NQueries) t
       |WHERE rank <= $K""".stripMargin
  }

  // -- s2: LSH-bucketed ANN --------------------------------------------
  private def lshTopK(s: SparkSession, dir: String): DataFrame = {
    val c = corpus(s, dir)
    // each vector lands in NTables buckets: (table, signature)
    val tagged = c.select(
        col("vec_id"), col("embedding"), col("nrm"),
        posexplode(VectorFunctions.lshSignatures(col("embedding"))))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "sig")
    val q = tagged.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("tbl").as("q_tbl"), col("sig").as("q_sig"))
    val cos = VectorFunctions.cosinePre(
      VectorFunctions.dot(col("q_emb"), col("embedding")),
      col("q_nrm"), col("nrm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    tagged.join(broadcast(q),
        col("q_tbl") === col("tbl") && col("q_sig") === col("sig") &&
          col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), cos.as("cos"))
      .distinct() // a pair may share buckets in several tables
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
  }

  // -- s3: IVF ANN ------------------------------------------------------
  /** Assign each row of `df` to its `n` highest-cosine centroids. */
  private def assignCells(df: DataFrame, cents: DataFrame, n: Int): DataFrame = {
    val cos = VectorFunctions.cosinePre(
      VectorFunctions.dot(col("c_emb"), col("embedding")),
      col("c_nrm"), col("nrm"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cell_cos").desc, col("cent_id"))
    df.join(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("cent_id"), cos.as("cell_cos"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= n)
      .drop("r", "cell_cos")
  }

  private def ivfTopK(s: SparkSession, dir: String): DataFrame = {
    val c = corpus(s, dir)
    // deterministic "training": seed centroids are the first NCells vectors
    val cents = c.filter(col("vec_id") < NCells)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))
    val corpusCells = assignCells(c, cents, 1)
    val queryCells = assignCells(c.filter(col("vec_id") < NQueries), cents, NProbe)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cent_id"))
    val cos = VectorFunctions.cosinePre(
      VectorFunctions.dot(col("q_emb"), col("embedding")),
      col("q_nrm"), col("nrm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    corpusCells.join(broadcast(queryCells),
        queryCells("cent_id") === corpusCells("cent_id") &&
          col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), cos.as("cos"))
      .distinct() // NProbe cells may repeat a candidate
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
  }

  // -- oracles for the ANN paths ---------------------------------------
  // Both are pure deterministic arithmetic (hyperplanes are integer
  // congruences, IVF is cosine + row_number), so DuckDB reproduces them
  // bit-for-bit.

  private val ivfTopKSql = {
    val assignCos =
      s"(${VectorFunctions.dotSql("ct.c_emb", "x.embedding")} / (ct.c_nrm * x.nrm))"
    val finalCos =
      s"(${VectorFunctions.dotSql("q.q_emb", "p.embedding")} / (q.q_nrm * p.nrm))"
    s"""WITH c AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${VectorFunctions.dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |cents AS (
       |  SELECT vec_id AS cent_id, embedding AS c_emb, nrm AS c_nrm
       |  FROM c WHERE vec_id < $NCells),
       |corpus_cells AS (
       |  SELECT vec_id, embedding, nrm, cent_id FROM (
       |    SELECT x.vec_id, x.embedding, x.nrm, ct.cent_id,
       |      row_number() OVER (PARTITION BY x.vec_id
       |        ORDER BY $assignCos DESC, ct.cent_id) AS r
       |    FROM c x CROSS JOIN cents ct) t WHERE r <= 1),
       |query_cells AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, cent_id FROM (
       |    SELECT x.vec_id, x.embedding, x.nrm, ct.cent_id,
       |      row_number() OVER (PARTITION BY x.vec_id
       |        ORDER BY $assignCos DESC, ct.cent_id) AS r
       |    FROM c x CROSS JOIN cents ct WHERE x.vec_id < $NQueries) t
       |  WHERE r <= $NProbe),
       |cand AS (
       |  SELECT DISTINCT q.q_id, p.vec_id AS n_id, $finalCos AS cos
       |  FROM query_cells q JOIN corpus_cells p
       |    ON q.cent_id = p.cent_id AND q.q_id <> p.vec_id)
       |SELECT q_id, n_id, cos, rank FROM (
       |  SELECT q_id, n_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos DESC, n_id) AS INTEGER) AS rank
       |  FROM cand) t
       |WHERE rank <= $K""".stripMargin
  }

  private val lshTopKSql = {
    import graft.functions.SimConstants.{NPlanes, NTables}
    val sigBranches = VectorFunctions.lshSigsSql(NTables, NPlanes)
    val cos = s"(${VectorFunctions.dotSql("q.embedding", "p.embedding")} / (q.nrm * p.nrm))"
    s"""WITH c AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${VectorFunctions.dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |sigs AS (
       |$sigBranches),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS q_id, p.vec_id AS n_id, $cos AS cos
       |  FROM sigs q JOIN sigs p
       |    ON q.tbl = p.tbl AND q.sig = p.sig AND q.vec_id <> p.vec_id
       |  WHERE q.vec_id < $NQueries)
       |SELECT q_id, n_id, cos, rank FROM (
       |  SELECT q_id, n_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY cos DESC, n_id) AS INTEGER) AS rank
       |  FROM cand) t
       |WHERE rank <= $K""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("s1_cosine_topk", bruteTopK, Some(bruteTopKSql), bench = true),
    QueryDef("s2_ann_lsh", lshTopK, Some(lshTopKSql), bench = true),
    QueryDef("s3_ann_ivf", ivfTopK, Some(ivfTopKSql), bench = true),
  )
}
