package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  // geometry shared with tools/IvfTune so the recall evidence can
  // never drift from the shipped configuration
  private[graft] val K = 5          // neighbors per query
  private[graft] val NQueries = 10  // vec_id < 10 are the probe vectors
  private[graft] val NCells = 16    // IVF cells (seeded by vec_id < 16)
  // IVF cells probed per query: the measured knee (tools/IvfTune @
  // sf0.01 vs the s1 exact baseline — recall@5 0.90 at nProbe=1, 0.92
  // from 2 through 6, 0.94 only at 8 = probing half the cells;
  // wall-clock flat across the sweep). 2 buys the recall plateau at
  // 1/8 of the cells; past it the extra candidates are pure cost.
  private val NProbe = 2

  // -- s1: brute-force cosine top-k ------------------------------------
  private def bruteTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    graft.api.Similarity.cosineTopK(
      e, e.filter(col("vec_id") < NQueries), "vec_id", "embedding", K)
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
    import graft.functions.SimConstants.{NPlanes, NTables}
    val e = Tables.embeddings(s, dir)
    graft.api.Similarity.lshTopK(
      e, e.filter(col("vec_id") < NQueries), "vec_id", "embedding", K,
      NTables, NPlanes)
  }

  // -- s3: IVF ANN ------------------------------------------------------
  // deterministic "training": seed centroids are the first NCells vectors
  private def ivfTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    graft.api.Similarity.ivfTopK(
      e, e.filter(col("vec_id") < NQueries), e.filter(col("vec_id") < NCells),
      "vec_id", "embedding", K, NProbe)
  }

  // -- s4: IVF ANN over a k-means-TRAINED codebook ----------------------
  // The production IVF shape (train a codebook, assign corpus cells
  // once, probe at query time): centroids come from
  // Similarity.kmeansCentroids (deterministic in-plan Lloyd, seeds =
  // first NCells vectors, TrainIters rounds) instead of the raw seed
  // vectors s3 uses. What training buys is cell BALANCE — the max-cell
  // probe cost bound that matters at corpus scale (measured at sf0.1:
  // max/mean 1.18 raw seeds → 1.11 trained) — and robustness to
  // non-representative leading rows (sorted/clustered ingest makes raw
  // seeds pathological; trained centroids track the distribution). On
  // THIS fixture the first 16 vectors are already representative, so
  // s3's recall is a shade higher (0.92-0.98 vs 0.84-0.96 across SFs)
  // — recall here prices the balance, it isn't bought by training.
  private val TrainIters = 2

  private def ivfTrained(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val cents = graft.api.Similarity.kmeansCentroids(
      e, e.filter(col("vec_id") < NCells), "vec_id", "embedding", TrainIters)
    graft.api.Similarity.ivfTopK(
      e, e.filter(col("vec_id") < NQueries),
      cents.select(col("cent_id").as("vec_id"), col("c_emb").as("embedding")),
      "vec_id", "embedding", K, NProbe)
  }

  // -- oracles for the ANN paths ---------------------------------------
  // All pure deterministic arithmetic (hyperplanes are integer
  // congruences, IVF/k-means is cosine + row_number + fixed-point
  // integer means), so DuckDB reproduces them bit-for-bit.

  /** IVF probe/re-rank CTE tail over centroid CTE `centsCte` (requires
    * CTE `c(vec_id, embedding, nrm)`). */
  private def ivfSqlTail(centsCte: String): String = {
    val finalCos =
      s"(${VectorFunctions.dotSql("q.q_emb", "p.embedding")} / (q.q_nrm * p.nrm))"
    s"""${VectorFunctions.kmeansCellCte("corpus_cells", centsCte, 1)},
       |${VectorFunctions.kmeansCellCte("qc_raw", centsCte, NProbe,
            s" WHERE x.vec_id < $NQueries")},
       |query_cells AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, cent_id
       |  FROM qc_raw),
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

  private val normCte =
    s"""c AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${VectorFunctions.dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings)""".stripMargin

  private val ivfTopKSql =
    s"""WITH $normCte,
       |cents AS (
       |  SELECT vec_id AS cent_id, embedding AS c_emb, nrm AS c_nrm
       |  FROM c WHERE vec_id < $NCells),
       |${ivfSqlTail("cents")}""".stripMargin

  private val ivfTrainedSql =
    s"""WITH $normCte,
       |${VectorFunctions.kmeansCtes(NCells, TrainIters,
            graft.api.Similarity.KMeansQuantScale)},
       |${ivfSqlTail(s"cents${TrainIters}n")}""".stripMargin

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
    QueryDef("s4_ann_ivf_trained", ivfTrained, Some(ivfTrainedSql), bench = true),
  )
}
