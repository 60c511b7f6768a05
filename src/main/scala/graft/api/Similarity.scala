package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Library-facing similarity search: corpus/query DataFrames in, ranked
  * neighbor rows out. The oracled fixture queries
  * ([[graft.operators.SimilarityQueries]]) are thin bindings of these.
  * Inputs: `idCol` (long), `vecCol` (array<float>). Output columns:
  * (q_id, n_id, cos, rank). */
object Similarity {

  private def normed(df: DataFrame, idCol: String, vecCol: String) = {
    VectorFunctions.register(df.sparkSession)
    df.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"),
      VectorFunctions.norm(col(vecCol)).as("nrm"))
  }

  private val rankWindow =
    Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))

  /** Exact top-k: broadcast the (small) query side against the corpus —
    * the corpus streams with no shuffle; the only exchange is the final
    * per-query top-k. O(corpus × queries) dot products: the correctness
    * baseline and the right tool when queries are few. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = normed(corpus, idCol, vecCol)
    val q = normed(queries, idCol, vecCol)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val cos = VectorFunctions.cosinePre(
      VectorFunctions.dot(col("q_emb"), col("embedding")),
      col("q_nrm"), col("nrm"))
    c.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(rankWindow))
      .filter(col("rank") <= k)
  }

  /** ANN via hyperplane-LSH buckets: candidates from a (tbl, sig)
    * equi-join, exact re-rank inside buckets. O(n·tables) candidate
    * rows — the scale path; planes ~ log(n). */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      tables: Int, planes: Int): DataFrame = {
    def tagged(df: DataFrame) = normed(df, idCol, vecCol).select(
        col("vec_id"), col("embedding"), col("nrm"),
        posexplode(VectorFunctions.lshSignatures(col("embedding"), tables, planes)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "sig")
    val c = tagged(corpus)
    val q = tagged(queries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("tbl").as("q_tbl"), col("sig").as("q_sig"))
    val cos = VectorFunctions.cosinePre(
      VectorFunctions.dot(col("q_emb"), col("embedding")),
      col("q_nrm"), col("nrm"))
    c.join(broadcast(q),
        col("q_tbl") === col("tbl") && col("q_sig") === col("sig") &&
          col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), cos.as("cos"))
      .distinct() // a pair may share buckets in several tables
      .withColumn("rank", row_number().over(rankWindow))
      .filter(col("rank") <= k)
  }

  /** Fixed-point scale for the k-means centroid mean: coordinates are
    * quantized to `floor(x * 2^20)` BIGINTs before summation so the
    * per-cluster mean is an exact integer aggregate (order-free) instead
    * of a float sum whose value depends on reduction order. The 2^-20
    * quantization error is ~1e-6 per coordinate — far below any
    * clustering-relevant signal — and buys bit-identical centroids on
    * any engine/partitioning (the DuckDB oracle replays the same
    * integer arithmetic). Scaling by a power of two is exact in binary
    * floating point, so the only lossy step is the floor itself. */
  val KMeansQuantScale: Long = 1L << 20

  /** Deterministic in-plan Lloyd k-means over an `array<float>` column:
    * `iters` rounds of (assign to nearest centroid by cosine, recompute
    * centroids as the quantized fixed-point mean), then a final
    * assignment. No driver-side training loop and no RNG: seeds are a
    * caller-provided DataFrame (same id/vec columns), assignment is a
    * broadcast join + window top-1, and the centroid update is a tiny
    * (k × dim)-row aggregate — the corpus is never shuffled. Empty
    * clusters drop out of the centroid set (both here and in the SQL
    * oracle). Output: (vec_id, embedding, nrm, cent_id, ccos) with
    * ccos = cosine to the final centroid. Ties in assignment break to
    * the lowest cent_id.
    *
    * Scale shape: each round is one corpus pass (the normed projection
    * is [[Barrier]]'d once, so parquet is read once) against a
    * broadcast centroid table; k should grow ~corpus/targetCellSize so
    * downstream per-cell work stays bounded. */
  def kmeansAssign(corpus: DataFrame, seeds: DataFrame,
      idCol: String, vecCol: String, iters: Int): DataFrame = {
    val c = Barrier(normed(corpus, idCol, vecCol))
    assignCells(c, kmeansLoop(c, seeds, idCol, vecCol, iters))
  }

  /** The trained CODEBOOK itself — final (cent_id, c_emb, c_nrm) after
    * `iters` Lloyd rounds over `corpus` — for callers that index OTHER
    * data with it (the IVF-with-trained-codebook shape: train once,
    * assign corpus cells, probe at query time). Same determinism
    * contract as [[kmeansAssign]]. */
  def kmeansCentroids(corpus: DataFrame, seeds: DataFrame,
      idCol: String, vecCol: String, iters: Int): DataFrame =
    kmeansLoop(Barrier(normed(corpus, idCol, vecCol)),
      seeds, idCol, vecCol, iters)

  private def kmeansLoop(c: DataFrame, seeds: DataFrame,
      idCol: String, vecCol: String, iters: Int): DataFrame = {
    var cents = normed(seeds, idCol, vecCol)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))
    var i = 0
    while (i < iters) {
      // Barrier per round: centroids are k rows, but their lineage is a
      // full corpus pass — without the barrier every later broadcast
      // replays the whole chain.
      cents = Barrier(recentre(assignCells(c, cents)))
      i += 1
    }
    cents
  }

  /** Nearest-centroid assignment by cosine — MAP-ONLY: the centroid
    * table collapses to a single sorted-array row that rides a 1-row
    * broadcast nested-loop join, and the per-row argmax is the native
    * [[graft.functions.NearestCentroid]] expression. The declarative
    * twin (fan-out join + window top-1) would exchange the whole
    * corpus once per Lloyd round just to run row_number; here the
    * corpus is never shuffled. Keeps ccos for downstream keep/drop
    * rules. */
  private def assignCells(c: DataFrame, cents: DataFrame): DataFrame = {
    val centsRow = cents.groupBy().agg(
      array_sort(collect_list(struct(
        col("cent_id"), col("c_emb"), col("c_nrm")))).as("cents"))
    c.crossJoin(broadcast(centsRow))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        VectorFunctions.nearestCentroid(
          col("cents"), col("embedding"), col("nrm")).as("best"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("best.cent_id").as("cent_id"), col("best.ccos").as("ccos"))
  }

  /** Centroid update: exact fixed-point mean per (cluster, coordinate),
    * rebuilt into `array<float>` ordered by coordinate position. The
    * whole update shuffles only (cent_id, pos) partial sums — map-side
    * combined, k × dim result rows. */
  private def recentre(assigned: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val scale = lit(KMeansQuantScale.toDouble)
    val coords = assigned
      .select(col("cent_id"), posexplode(col("embedding")))
      .select(col("cent_id"), col("pos"),
        floor(col("col").cast(DoubleType) * scale).as("q"))
      .groupBy("cent_id", "pos")
      .agg(sum("q").as("sq"), count(lit(1)).as("n"))
      .select(col("cent_id"), col("pos"),
        (col("sq").cast(DoubleType) / (scale * col("n").cast(DoubleType)))
          .cast(FloatType).as("v"))
    coords.groupBy("cent_id")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("v")))),
        s => s.getField("v")).as("c_emb"))
      .select(col("cent_id"), col("c_emb"),
        VectorFunctions.norm(col("c_emb")).as("c_nrm"))
  }

  /** ANN via IVF cells: corpus rows assigned to their nearest centroid,
    * queries probe the `nProbe` nearest cells. No driver-side training
    * loop; the corpus-side top-1 assignment is the MAP-ONLY
    * [[assignCells]] path (native argmax over a 1-row broadcast
    * centroid array — no corpus exchange), the query side keeps the
    * window top-n for its nProbe cells (the query set is tiny by
    * contract). Pass [[kmeansCentroids]] output as `centroids` (with
    * cent_id/c_emb as id/vec columns) for the trained-codebook
    * variant. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val cents = normed(centroids, idCol, vecCol)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))
    def assignN(df: DataFrame, n: Int): DataFrame = {
      val cellCos = VectorFunctions.cosinePre(
        VectorFunctions.dot(col("c_emb"), col("embedding")),
        col("c_nrm"), col("nrm"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cell_cos").desc, col("cent_id"))
      df.join(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("nrm"),
          col("cent_id"), cellCos.as("cell_cos"))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= n)
        .drop("r", "cell_cos")
    }
    val corpusCells = assignCells(normed(corpus, idCol, vecCol), cents)
      .drop("ccos")
    val queryCells = assignN(normed(queries, idCol, vecCol), nProbe)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cent_id"))
    val cos = VectorFunctions.cosinePre(
      VectorFunctions.dot(col("q_emb"), col("embedding")),
      col("q_nrm"), col("nrm"))
    corpusCells.join(broadcast(queryCells),
        queryCells("cent_id") === corpusCells("cent_id") &&
          col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), cos.as("cos"))
      .distinct() // nProbe cells may repeat a candidate
      .withColumn("rank", row_number().over(rankWindow))
      .filter(col("rank") <= k)
  }
}
