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

  /** ANN via IVF cells: corpus rows assigned to their nearest centroid,
    * queries probe the `nProbe` nearest cells. Assignment is a
    * broadcast join + window top-1 — fully distributed, no driver-side
    * training loop. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val cents = normed(centroids, idCol, vecCol)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))
    def assign(df: DataFrame, n: Int): DataFrame = {
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
    val corpusCells = assign(normed(corpus, idCol, vecCol), 1)
    val queryCells = assign(normed(queries, idCol, vecCol), nProbe)
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
