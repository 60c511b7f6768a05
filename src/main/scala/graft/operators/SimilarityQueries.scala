package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (north-star extension).
  *
  *  - s1: brute-force cosine top-k — the correctness baseline. The
  *    (small) query set is broadcast against the corpus, so the corpus
  *    side streams with no shuffle; the only exchange is the final
  *    per-query top-k, which Spark executes as a partial top-k per
  *    partition (WindowGroupLimit pushdown) before the shuffle.
  *  - s2: LSH-bucketed variant — random-hyperplane signatures; buckets
  *    equi-join, exact re-rank inside the bucket. This is the scale
  *    path: candidate generation is an equi-join on the bucket key, so
  *    cost is O(n·tables) shuffled rows instead of O(n·queries) dots.
  *
  * Hyperplane coefficients use exact integer arithmetic (no engine-
  * dependent RNG or libm), so results are deterministic everywhere.
  */
object SimilarityQueries {

  private val K = 5          // neighbors per query
  private val NQueries = 10  // vec_id < 10 are the probe vectors

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
  private val NPlanes = 12   // bits per signature
  private val NTables = 4    // independent hash tables (recall boost)

  /** Deterministic pseudo-random hyperplane coefficient in [-0.5, 0.5):
    * exact integer congruential form — identical in any engine. */
  private def coef(table: Int, plane: Int, d: Column): Column =
    ((lit(table * 7919 + plane * 104729) + d * lit(13007))
      .mod(lit(2039)).cast("double") / lit(2039.0)) - lit(0.5)

  /** Sign-bit signature of one table: bit_p = [dot(plane_p, v) >= 0]. */
  private def signature(table: Int, emb: Column): Column = {
    val planeBits = (0 until NPlanes).map { p =>
      val dot = aggregate(
        zip_with(emb, sequence(lit(0), lit(63)),
          (x, d) => x.cast("double") * coef(table, p, d)),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, math.pow(2, p).toLong).otherwise(0L)
    }
    planeBits.reduce(_ + _)
  }

  private def lshTopK(s: SparkSession, dir: String): DataFrame = {
    val c = corpus(s, dir)
    // each vector lands in NTables buckets: (table, sig)
    val tagged = c.select(
      col("vec_id"), col("embedding"), col("nrm"),
      explode(array((0 until NTables).map { t =>
        struct(lit(t).as("tbl"), signature(t, col("embedding")).as("sig"))
      }: _*)).as("bucket"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("bucket.tbl").as("tbl"), col("bucket.sig").as("sig"))
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

  val all: Seq[QueryDef] = Seq(
    QueryDef("s1_cosine_topk", bruteTopK, Some(bruteTopKSql), bench = true),
    QueryDef("s2_ann_lsh", lshTopK, None, bench = true),
  )
}
