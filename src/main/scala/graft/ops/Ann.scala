package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`embedding: array<float>`,
  * dim 64): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path (bucket the
  * corpus once, probe only the query's bucket — at 10^10 vectors the bucket
  * join touches 1/2^planes of the data per probe).
  *
  * Dot products are `zip_with` + `aggregate` HOFs (codegen'd, no UDF).
  */
object Ann {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** dot(a, b) over array<double>. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force cosine top-k against the query vector (vec_id = min).
    * Exact baseline: one broadcast of the query row, one row-local cosine per
    * vector, TakeOrderedAndProject for the top-k — no shuffle of the corpus.
    */
  def cosineTopk(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val e = emb(spark, dir).withColumn("v", col("embedding").cast("array<double>"))
    val qId = e.agg(min(col("vec_id")).as("q_id"))
    val q = e.join(broadcast(qId), e("vec_id") === qId("q_id"))
      .select(col("v").as("qv"))
    e.crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(cosine(col("v"), col("qv")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  val cosineTopkSql: String =
    """SELECT e.vec_id, e.label,
      |  round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS cos
      |FROM embeddings e
      |CROSS JOIN (SELECT embedding FROM embeddings
      |            WHERE vec_id = (SELECT min(vec_id) FROM embeddings)) q
      |ORDER BY cos DESC, e.vec_id ASC
      |LIMIT 20""".stripMargin

  /** Deterministic random hyperplanes (splitmix-style mixing of (plane, dim))
    * — pure function, identical on driver and executors.
    */
  def hyperplane(plane: Int, dims: Int): Array[Double] =
    Array.tabulate(dims) { d =>
      var z = (plane.toLong << 32 | d.toLong) + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (math.abs(z % 2000L).toDouble - 1000.0) / 1000.0
    }

  /** Random-hyperplane LSH bucket id (sign-bit signature over `planes`). */
  def lshBucket(v: Column, planes: Int, dims: Int): Column =
    (0 until planes).map { p =>
      val plane = array(hyperplane(p, dims).map(lit): _*)
      when(dot(v, plane) > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed ANN: bucket the corpus, probe only the query's bucket,
    * exact cosine within it. Returns the per-bucket top-k for the query
    * vector. (Recall < 1 by construction — the scale/recall tradeoff; the
    * exact baseline above is the reference answer.)
    */
  def annLshTopk(spark: SparkSession, dir: String, planes: Int = 8, k: Int = 10): DataFrame = {
    val dims = 64
    val e = emb(spark, dir)
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("bucket", lshBucket(col("v"), planes, dims))
    val qId = e.agg(min(col("vec_id")).as("q_id"))
    val q = e.join(broadcast(qId), e("vec_id") === qId("q_id"))
      .select(col("v").as("qv"), col("bucket").as("q_bucket"))
    e.join(broadcast(q), col("bucket") === col("q_bucket"))
      .select(col("vec_id"), col("label"), col("bucket"),
        round(cosine(col("v"), col("qv")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Embedding near-duplicate pairs on a deterministic candidate set
    * (adjacent vec_ids), cosine ≥ threshold — the embedding-space analog of
    * [[Dedup.ngramJaccard]].
    */
  def embeddingNearDup(spark: SparkSession, dir: String, threshold: Double = 0.95): DataFrame = {
    val e = emb(spark, dir).withColumn("v", col("embedding").cast("array<double>"))
    val a = e.select(col("vec_id").as("a_id"), col("v").as("a_v"))
    val b = e.select(col("vec_id").as("b_id"), col("v").as("b_v"))
    a.join(b, col("a_id") + 1 === col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(cosine(col("a_v"), col("b_v")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  val embeddingNearDupSql: String =
    """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
      |FROM embeddings a JOIN embeddings b ON a.vec_id + 1 = b.vec_id
      |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.95""".stripMargin
}
