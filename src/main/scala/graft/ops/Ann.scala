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

  // ---- IVF (inverted-file) ANN ----

  /** Deterministic Lloyd k-means on a driver-side sample (init = first k
    * sample points, fixed iteration count, empty cells keep their centroid)
    * — the coarse quantizer must be reproducible run-to-run for the
    * inverted lists to be a stable table.
    */
  def kmeansDeterministic(points: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    require(points.length >= k, s"need ≥ $k sample points")
    val dims = points.head.length
    var cents = points.take(k).map(_.clone())
    var it = 0
    while (it < iters) {
      val sums   = Array.fill(k)(new Array[Double](dims))
      val counts = new Array[Long](k)
      points.foreach { p =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < dims) { val x = p(i) - cents(c)(i); d += x * x; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dims) { sums(best)(i) += p(i); i += 1 }
      }
      cents = Array.tabulate(k)(c =>
        if (counts(c) == 0) cents(c)
        else Array.tabulate(dims)(i => sums(c)(i) / counts(c)))
      it += 1
    }
    cents
  }

  /** Squared L2 distance to a centroid literal. */
  private def l2sq(v: Column, cent: Array[Double]): Column =
    aggregate(zip_with(v, array(cent.map(lit): _*), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Index of the nearest centroid (argmin via struct-min — row-local,
    * codegen'd). At real scale assignment would be a `mapPartitions` with a
    * BLAS gemm per batch; the relational form keeps the test path UDF-free.
    */
  def nearestCell(v: Column, centroids: Array[Array[Double]]): Column =
    array_min(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(l2sq(v, c).as("d"), lit(i).as("i"))
    }: _*)).getField("i")

  /** IVF ANN: a coarse quantizer (deterministic k-means over a bounded
    * sample) partitions the corpus into `nlist` cells — the inverted-list
    * table a real deployment materializes ONCE, partitioned by cell; a query
    * probes its `nProbe` nearest cells and runs exact cosine inside them.
    * Work per query is O(corpus × nProbe / nlist), never O(corpus).
    *
    * Exactness anchor: with nProbe = nlist the probe covers every cell and
    * the result equals [[cosineTopk]] exactly (spec-tested); smaller nProbe
    * trades recall for probe cost (recall < 1 by construction).
    */
  def ivfTopk(spark: SparkSession, dir: String, nlist: Int = 16,
      nProbe: Int = 4, k: Int = 10): DataFrame = {
    val e = emb(spark, dir).withColumn("v", col("embedding").cast("array<double>"))
    // train on a BOUNDED deterministic sample (first 256 by vec_id) — the
    // driver-side structure is O(sample), not O(corpus)
    val sample = e.orderBy(col("vec_id")).limit(256)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    val cents = kmeansDeterministic(sample, nlist, iters = 5)
    val assigned = e.withColumn("cell", nearestCell(col("v"), cents))
    // query = min vec_id; its vector is one driver-known row (any real ANN
    // service holds the query vector client-side)
    val qRow = e.orderBy(col("vec_id")).limit(1).select(col("v")).collect().head
    val qv = qRow.getSeq[Double](0).toArray
    val qCells = cents.zipWithIndex.map { case (c, i) =>
      var d = 0.0; var j = 0
      while (j < qv.length) { val x = qv(j) - c(j); d += x * x; j += 1 }
      (d, i)
    }.sortBy(x => (x._1, x._2)).take(nProbe).map(_._2)
    val qvCol = array(qv.map(lit): _*)
    assigned
      .filter(col("cell").isInCollection(qCells.map(Int.box).toSeq))
      .select(col("vec_id"), col("label"), col("cell"),
        round(cosine(col("v"), qvCol), 4).as("cos"))
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
