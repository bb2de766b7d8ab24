package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time ONE SparkEntry query solo, with the exact protocol the
  * per-round bench uses (local[N] warmed session, noop sink, cache cleared
  * between runs) — for iterating on a single query's cost without paying a
  * full bench run. `runMain graft.QueryBench <query> [sfDir] [reps]`.
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val name  = args.headOption.getOrElse("q_tfidf_cosine")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps  = if (args.length > 2) args(2).toInt else 3
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-qbench-$name")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q_agg_lineitem")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    // comma-separated: earlier names run once as context, the LAST is timed
    val names = name.split(",").toSeq
    names.init.foreach { w =>
      SparkEntry.queries(w)(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }
    val fn = SparkEntry.queries(names.last)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[qbench] ${names.last} rep$i: $sec%.3f s")
    }
    spark.stop()
  }
}
