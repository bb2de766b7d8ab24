package graft

import graft.crawl.WaveRunner
import graft.crawl.WaveRunner.CrawlConfig
import graft.synth.SyntheticSite
import graft.synth.SyntheticSite.SiteConfig

/** Child process for the scaling benchmark: one "cluster size" per JVM.
  *
  * Run by [[Bench]] under `taskset` so a local[N] measurement really has N
  * cores (an unpinned local[2] JVM still enjoys the whole box's GC threads
  * and memory bandwidth, inflating the small-N baseline and deflating the
  * measured N→4N efficiency). Separate JVMs also keep the two measurements
  * free of each other's heap/codegen state.
  *
  * Args: cores universities deptsPerU facultyPerDept waveSeconds runs
  * Prints exactly one line: `RATE <urlsPerSec> <urls>`.
  */
object BenchCrawlChild {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val site = SiteConfig(
      universities = args(1).toInt, deptsPerU = args(2).toInt,
      facultyPerDept = args(3).toInt, errorFraction = 0.05, pubsPerFaculty = 12,
      bioWords = 250) // ~2 KB prose per profile: realistic page weight
    val crawl = CrawlConfig(waveSeconds = args(4).toDouble, saltShards = 4)
    val runs  = args(5).toInt

    // GRAFT_MASTER overrides the master — e.g. "local-cluster[2,1,6144]"
    // runs REAL separate executor JVMs (the honest N-executors simulation:
    // separate heaps/GC, like a real cluster node layout)
    val master = sys.env.getOrElse("GRAFT_MASTER", s"local[$cores]")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(master)
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      .appName(s"graft-bench-child-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString) // 2x cores: stage tails overlap
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val warmSite = SiteConfig(universities = 1, deptsPerU = 1, facultyPerDept = 4)
    WaveRunner.run(spark, SyntheticSite.seeds(warmSite),
      SyntheticSite.htmlFetcher(warmSite), Nil, crawl).release()

    val seeds   = SyntheticSite.seeds(site)
    // the HTML-path fetcher: realistic per-page parse cost (render+parse),
    // which is where a real crawler's executor CPU goes
    val fetcher = SyntheticSite.htmlFetcher(site)
    // busy-fraction instrumentation: how much of (wallclock × cores) the
    // executors actually spend in task run time — distinguishes "driver gaps"
    // from "tasks inflate under concurrency" when diagnosing scaling
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0)
    val gcTime   = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) {
          taskTime.addAndGet(e.taskMetrics.executorRunTime)
          gcTime.addAndGet(e.taskMetrics.jvmGCTime); ()
        }
    })
    val best = (1 to runs).map { _ =>
      System.gc()
      taskTime.set(0); gcTime.set(0)
      val t0   = System.nanoTime()
      val r    = WaveRunner.run(spark, seeds, fetcher, Nil, crawl)
      val wall = (System.nanoTime() - t0) / 1e9
      val rate = (r.fetches / wall, r.fetches,
        taskTime.get() / 1000.0 / (wall * cores),
        gcTime.get() / 1000.0 / (wall * cores))
      r.release() // cached blocks from one run must not pressure the next
      rate
    }.maxBy(_._1)
    println(f"RATE ${best._1}%.2f ${best._2} busy=${best._3}%.2f gc=${best._4}%.2f")
    spark.stop()
  }
}
