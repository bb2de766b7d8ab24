package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Decision, Request}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming analogs of the reference's rate-limit semantics
  * (SURVEY §2.9): windowed counts driven through a real streaming query
  * (file source → memory sink), and the stateful per-host token bucket.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("fixed-window counts: streaming result equals the batch groupBy") {
    val src = "/root/testdata/sf0.001/events.parquet"
    // the file source needs a directory; stage the single-file table into one
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      dir.resolve("part-0.parquet"))
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val q = EventStreams.fixedWindowCounts(stream)
      .writeStream.outputMode("append").format("memory").queryName("win_counts")
      .start()
    try {
      q.processAllAvailable()
      // append mode emits only watermark-closed windows; every emitted row
      // must match the batch computation exactly
      val got = spark.sql("SELECT * FROM win_counts")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = spark.read.parquet(src)
        .groupBy(date_trunc("minute", col("ts")).as("minute"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(got.nonEmpty, "watermark must close at least one window")
      assert(got.subsetOf(batch), "streaming windows must agree with batch")
    } finally q.stop()
  }


  test("streaming dedup: exactly-once per url_hash within the watermark (URL-seen analog)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val deduped = EventStreams.dedupStream(
      mem.toDF().toDF("url_hash", "ts", "url"), horizon = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // duplicates inside one batch AND across batches within the horizon
      mem.addData((1L, ts(0), "a"), (2L, ts(1), "b"), (1L, ts(2), "a"))
      q.processAllAvailable()
      mem.addData((1L, ts(3), "a"), (3L, ts(4), "c"), (3L, ts(5), "c"))
      q.processAllAvailable()
      val rows = spark.table("dedup_out").collect()
      assert(rows.length === 3, rows.mkString(","))
      assert(rows.map(_.getAs[Long]("url_hash")).toSet === Set(1L, 2L, 3L))
    } finally q.stop()
  }

  test("continuous-crawl analog: dedup → pacing → windowed metrics match the batch wave loop") {
    // The composed §2.9 pipeline (r4 verdict #7): the SAME fetch-event
    // sequence a batch crawl commits, replayed as a multi-batch stream —
    // one MemoryStream batch per wave, with re-discovered URLs injected —
    // must reproduce the wave loop's seen set (exactly-once), its per-wave
    // per-host metrics (as watermark-closed windows), and agree with the
    // token-bucket pacer that the batch schedule was politeness-legal.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.crawl.WaveRunner
    import graft.synth.SyntheticSite
    import graft.synth.SyntheticSite.SiteConfig
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val site = SiteConfig(universities = 2, deptsPerU = 1, facultyPerDept = 6,
      errorFraction = 0.0)
    val budget = 3 // waveSeconds 3.0 at 1s crawl delay
    val engine = WaveRunner.run(spark, SyntheticSite.seeds(site),
      SyntheticSite.fetcher(site), Nil,
      WaveRunner.CrawlConfig(waveSeconds = budget.toDouble))
    val order = engine.crawlOrder.collect().map(r =>
      (r.getAs[Int]("wave"), r.getAs[String]("host"), r.getAs[String]("url")))
    val batchSeen = engine.seen.collect().map(_.getAs[Long]("url_hash")).toSet
    val batchMetrics = engine.metrics.filter(col("fetched") > 0).collect()
      .map(r => (r.getAs[Int]("wave"), r.getAs[String]("host"), r.getAs[Long]("fetched")))
      .toSet

    val base = 1700000100000L // minute-aligned: window starts land on base + w*60s
    def waveTs(w: Int) = new java.sql.Timestamp(base + w * 60000L) // 1 wave = 1 minute
    type Ev = (Long, java.sql.Timestamp, String, String) // url_hash, ts, url, host
    def ev(w: Int, host: String, url: String): Ev =
      (graft.urls.Urls.urlHash64(url), waveTs(w), url, host)
    val lastWave = order.map(_._1).max
    val waveEvents: Map[Int, Seq[Ev]] =
      order.groupBy(_._1).map { case (w, rs) =>
        val fetches = rs.map(r => ev(w, r._2, r._3)).toSeq
        // re-discoveries: wave-0 URLs resurface in every later wave (within
        // the 10-min horizon) — the stream must drop them as the batch
        // loop's URL-seen did
        val dups = if (w == 0) Nil
          else order.filter(_._1 == 0).take(2).map(r => ev(w, r._2, r._3)).toSeq
        w -> (fetches ++ dups)
      }
    val sentinel: Ev = (-999L,
      new java.sql.Timestamp(base + (lastWave + 1) * 60000L + 12 * 60000L),
      "__sentinel__", "__sentinel__")

    val mem = MemoryStream[(Long, java.sql.Timestamp, String, String)]
    val src = mem.toDF().toDF("url_hash", "ts", "url", "host")
    // composed query: URL-seen dedup CHAINED into windowed per-host metrics
    // (two stateful operators in one streaming query, append mode)
    val deduped = EventStreams.dedupStream(src, horizon = "10 minutes")
    val metricsQ = EventStreams.fixedWindowCounts(
      deduped.select(col("ts"), col("host").as("event_type"), lit(1.0).as("value")),
      lateness = None) // inherit the dedup stage's watermark (one query, two stateful ops)
      .writeStream.outputMode("append").format("memory").queryName("cc_metrics").start()
    val dedupQ = deduped
      .writeStream.outputMode("append").format("memory").queryName("cc_dedup").start()
    try {
      (0 to lastWave).foreach { w =>
        mem.addData(waveEvents(w): _*)
        metricsQ.processAllAvailable(); dedupQ.processAllAvailable()
      }
      mem.addData(sentinel) // advance the watermark past the last wave's window
      metricsQ.processAllAvailable(); dedupQ.processAllAvailable()

      // 1. seen-set parity, exactly-once: injected re-discoveries are dropped
      val streamSeen = spark.table("cc_dedup")
        .filter(col("url_hash") =!= -999L).collect().map(_.getAs[Long]("url_hash"))
      assert(streamSeen.length === streamSeen.distinct.length, "exactly-once violated")
      assert(streamSeen.toSet === batchSeen,
        "streaming URL-seen must equal the batch wave loop's seen set")

      // 2. per-wave per-host metrics parity via watermark-closed windows
      val streamMetrics = spark.table("cc_metrics")
        .filter(col("event_type") =!= "__sentinel__").collect()
        .map(r => (((r.getTimestamp(0).getTime - base) / 60000L).toInt,
          r.getString(1), r.getLong(2))).toSet
      assert(streamMetrics === batchMetrics,
        "windowed stream metrics must equal the batch per-wave metrics")

      // 3. pacing parity: with burst = wave budget and refill = budget/wave,
      // every batch-committed fetch passes the streaming token bucket (the
      // batch schedule is politeness-legal under the continuous pacer)
      val reqs = spark.table("cc_dedup").filter(col("url_hash") =!= -999L)
        .select(col("host"), col("ts")).as[Request]
      val decisions = EventStreams.tokenBucket(reqs,
        ratePerSec = budget / 60.0, burst = budget.toDouble)(implicitly, implicitly)
        .collect()
      assert(decisions.length === batchSeen.size)
      assert(decisions.forall(_.allowed),
        "batch wave scheduling must be legal under the streaming token bucket")
    } finally { metricsQ.stop(); dedupQ.stop(); engine.release() }
  }

  test("token bucket: burst then refill, per-host isolation (scraper.py:83 analog)") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val reqs = Seq(
      Request("a", ts(0)), Request("a", ts(0)), Request("a", ts(0)), // burst of 3, cap 2
      Request("a", ts(1)),                                           // 1s refill at 1/s
      Request("b", ts(0))                                            // other host unaffected
    ).toDS()
    val got = EventStreams.tokenBucket(reqs, ratePerSec = 1.0, burst = 2.0)(
      implicitly, implicitly)
      .collect().sortBy(d => (d.host, d.tsMs))
    val a = got.filter(_.host == "a").map(_.allowed).toList
    assert(a === List(true, true, false, true), s"got $got")
    assert(got.filter(_.host == "b").map(_.allowed).toList === List(true))
  }
}
