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
