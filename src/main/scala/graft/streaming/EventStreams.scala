package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.9).
  *
  * The engine's crawl runs as wave-synchronous batches (deterministic
  * ordering is the correctness obligation — §2.9's argument), but the
  * reference's rate-limiter semantics have natural streaming analogs, built
  * here so a continuous-crawl mode has its primitives ready:
  *
  *  - fixed-window counts per key (reference `limiter.py:122-144`,
  *    `rate_limiter.py:42-47`: N requests per window) → windowed groupBy
  *    with a watermark;
  *  - per-host token bucket (reference `scraper.py:83` pacing generalized)
  *    → `mapGroupsWithState` keyed by host.
  */
object EventStreams {

  /** Fixed-window request accounting: requests per (1-minute window, key),
    * late data bounded by a 2-minute watermark. Works identically over a
    * bounded stream (tests drive it with a file source + processAllAvailable).
    *
    * `lateness = None` composes this operator downstream of an
    * already-watermarked stateful stage (e.g. [[dedupStream]]) in ONE
    * streaming query: Spark disallows redefining the watermark once multiple
    * stateful operators share a plan, so the window agg inherits the
    * upstream horizon instead.
    */
  def fixedWindowCounts(events: DataFrame,
      lateness: Option[String] = Some("2 minutes")): DataFrame =
    (lateness match {
      case Some(l) => events
        // parquet µs timestamps infer as TIMESTAMP_NTZ in Spark 4; watermarks
        // require event-time TIMESTAMP (LTZ) — session TZ is pinned UTC
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", l)
      case None => events // upstream already watermarked `ts`
    })
      .groupBy(window(col("ts"), "1 minute").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("value_sum"))
      .select(col("w.start").as("minute"), col("event_type"), col("n"), col("value_sum"))

  /** Streaming URL-seen analog: exactly-once emission per `url_hash` for
    * events arriving within the watermark horizon
    * (`dropDuplicatesWithinWatermark` keyed on the hash). The state store
    * holds only keys younger than the horizon and evicts them as the
    * watermark advances — state is O(keys per horizon), never O(all
    * history), which is the continuous-crawl counterpart of the batch
    * engine's compacted seen-base + bounded delta residency (a plain
    * `dropDuplicates` under a watermark would pin every key forever unless
    * the event time itself were part of the dedup key).
    */
  def dedupStream(events: DataFrame, horizon: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("url_hash")

  final case class Request(host: String, ts: java.sql.Timestamp)
  final case class BucketState(tokens: Double, lastRefillMs: Long)
  final case class Decision(host: String, tsMs: Long, allowed: Boolean, tokensAfter: Double)

  /** Per-host token bucket (refill `ratePerSec`, capacity `burst`): the
    * continuous form of the per-wave budget in [[graft.frontier.Robots]].
    * Deterministic given event order within a host group.
    */
  def tokenBucket(requests: Dataset[Request], ratePerSec: Double, burst: Double)(
      implicit enc: org.apache.spark.sql.Encoder[Decision],
      encSeq: org.apache.spark.sql.Encoder[(String, Seq[Decision])]
  ): Dataset[Decision] = {
    import requests.sparkSession.implicits._
    requests
      .groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (host: String, rs: Iterator[Request], state: GroupState[BucketState]) => {
          var st = state.getOption.getOrElse(BucketState(burst, Long.MinValue))
          val out = rs.toSeq.sortBy(_.ts.getTime).map { r =>
            val now = r.ts.getTime
            val refill =
              if (st.lastRefillMs == Long.MinValue) 0.0
              else (now - st.lastRefillMs) / 1000.0 * ratePerSec
            val tokens  = math.min(burst, st.tokens + math.max(0.0, refill))
            val allowed = tokens >= 1.0
            st = BucketState(if (allowed) tokens - 1.0 else tokens, now)
            Decision(host, now, allowed, st.tokens)
          }
          state.update(st)
          out.iterator
        })
  }
}
