package graft.frontier

import graft.model.RobotsRule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Robots rules as a broadcast-joined table (SURVEY.md §2.8 G9, J7).
  *
  * The reference has no robots handling (grep-verified, SURVEY §2.8); its
  * politeness is a hard-coded 1 req/s sleep (reference `scraper.py:83`) and
  * the API's per-key budget maps (reference `limiter.py:30-42`). The engine
  * therefore defaults every host to allow-all with crawl_delay = 1.0 s — the
  * reference-equivalent budget — and lets an explicit rules table override
  * per host (deny prefixes + crawl delay), exactly the broadcast-join shape
  * the north rule mandates.
  */
object Robots {

  val DefaultCrawlDelayS = 1.0 // scraper.py:83

  def rulesDF(spark: SparkSession, rules: Seq[RobotsRule]): DataFrame = {
    import spark.implicits._
    rules.toDS().toDF()
  }

  /** Left-broadcast-join rules onto a frontier (must carry `host`, `url`);
    * null rule → default allow + 1 s delay. Adds:
    *   `crawl_delay_s: double`, `allowed: boolean`.
    * Deny semantics: URL path starts with any deny prefix.
    *
    * Rules are first merged to ONE row per host (deny prefixes unioned, the
    * most conservative — largest — crawl delay kept): duplicate host rows
    * would fan the frontier out through the join and the same URL would be
    * selected/fetched twice in a wave, corrupting ordering and budgets.
    */
  def withRules(frontier: DataFrame, rules: DataFrame): DataFrame = {
    val perHost = rules.groupBy(col("host")).agg(
      array_sort(array_distinct(flatten(collect_list(col("denyPrefixes")))))
        .as("__deny"),
      max(col("crawlDelayS")).as("__delay"))
    val joined = frontier.join(broadcast(perHost), Seq("host"), "left")
    val path = regexp_replace(col("url"), "^https?://[^/]*", "")
    joined
      .withColumn("crawl_delay_s", coalesce(col("__delay"), lit(DefaultCrawlDelayS)))
      .withColumn("allowed",
        coalesce(
          !exists(col("__deny"), p => path.startsWith(p)),
          lit(true)))
      .drop("__deny", "__delay")
  }

  /** Per-host fetch budget for one wave: how many requests a wave of
    * `waveSeconds` allows at the host's crawl delay (token-bucket refill for
    * one wave; reference budget semantics from `limiter.py:122-144`:
    * N requests per fixed window).
    */
  def waveBudget(waveSeconds: Double): org.apache.spark.sql.Column =
    greatest(lit(1L), floor(lit(waveSeconds) / col("crawl_delay_s")).cast("long"))
}
