package graft.crawl

import graft.extract.SpanExtract
import graft.frontier.{PartitionedBloom, Robots, UrlSeen, WaveSelector}
import graft.model._
import graft.synth.SyntheticSite.Seed
import graft.urls.Urls

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import java.nio.file.{Files, Paths}

// fetch-stage rows (typed — per-row invariants matter here, SURVEY §1.3).
// Top-level (not nested/private) so Catalyst codegen can reach them.
final case class Selected(url: String, urlHash: Long, host: String, depth: Int,
    priority: Double, retries: Int, discoveredWave: Int, discoveredRank: Long,
    parentUrl: String, host_rank: Long)
final case class WaveFetch(url: String, urlHash: Long, host: String, depth: Int,
    priority: Double, retries: Int, discoveredWave: Int, discoveredRank: Long,
    parentUrl: String, host_rank: Long, ok: Boolean, spans: Array[Span], fetchMs: Long,
    wave: Int)

/** The crawl engine: a wave-synchronous driver loop of DataFrame jobs
  * (SURVEY.md §3 E1, §2.8). Each wave is one declarative pipeline:
  *
  *   frontier → robots broadcast-join → salted per-host top-k batch select
  *            → mapPartitions fetch → span docs
  *            → link explode → canonicalize → xxhash64 → whitelist/depth
  *            → Bloom pre-filter + exact anti-join (URL-seen)
  *            → frontier' ∪ new entries;  wave outputs committed atomically.
  *
  * Wave-synchronous batches — not Structured Streaming — because the primary
  * correctness obligation is deterministic, reproducible ordering vs the
  * sequential reference (`scraper.py:43-63`); see SURVEY.md §2.9.
  *
  * Scale notes (the 1000-executor / 10^10-URL design):
  *  - the only shuffles per wave are the selection windows (bounded by
  *    pending×budget), the candidate dedup, and the seen anti-join — the seen
  *    table is kept hash-partitioned on `url_hash` so its side of the
  *    anti-join reuses partitioning wave-over-wave;
  *  - nothing reaches the driver except per-wave emptiness checks and the
  *    fixed-size Bloom shard deltas;
  *  - fetch is `mapPartitions` over the selected batch only (budget-bounded),
  *    so executor memory per wave is O(budget × pageSize), not O(frontier);
  *  - every wave commits a snapshot (parquet + manifest + `_COMMITTED`) or
  *    localCheckpoints — either way lineage is truncated, which an iterative
  *    loop needs or the logical plan grows without bound.
  */
object WaveRunner {

  /** Per-page link-ordinal base for the discoveredRank encoding
    * (rank = parent_rank × RankBase + link_rank): supports up to 100k links
    * per page and ~3 depth levels before Long range runs out — both enforced
    * loudly (see the candidates projection), never by silent wraparound.
    */
  val RankBase = 100000L

  final case class CrawlConfig(
      maxDepth: Int = 1,
      maxWaves: Int = 10000,
      maxRetries: Int = 0,          // reference fetches once, no retry (scraper.py:160-162)
      waveSeconds: Double = 1.0,    // × 1/crawl_delay = per-host budget (scraper.py:83)
      saltShards: Int = 1,          // >1 enables the skew pre-prune in selection
      bloomShards: Int = 32,
      bloomExpected: Long = 1L << 20,
      bloomFpp: Double = 0.01,
      snapshotDir: Option[String] = None, // Some(dir) = committed, resumable waves
      hostWhitelist: Option[Seq[String]] = None // default: seed hosts
  )

  final case class CrawlResult(
      frontier: DataFrame,
      seen: DataFrame,       // url_hash, url
      docs: DataFrame,       // url, urlHash, host, depth, wave, spans
      crawlOrder: DataFrame, // seq, wave, host, host_rank, url
      metrics: DataFrame,    // wave, host, fetched, errors, fetchMsTotal, urlsEnqueued
      waves: Int,
      fetches: Long,         // total attempted fetches (= crawlOrder row count)
      cached: Seq[DataFrame] // per-wave caches backing docs/order in memory mode
  ) {
    /** Unpersist the per-wave caches this result's DataFrames are views over.
      * Call when done with the result — in-JVM crawl reruns otherwise
      * accumulate cached blocks until the block manager thrashes (measured:
      * 2.6× throughput loss on the second run).
      */
    def release(): Unit = {
      cached.foreach(_.unpersist())
      frontier.unpersist(); seen.unpersist()
    }
  }

  /** Cold-start crawl from a seed list. */
  def run(
      spark: SparkSession,
      seeds: Seq[Seed],
      fetcher: String => Option[SpanDoc],
      rules: Seq[RobotsRule] = Nil,
      cfg: CrawlConfig = CrawlConfig()
  ): CrawlResult = {
    import spark.implicits._
    val P = shufflePartitions(spark)
    val seedEntries = seeds.sortBy(_.rank).map { s =>
      val url = Urls.normalize(s.url)
      FrontierEntry(url, Urls.urlHash64(url), Urls.hostOf(url), depth = 0,
        priority = 1000.0 * 32 + 100.0, status = FrontierStatus.Pending, retries = 0,
        discoveredWave = 0, discoveredRank = s.rank.toLong, parentUrl = "")
    }
    val frontier0 = seedEntries.toDS().toDF().repartition(P, col("urlHash"))
    val seen0 = frontier0.select(col("urlHash").as("url_hash"), col("url"))
      .repartition(P, col("url_hash"))
    val bloom = PartitionedBloom.empty(cfg.bloomShards, cfg.bloomExpected, cfg.bloomFpp)
    seedEntries.foreach(e => bloom.put(e.urlHash))
    val whitelist = cfg.hostWhitelist.getOrElse(
      seeds.map(s => Urls.hostOf(Urls.normalize(s.url))).distinct)
    runLoop(spark, frontier0, seen0, bloom, startWave = 0, Nil, whitelist, fetcher, rules, cfg)
  }

  /** Resume a snapshot-mode crawl from its last committed wave: restore
    * frontier + seen from disk, rebuild the Bloom (fixed sizing ⇒ identical
    * shape), and run the remaining waves. Resuming a completed crawl is a
    * no-op: the restored frontier has no pending rows, so the loop commits
    * nothing new and returns the committed state.
    */
  def resume(
      spark: SparkSession,
      seeds: Seq[Seed],
      fetcher: String => Option[SpanDoc],
      rules: Seq[RobotsRule],
      cfg: CrawlConfig
  ): CrawlResult = {
    import spark.implicits._
    val dir = cfg.snapshotDir.getOrElse(
      throw new IllegalArgumentException("resume requires cfg.snapshotDir"))
    val committed = listCommitted(dir)
    if (committed.isEmpty) return run(spark, seeds, fetcher, rules, cfg)

    val P     = shufflePartitions(spark)
    val last  = committed.max
    val wdirs = committed.sorted.map(w => f"$dir/wave=$w%05d")
    val frontier = spark.read.parquet(f"$dir/wave=$last%05d/frontier")
      .repartition(P, col("urlHash"))
    val seedSeen = seeds
      .map { s => val u = Urls.normalize(s.url); (Urls.urlHash64(u), u) }
      .toDF("url_hash", "url")
    val seen = wdirs.map(d => spark.read.parquet(s"$d/seen_delta"))
      .foldLeft(seedSeen)(_ unionByName _)
      .repartition(P, col("url_hash"))
    val bloom = PartitionedBloom.build(
      seen.select(col("url_hash")), cfg.bloomShards, cfg.bloomExpected, cfg.bloomFpp)
    val whitelist = cfg.hostWhitelist.getOrElse(
      seeds.map(s => Urls.hostOf(Urls.normalize(s.url))).distinct)
    runLoop(spark, frontier, seen, bloom, last + 1, wdirs, whitelist, fetcher, rules, cfg)
  }

  /** The wave loop (shared by cold start and resume).
    *
    * @param committedDirs snapshot dirs of already-committed waves, whose
    *                      deltas are stitched into the returned result
    */
  private def runLoop(
      spark: SparkSession,
      frontier0: DataFrame,
      seen0: DataFrame,
      bloom: PartitionedBloom,
      startWave: Int,
      committedDirs: Seq[String],
      whitelist: Seq[String],
      fetcher: String => Option[SpanDoc],
      rules: Seq[RobotsRule],
      cfg: CrawlConfig
  ): CrawlResult = {
    import spark.implicits._
    val P = shufflePartitions(spark)

    var frontier = frontier0.persist(StorageLevel.MEMORY_AND_DISK)
    var seen     = seen0.persist(StorageLevel.MEMORY_AND_DISK)

    val rulesDF = Robots.rulesDF(spark,
      if (rules.nonEmpty) rules else Seq(RobotsRule("__none__", Nil, Robots.DefaultCrawlDelayS)))
    val whitelistDF = {
      import spark.implicits._
      whitelist.toDF("host")
    }

    val docsDeltas    = Seq.newBuilder[DataFrame]
    val orderDeltas   = Seq.newBuilder[DataFrame]
    val metricsDeltas = Seq.newBuilder[DataFrame]
    val cached        = Seq.newBuilder[DataFrame]
    committedDirs.foreach { d =>
      docsDeltas += spark.read.parquet(s"$d/docs_delta")
      orderDeltas += spark.read.parquet(s"$d/order_delta")
      metricsDeltas += spark.read.parquet(s"$d/metrics_delta")
    }

    val debug = sys.env.contains("GRAFT_CRAWL_DEBUG")
    def phase[T](name: String, wave: Int)(body: => T): T = {
      val t0 = System.nanoTime()
      val r  = body
      if (debug) System.err.println(
        f"[crawl-debug] wave=$wave $name%-18s ${(System.nanoTime() - t0) / 1e6}%.0f ms")
      r
    }

    var wave = startWave
    var done = false
    var totalFetches = 0L
    while (!done && wave < cfg.maxWaves) {
      val pending = frontier.filter(
        col("status") === FrontierStatus.Pending && col("retries") <= cfg.maxRetries)
      val ruled = Robots.withRules(pending, rulesDF)
        .filter(col("allowed"))
        .withColumn("budget", Robots.waveBudget(cfg.waveSeconds))
      // the batch carries ALL frontier fields through the fetch stage so the
      // post-fetch frontier transition is a pure projection — no join back
      // against the frontier (one fewer shuffle per wave)
      val batch = WaveSelector.select(ruled, cfg.saltShards)
        .select(col("url"), col("urlHash"), col("host"), col("depth"),
          col("priority"), col("retries"), col("discoveredWave"),
          col("discoveredRank"), col("parentUrl"), col("host_rank"))
        // Size fetch parallelism by request count, NOT by shuffle bytes: the
        // selection output is tiny (frontier rows), so AQE would coalesce it
        // to ~1 partition and run the expensive fetch+encode stage serially.
        // Explicit repartition pins P fetch tasks (at cluster scale: one unit
        // of politeness-bounded fetch work per core).
        .repartition(P * 3)

      // wave id travels in the closure, not as a lit() column: an inlined
      // literal changes the generated code every wave and forces a full
      // Janino recompile of the largest plan in the loop
      val waveNow = wave
      val fetched = batch.as[Selected].mapPartitions { it =>
        it.map { e =>
          val t0  = System.nanoTime()
          val doc = fetcher(e.url)
          WaveFetch(e.url, e.urlHash, e.host, e.depth, e.priority, e.retries,
            e.discoveredWave, e.discoveredRank, e.parentUrl, e.host_rank,
            ok = doc.isDefined, spans = doc.map(_.spans).getOrElse(Array.empty[Span]),
            fetchMs = (System.nanoTime() - t0) / 1000000L, wave = waveNow)
        }
      }.toDF()
        .persist(StorageLevel.MEMORY_AND_DISK)

      // one materializing action per wave decides termination AND warms the
      // cache every downstream consumer reuses (keep driver barriers minimal:
      // each extra .count/.isEmpty is a full job the wave loop serializes on)
      val batchCount = phase("select+fetch", wave) { fetched.count() }
      totalFetches += batchCount
      if (batchCount == 0L) {
        fetched.unpersist()
        done = true
      } else {
        // -- link discovery → canonical candidates (G2/G3).
        // Two projections on purpose: the first materializes the sorted spans
        // and first-heading offset per ROW; referencing those as attributes in
        // the second keeps link extraction O(spans), not O(spans × links)
        // (an inlined aggregate re-evaluates per transform element).
        val links = fetched.filter(col("ok"))
          .select(col("url").as("parent_url"), col("depth").as("parent_depth"),
            col("discoveredRank").as("parent_rank"),
            SpanExtract.sortedSpans(col("spans")).as("__spans"))
          .withColumn("__firstH", SpanExtract.firstAnyHeadingOffset(col("__spans")))
          .select(col("parent_url"), col("parent_depth"), col("parent_rank"),
            explode(SpanExtract.pageLinksFrom(col("__spans"), col("__firstH"))).as("lnk"))
          .filter(col("lnk.anchorKind") === "anchor") // name-element anchors only (scraper.py:54)
          .select(col("parent_url"), col("parent_depth"), col("parent_rank"),
            col("lnk.url").as("raw_url"), col("lnk.rank").as("link_rank"))
        val candidates = links
          .withColumn("url", Urls.canonicalizeUdf(col("raw_url"), col("parent_url")))
          .withColumn("host", Urls.hostOfUdf(col("url")))
          .withColumn("url_hash", xxhash64(col("url")))
          .withColumn("depth", col("parent_depth") + 1)
          // first-discovery ordering encodes (parent_rank, link_rank) into one
          // long: rank = parent*RankBase + link. The guard fails LOUDLY on a
          // page with ≥ RankBase links (silent collision would corrupt the
          // first-discovery-wins ordering the exactness oracle checks); depth
          // overflow (RankBase^depth past ~3 with large seed ranks) throws in
          // Spark 4 ANSI arithmetic rather than wrapping.
          .withColumn("discoveredRank",
            when(col("link_rank") < RankBase,
              col("parent_rank") * RankBase + col("link_rank"))
              .otherwise(raise_error(concat(
                lit(s"page has >= $RankBase link spans (url="), col("parent_url"),
                lit("); discoveredRank encoding cannot order them")))))
          .filter(col("depth") <= cfg.maxDepth)
          // whitelist as a broadcast SEMI JOIN, not an isInCollection literal:
          // a large host list inlined into codegen recompiles every wave (and
          // a real crawl's whitelist is millions of hosts — join-shaped)
          .join(broadcast(whitelistDF), Seq("host"), "left_semi")
          // first discovery wins when several pages link the same URL this wave
          .groupBy(col("url_hash"))
          .agg(min(struct(col("discoveredRank"), col("url"), col("host"),
            col("depth"), col("parent_url"))).as("c"))
          .select(col("url_hash"), col("c.*"))

        // -- URL-seen: Bloom fast path + exact anti-join (G4).
        // The Bloom delta build doubles as the materializing action for the
        // unseen cache AND supplies the row count — one job instead of two.
        val unseen = UrlSeen.filterUnseen(candidates, seen, bloom)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val seenDelta = unseen.select(col("url_hash"), col("url"))
        val (bloomDelta, unseenCount) = phase("discover+seen", wave) {
          PartitionedBloom.buildWithCount(seenDelta.select(col("url_hash")),
            cfg.bloomShards, cfg.bloomExpected, cfg.bloomFpp)
        }

        val newEntries = unseen.select(
          col("url"),
          col("url_hash").as("urlHash"),
          col("host"),
          col("depth"),
          WaveSelector.priority(col("depth"), lit(true),
            WaveSelector.profileShaped(col("url"))).as("priority"),
          lit(FrontierStatus.Pending).as("status"),
          lit(0).as("retries"),
          lit(wave + 1).as("discoveredWave"),
          col("discoveredRank"),
          col("parent_url").as("parentUrl"))

        // -- frontier transition: selected rows leave pending; errors retry (G8)
        val untouched = frontier.join(fetched.select(col("urlHash")), Seq("urlHash"), "left_anti")
        val finished = fetched
          .select(col("url"), col("urlHash"), col("host"), col("depth"), col("priority"),
            when(col("ok"), FrontierStatus.Fetched)
              .when(col("retries") + 1 <= cfg.maxRetries, FrontierStatus.Pending)
              .otherwise(FrontierStatus.Error).as("status"),
            when(col("ok"), col("retries")).otherwise(col("retries") + 1).as("retries"),
            col("discoveredWave"), col("discoveredRank"), col("parentUrl"))
        val newFrontier = untouched.unionByName(finished).unionByName(newEntries)
          .repartition(P, col("urlHash"))

        val newSeen = seen.unionByName(seenDelta).repartition(P, col("url_hash"))

        val docsDelta = fetched.filter(col("ok"))
          .select(col("url"), col("urlHash"), col("host"), col("depth"), col("wave"), col("spans"))
        val orderDelta = fetched.select(col("wave"), col("host"), col("host_rank"), col("url"))
        val metricsDelta = fetched.groupBy(col("wave"), col("host")).agg(
          sum(when(col("ok"), 1L).otherwise(0L)).as("fetched"),
          sum(when(col("ok"), 0L).otherwise(1L)).as("errors"),
          sum(col("fetchMs")).as("fetchMsTotal"))
          .withColumn("urlsEnqueued", lit(unseenCount))

        // -- commit (G10): snapshot dir (resumable) or localCheckpoint
        cfg.snapshotDir match {
          case Some(dir) =>
            val wdir = f"$dir/wave=$wave%05d"
            newFrontier.write.mode("overwrite").parquet(s"$wdir/frontier")
            seenDelta.write.mode("overwrite").parquet(s"$wdir/seen_delta")
            docsDelta.write.mode("overwrite").parquet(s"$wdir/docs_delta")
            orderDelta.write.mode("overwrite").parquet(s"$wdir/order_delta")
            metricsDelta.write.mode("overwrite").parquet(s"$wdir/metrics_delta")
            writeManifest(spark, wdir, wave, P)
            Files.writeString(Paths.get(s"$wdir/_COMMITTED"), "1")
            val f2 = spark.read.parquet(s"$wdir/frontier").repartition(P, col("urlHash"))
              .persist(StorageLevel.MEMORY_AND_DISK)
            val s2 = newSeen.localCheckpoint(true)
            frontier.unpersist(); seen.unpersist()
            frontier = f2; seen = s2
            docsDeltas += spark.read.parquet(s"$wdir/docs_delta")
            orderDeltas += spark.read.parquet(s"$wdir/order_delta")
            metricsDeltas += spark.read.parquet(s"$wdir/metrics_delta")
            unseen.unpersist(); fetched.unpersist()
            ()
          case None =>
            // memory mode: deltas stay as views over the persisted `fetched`/
            // `unseen` caches, which live as long as the result does — no
            // per-wave checkpoint jobs and no final re-materialization of the
            // span data; only the iterative frontier/seen need lineage cuts.
            // The two checkpoints run as CONCURRENT jobs — they are
            // independent, and overlapping them fills each other's stage
            // tails (busy-fraction instrumentation showed 35% idle cores).
            import scala.concurrent.{Await, Future}
            import scala.concurrent.duration.Duration
            import scala.concurrent.ExecutionContext.Implicits.global
            val (f2, s2) = phase("state-ckpt", wave) {
              val ff = Future { newFrontier.localCheckpoint(true) }
              val sf = Future { newSeen.localCheckpoint(true) }
              (Await.result(ff, Duration.Inf), Await.result(sf, Duration.Inf))
            }
            frontier.unpersist(); seen.unpersist()
            frontier = f2; seen = s2
            docsDeltas += docsDelta
            orderDeltas += orderDelta
            metricsDeltas += metricsDelta
            cached += fetched; cached += unseen
        }
        // bloom delta (already built alongside the unseen materialization)
        if (unseenCount > 0L) bloom.mergeInPlace(bloomDelta)
        wave += 1
      }
    }

    val docs = union(spark, docsDeltas.result(),
      "url string, urlHash long, host string, depth int, wave int, " +
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>")
    val orderRaw = union(spark, orderDeltas.result(),
      "wave int, host string, host_rank long, url string")
    val metrics = union(spark, metricsDeltas.result(),
      "wave int, host string, fetched long, errors long, fetchMsTotal long, urlsEnqueued long")
    // Global crawl sequence WITHOUT an unpartitioned window (which funnels
    // every fetched URL ever through ONE task): within (wave, host) the rows
    // are already densely ranked by host_rank, so seq = group offset +
    // host_rank. Group sizes come from the per-(wave,host) metrics — already
    // aggregated, O(hosts×waves) rows, never O(URLs) — prefix-summed on the
    // driver in the same (wave asc, host asc) order the window used, then
    // broadcast-joined back. Hosts are ASCII (URL syntax), so JVM string
    // order here equals Spark's UTF8 binary order.
    val order = {
      import spark.implicits._
      val counts = metrics
        .select(col("wave"), col("host"), (col("fetched") + col("errors")).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
        .sortBy(r => (r._1, r._2))
      var running = 0L
      val offsets = counts.map { case (w, h, n) =>
        val o = running; running += n; (w, h, o)
      }.toSeq.toDF("wave", "host", "__offset")
      orderRaw.join(broadcast(offsets), Seq("wave", "host"))
        .withColumn("seq", col("__offset") + col("host_rank"))
        .select(col("seq"), col("wave"), col("host"), col("host_rank"), col("url"))
    }
    CrawlResult(frontier, seen, docs, order, metrics, wave, totalFetches, cached.result())
  }

  private def shufflePartitions(spark: SparkSession): Int =
    spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

  private def union(spark: SparkSession, dfs: Seq[DataFrame], emptySchema: String): DataFrame =
    if (dfs.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(emptySchema))
    else dfs.reduce(_ unionByName _)

  /** Iceberg-style commit manifest: wave id, input snapshot, and per-partition
    * lineage (logical hash partition of the frontier → row count) —
    * BASELINE.json: "per-partition lineage and checkpointed resumability".
    */
  private def writeManifest(spark: SparkSession, wdir: String, wave: Int, p: Int): Unit = {
    val parts = spark.read.parquet(s"$wdir/frontier")
      .groupBy(pmod(col("urlHash"), lit(p)).as("pt")).count()
      .collect().sortBy(_.getLong(0))
      .map(r => s"""{"partition":${r.getLong(0)},"rows":${r.getLong(1)}}""")
      .mkString("[", ",", "]")
    val json =
      s"""{"wave":$wave,"inputSnapshot":${wave - 1},"partitions":$parts,"format":"parquet-v1"}"""
    Files.writeString(Paths.get(s"$wdir/manifest.json"), json)
  }

  private def listCommitted(dir: String): Seq[Int] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Nil
    else {
      val files = d.listFiles()
      if (files == null)
        throw new IllegalStateException(
          s"snapshot dir $dir exists but is not listable (not a directory, or IO error)")
      files.toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("wave=") &&
          new java.io.File(f, "_COMMITTED").exists())
        .map { f =>
          try f.getName.stripPrefix("wave=").toInt
          catch {
            case _: NumberFormatException => throw new IllegalStateException(
              s"malformed snapshot directory name '${f.getName}' in $dir " +
                "(expected wave=<int>)")
          }
        }
    }
  }
}
