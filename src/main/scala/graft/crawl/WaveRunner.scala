package graft.crawl

import graft.extract.SpanExtract
import graft.frontier.{BloomShard, BloomTable, PartitionedBloom, PartitionedCuckoo, Robots, SeenPreFilter, UrlSeen, WaveSelector}
import graft.model._
import graft.synth.SyntheticSite.Seed
import graft.urls.Urls

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel


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
      /** URL-seen Bloom residency is chosen STATICALLY from the configured
        * sizing (like Spark's broadcast-join threshold): when the whole
        * filter (≈ 1.2·bloomExpected bytes at 1% fpp) fits under this bound
        * it is broadcast and probed row-locally — no extra shuffle; above it
        * the filter lives as a shard TABLE co-partitioned with candidates
        * and probed shard-locally (the 10^10 path: a 12 GB filter must never
        * exist on the driver or as one broadcast). Set to 0 to force the
        * sharded path regardless of sizing (tests do).
        */
      bloomBroadcastMaxBytes: Long = 256L << 20,
      /** Pre-filter family in the broadcast regime: "bloom" (default) or
        * "cuckoo" (supports deletion, ~0.01% FPP at 16-bit fingerprints —
        * see [[graft.frontier.CuckooFilter]]). The sharded 10^10 regime is
        * bloom-backed.
        */
      seenFilter: String = "bloom",
      snapshotDir: Option[String] = None, // Some(dir) = committed, resumable waves
      hostWhitelist: Option[Seq[String]] = None // default: seed hosts
  ) {
    /** Conservative whole-filter size estimate from the configured sizing. */
    def bloomBytesEstimate: Long =
      (bloomExpected * math.ceil(
        -math.log(bloomFpp) / (math.log(2) * math.log(2))).toLong) / 8 + 64 * bloomShards
    def bloomBroadcastable: Boolean = bloomBytesEstimate <= bloomBroadcastMaxBytes
  }

  final case class CrawlResult(
      frontier: DataFrame,
      seen: DataFrame,       // url_hash, url
      docs: DataFrame,       // url, urlHash, host, depth, wave, spans
      private val orderThunk: () => DataFrame,
      metrics: DataFrame,    // wave, host, fetched, errors, fetchMsTotal, urlsEnqueued
      waves: Int,
      fetches: Long,         // total attempted fetches (= crawlOrder row count)
      cached: Seq[DataFrame] // per-wave caches backing docs/order in memory mode
  ) {
    /** Global crawl order (seq, wave, host, host_rank, url). Lazy: deriving
      * the seq offsets runs one small driver-side aggregate over the metrics
      * views, deferred so crawls that never read the ordering (the throughput
      * bench) don't pay that job inside their timed window.
      */
    lazy val crawlOrder: DataFrame = orderThunk()

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
    val whitelist = cfg.hostWhitelist.getOrElse(
      seeds.map(s => Urls.hostOf(Urls.normalize(s.url))).distinct)
    runLoop(spark, frontier0, seen0, startWave = 0, Nil, whitelist, fetcher, rules, cfg)
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
    val P     = shufflePartitions(spark)
    val store = new ParquetSnapshotStore(spark, dir, P)
    val committed = store.listCommitted()
    if (committed.isEmpty) return run(spark, seeds, fetcher, rules, cfg)

    val last  = committed.max
    val waves = committed.sorted
    val frontier = store.readFrontier(last)
      .repartition(P, col("urlHash"))
    val seedSeen = seeds
      .map { s => val u = Urls.normalize(s.url); (Urls.urlHash64(u), u) }
      .toDF("url_hash", "url")
    val seen = waves.map(w => store.readDelta(w, "seen_delta"))
      .foldLeft(seedSeen)(_ unionByName _)
      .repartition(P, col("url_hash"))
    val whitelist = cfg.hostWhitelist.getOrElse(
      seeds.map(s => Urls.hostOf(Urls.normalize(s.url))).distinct)
    runLoop(spark, frontier, seen, last + 1, waves, whitelist, fetcher, rules, cfg)
  }

  /** The wave loop (shared by cold start and resume).
    *
    * @param committedWaves already-committed wave ids, whose deltas are
    *                       stitched into the returned result
    */
  private def runLoop(
      spark: SparkSession,
      frontier0: DataFrame,
      seen0: DataFrame,
      startWave: Int,
      committedWaves: Seq[Int],
      whitelist: Seq[String],
      fetcher: String => Option[SpanDoc],
      rules: Seq[RobotsRule],
      cfg: CrawlConfig
  ): CrawlResult = {
    import spark.implicits._
    val P = shufflePartitions(spark)

    var frontier = frontier0.persist(StorageLevel.MEMORY_AND_DISK)
    var seen     = seen0.persist(StorageLevel.MEMORY_AND_DISK)
    // URL-seen Bloom state, residency chosen statically from the configured
    // sizing (cfg.bloomBroadcastable, like Spark's broadcast-join threshold):
    //  - broadcast regime (filter fits the bound): a driver PartitionedBloom,
    //    re-broadcast per wave, probed row-locally — no extra shuffle. The
    //    driver object is BOUNDED BY CONFIG, it does not grow with URL count.
    //  - sharded regime (the 10^10 path): a Dataset[BloomShard] living on
    //    executors, probed via shard-local cogroup — nothing whole-filter
    //    ever exists in one place. LAZY localCheckpoint, not persist: like
    //    frontier/seen this is iterative state — a persist caches data but
    //    keeps the logical plan, and the bloom plan references ITSELF twice
    //    per wave (probe + merge), so un-truncated lineage grows
    //    exponentially (measured: OOM building plan strings by wave ~6); the
    //    totalKeys action is what materializes the checkpoint — no extra job.
    val bloomBroadcast = cfg.bloomBroadcastable
    var bloomDriver: SeenPreFilter       = null
    var bloomTable: Dataset[BloomShard]  = null
    var seenTotal = 0L
    if (bloomBroadcast) {
      bloomDriver =
        if (cfg.seenFilter == "cuckoo")
          PartitionedCuckoo.build(seen0.select(col("url_hash")),
            cfg.bloomShards, cfg.bloomExpected)
        else
          PartitionedBloom.build(seen0.select(col("url_hash")),
            cfg.bloomShards, cfg.bloomExpected, cfg.bloomFpp)
    } else {
      require(cfg.seenFilter == "bloom",
        "the sharded (beyond-broadcast) URL-seen regime is bloom-backed")
      bloomTable = BloomTable.fromHashes(seen0.select(col("url_hash")),
        cfg.bloomShards, cfg.bloomExpected, cfg.bloomFpp).localCheckpoint(false)
      seenTotal = BloomTable.totalKeys(bloomTable)
    }

    val rulesDF = Robots.rulesDF(spark,
      if (rules.nonEmpty) rules else Seq(RobotsRule("__none__", Nil, Robots.DefaultCrawlDelayS)))
    val whitelistDF = {
      import spark.implicits._
      whitelist.toDF("host")
    }

    // snapshot-mode table store (G10) — the engine speaks only to WaveStore;
    // a real Iceberg/Delta catalog drops in behind the trait
    val store: Option[WaveStore] =
      cfg.snapshotDir.map(d => new ParquetSnapshotStore(spark, d, P))

    val docsDeltas    = Seq.newBuilder[DataFrame]
    val orderDeltas   = Seq.newBuilder[DataFrame]
    val metricsDeltas = Seq.newBuilder[DataFrame]
    val cached        = Seq.newBuilder[DataFrame]
    committedWaves.foreach { w =>
      docsDeltas += store.get.readDelta(w, "docs_delta")
      orderDeltas += store.get.readDelta(w, "order_delta")
      metricsDeltas += store.get.readDelta(w, "metrics_delta")
    }

    val debug = sys.env.contains("GRAFT_CRAWL_DEBUG")
    var lastMark = System.nanoTime()
    def phase[T](name: String, wave: Int)(body: => T): T = {
      val t0 = System.nanoTime()
      val gap = (t0 - lastMark) / 1e6
      val r  = body
      lastMark = System.nanoTime()
      if (debug) System.err.println(
        f"[crawl-debug] wave=$wave $name%-18s ${(lastMark - t0) / 1e6}%.0f ms" +
          f" (gap $gap%.0f ms)")
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
          // depth guard FIRST: at the leaf wave every link dies here, and the
          // canonicalize/host UDFs are the expensive per-link work — filter
          // before computing them, not after
          .withColumn("depth", col("parent_depth") + 1)
          .filter(col("depth") <= cfg.maxDepth)
          .withColumn("url", Urls.canonicalizeUdf(col("raw_url"), col("parent_url")))
          .withColumn("host", Urls.hostOfUdf(col("url")))
          .withColumn("url_hash", xxhash64(col("url")))
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
          // whitelist as a broadcast SEMI JOIN, not an isInCollection literal:
          // a large host list inlined into codegen recompiles every wave (and
          // a real crawl's whitelist is millions of hosts — join-shaped)
          .join(broadcast(whitelistDF), Seq("host"), "left_semi")
          // first discovery wins when several pages link the same URL this wave
          .groupBy(col("url_hash"))
          .agg(min(struct(col("discoveredRank"), col("url"), col("host"),
            col("depth"), col("parent_url"))).as("c"))
          .select(col("url_hash"), col("c.*"))

        // -- URL-seen: shard-local Bloom fast path + exact anti-join (G4).
        // The merged bloom table's key-total aggregate doubles as the
        // materializing action for the unseen cache AND supplies the enqueued
        // count — one job instead of three. Built inside `buildBloom` so the
        // memory-mode commit can run it CONCURRENTLY with the frontier/seen
        // checkpoints: the lazy localCheckpoint call compiles the typed
        // merge plan eagerly on the driver (measured 1.5-5 s/wave), and run
        // serially that compile idles every executor — overlapped, it hides
        // under the checkpoint jobs.
        val unseen =
          (if (bloomBroadcast)
            UrlSeen.filterUnseen(candidates, seen, bloomDriver)
          else
            UrlSeen.filterUnseenSharded(candidates, seen, bloomTable, cfg.bloomShards))
            .persist(StorageLevel.MEMORY_AND_DISK)
        val seenDelta = unseen.select(col("url_hash"), col("url"))
        // buildBloom runs in a Future (memory mode) — it only READS the state
        // vars and stashes the wave's update in the pending slots; the main
        // thread applies them after Await (the join is the memory barrier)
        var pendingDriverDelta: SeenPreFilter      = null
        var pendingTable: Dataset[BloomShard]      = null
        val bloomTableNow  = bloomTable
        def buildBloom(): Long =
          if (bloomBroadcast) {
            val (delta, n) =
              if (cfg.seenFilter == "cuckoo")
                PartitionedCuckoo.buildWithCount(seenDelta.select(col("url_hash")),
                  cfg.bloomShards, cfg.bloomExpected)
              else
                PartitionedBloom.buildWithCount(seenDelta.select(col("url_hash")),
                  cfg.bloomShards, cfg.bloomExpected, cfg.bloomFpp)
            pendingDriverDelta = delta
            n
          } else {
            val bloomDelta = BloomTable.fromHashes(seenDelta.select(col("url_hash")),
              cfg.bloomShards, cfg.bloomExpected, cfg.bloomFpp)
            val nb = BloomTable.merge(bloomTableNow, bloomDelta)
              .localCheckpoint(false) // lazy: materialized by the totalKeys action
            pendingTable = nb
            BloomTable.totalKeys(nb) - seenTotal
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
        def mkMetricsDelta(unseenCount: Long) =
          fetched.groupBy(col("wave"), col("host")).agg(
            sum(when(col("ok"), 1L).otherwise(0L)).as("fetched"),
            sum(when(col("ok"), 0L).otherwise(1L)).as("errors"),
            sum(col("fetchMs")).as("fetchMsTotal"))
            .withColumn("urlsEnqueued", lit(unseenCount))

        // -- commit (G10): snapshot store (resumable) or localCheckpoint
        val unseenCount = store match {
          case Some(st) =>
            val n = phase("discover+seen", wave) { buildBloom() }
            val metricsDelta = mkMetricsDelta(n)
            st.commitWave(wave, newFrontier, seenDelta, docsDelta, orderDelta,
              metricsDelta)
            val f2 = st.readFrontier(wave).repartition(P, col("urlHash"))
              .persist(StorageLevel.MEMORY_AND_DISK)
            val s2 = newSeen.localCheckpoint(true)
            frontier.unpersist(); seen.unpersist()
            frontier = f2; seen = s2
            docsDeltas += st.readDelta(wave, "docs_delta")
            orderDeltas += st.readDelta(wave, "order_delta")
            metricsDeltas += st.readDelta(wave, "metrics_delta")
            unseen.unpersist(); fetched.unpersist()
            n
          case None =>
            // memory mode: deltas stay as views over the persisted `fetched`/
            // `unseen` caches, which live as long as the result does — no
            // per-wave checkpoint jobs and no final re-materialization of the
            // span data; only the iterative frontier/seen need lineage cuts.
            // The checkpoints AND the bloom build run as THREE concurrent
            // tasks: the jobs are independent (all three first-compute the
            // shared `unseen` cache, which the block manager serializes
            // per-partition), overlapping fills stage tails AND hides the
            // bloom plan's driver-side compile under executor work.
            import scala.concurrent.{Await, Future}
            import scala.concurrent.duration.Duration
            import scala.concurrent.ExecutionContext.Implicits.global
            val seenNow = seen
            val (f2, s2, n) = phase("state-ckpt+bloom", wave) {
              val ff = Future { newFrontier.localCheckpoint(true) }
              val bf = Future { buildBloom() }
              // seen only changes when the wave discovered something: chain
              // its checkpoint on the bloom future's count and skip the whole
              // 444k-row rewrite on leaf waves (bf materializes `unseen`, so
              // a started sf reuses the cache rather than recomputing)
              val sf = bf.flatMap { n =>
                if (n > 0L) Future { newSeen.localCheckpoint(true) }
                else Future.successful(seenNow)
              }
              (Await.result(ff, Duration.Inf), Await.result(sf, Duration.Inf),
                Await.result(bf, Duration.Inf))
            }
            frontier.unpersist()
            if (!(s2 eq seenNow)) seen.unpersist()
            frontier = f2; seen = s2
            docsDeltas += docsDelta
            orderDeltas += orderDelta
            metricsDeltas += mkMetricsDelta(n)
            cached += fetched; cached += unseen
            n
        }
        // apply the wave's bloom update (buildBloom already materialized it)
        if (bloomBroadcast) {
          if (unseenCount > 0L) bloomDriver.mergeWith(pendingDriverDelta)
        } else {
          bloomTable.unpersist()
          bloomTable = pendingTable
          seenTotal += unseenCount
        }
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
    def order(): DataFrame = {
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
    if (!bloomBroadcast) cached += bloomTable.toDF() // released with the result
    CrawlResult(frontier, seen, docs, () => order(), metrics, wave, totalFetches,
      cached.result())
  }

  private def shufflePartitions(spark: SparkSession): Int =
    spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

  private def union(spark: SparkSession, dfs: Seq[DataFrame], emptySchema: String): DataFrame =
    if (dfs.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(emptySchema))
    else dfs.reduce(_ unionByName _)

}
