package graft

import graft.crawl.WaveRunner
import graft.crawl.WaveRunner.CrawlConfig
import graft.synth.SyntheticSite
import graft.synth.SyntheticSite.SiteConfig
import java.nio.file.Files

/** Checkpointed resumability (SURVEY §2.8 G10, BASELINE.json): a crawl
  * interrupted after k committed waves and resumed must reach exactly the
  * state of an uninterrupted run; re-running a completed crawl is a no-op.
  */
class ResumeSpec extends SparkSpec {

  private val site    = SiteConfig(universities = 1, deptsPerU = 2,
    facultyPerDept = 6, errorFraction = 0.2)
  private val seeds   = SyntheticSite.seeds(site)
  private val fetcher = SyntheticSite.fetcher(site)

  private def stateOf(r: WaveRunner.CrawlResult) = {
    val order = r.crawlOrder.orderBy("seq").collect()
      .map(x => (x.getAs[String]("host"), x.getAs[String]("url"))).toVector
    val seen = r.seen.collect().map(_.getAs[String]("url")).toSet
    val frontier = r.frontier.collect()
      .map(x => (x.getAs[String]("url"), x.getAs[String]("status"))).toSet
    val docs = r.docs.collect().map(_.getAs[String]("url")).toSet
    (order, seen, frontier, docs)
  }

  test("interrupt after 2 waves + resume == uninterrupted run; re-resume is a no-op") {
    val dirA = Files.createTempDirectory("graft_resume_a").toString
    val full = WaveRunner.run(spark, seeds, fetcher, Nil,
      CrawlConfig(waveSeconds = 2.0, snapshotDir = Some(dirA)))
    val expected = stateOf(full)
    assert(full.waves === 4) // index wave + ceil(6/2)=3 profile waves

    val dirB = Files.createTempDirectory("graft_resume_b").toString
    // interrupted run: stop after 2 committed waves
    WaveRunner.run(spark, seeds, fetcher, Nil,
      CrawlConfig(waveSeconds = 2.0, snapshotDir = Some(dirB), maxWaves = 2))
    assert(new java.io.File(dirB).listFiles().count(_.getName.startsWith("wave=")) === 2)
    // resume to completion
    val resumed = WaveRunner.resume(spark, seeds, fetcher, Nil,
      CrawlConfig(waveSeconds = 2.0, snapshotDir = Some(dirB)))
    assert(stateOf(resumed) === expected)

    // resuming the completed crawl changes nothing and commits no new wave
    val again = WaveRunner.resume(spark, seeds, fetcher, Nil,
      CrawlConfig(waveSeconds = 2.0, snapshotDir = Some(dirB)))
    assert(stateOf(again) === expected)
    assert(new java.io.File(dirB).listFiles().count(_.getName.startsWith("wave=")) ===
      new java.io.File(dirA).listFiles().count(_.getName.startsWith("wave=")))
  }

  test("time travel: frontier/seen as-of wave w == a crawl stopped at wave w") {
    // Iceberg-snapshot semantics over the delta-commit log: for EVERY
    // committed wave w of a finished crawl, WaveSnapshots.frontierAsOf /
    // seenAsOf must reproduce exactly the state a crawl bounded to stop
    // after wave w would hold — across compaction (frontierDeltaMaxRows=1
    // forces a base mid-history, so reads exercise base+delta folds, not
    // just delta chains)
    import graft.crawl.{ParquetSnapshotStore, WaveSnapshots}
    import org.apache.spark.sql.functions.col
    val dirA = Files.createTempDirectory("graft_tt_a").toString
    val cfg = CrawlConfig(waveSeconds = 2.0, snapshotDir = Some(dirA),
      frontierDeltaMaxRows = 1)
    val full = WaveRunner.run(spark, seeds, fetcher, Nil, cfg)
    val store = new ParquetSnapshotStore(spark, dirA,
      spark.sessionState.conf.numShufflePartitions)
    val committed = store.listCommitted().sorted
    assert(committed.size === full.waves)
    assert(store.listFrontierBases().nonEmpty, "compaction must have fired")
    val seedRows = WaveRunner.seedFrontier(spark, seeds)
    def frontierSet(df: org.apache.spark.sql.DataFrame) = df
      .select("url", "status", "depth", "discoveredWave").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    def seenSet(df: org.apache.spark.sql.DataFrame) =
      df.select("url").collect().map(_.getString(0)).toSet
    // the wave-0 pre-state of the seen set, as resume builds it
    val seedSeen = seedRows.select(col("urlHash").as("url_hash"), col("url"))
    // first, middle, and last committed wave (dedup'd for short histories)
    Seq(committed.head, committed(committed.size / 2), committed.max)
      .distinct.foreach { w =>
        // truth: an independent crawl bounded to stop after wave w
        // (deterministic site + selector ⇒ identical history)
        val dirW = Files.createTempDirectory(s"graft_tt_w$w").toString
        val bounded = WaveRunner.run(spark, seeds, fetcher, Nil,
          cfg.copy(snapshotDir = Some(dirW), maxWaves = w + 1))
        assert(frontierSet(WaveSnapshots.frontierAsOf(store, seedRows, w)) ===
          frontierSet(bounded.frontier), s"frontier as-of wave $w")
        assert(seenSet(WaveSnapshots.seenAsOf(store, seedSeen, w)) ===
          seenSet(bounded.seen), s"seen as-of wave $w")
        bounded.release()
      }
    // append-only reads: docs through the last wave == the full crawl's docs
    val docsAll = WaveSnapshots.appendedAsOf(store, "docs_delta", committed.max)
    assert(docsAll.isDefined)
    assert(docsAll.get.select("url").collect().map(_.getString(0)).toSet ===
      full.docs.select("url").collect().map(_.getString(0)).toSet)
    // a never-committed wave is a loud error, not an empty read
    intercept[IllegalArgumentException] {
      WaveSnapshots.frontierAsOf(store, seedRows, committed.max + 1)
    }
    full.release()
  }

  test("every committed wave carries a manifest with per-partition lineage") {
    val dir = Files.createTempDirectory("graft_manifest").toString
    WaveRunner.run(spark, seeds, fetcher, Nil,
      CrawlConfig(waveSeconds = 4.0, snapshotDir = Some(dir)))
    val waves = new java.io.File(dir).listFiles().filter(_.getName.startsWith("wave="))
    assert(waves.nonEmpty)
    waves.foreach { w =>
      assert(new java.io.File(w, "_COMMITTED").exists())
      val manifest = Files.readString(new java.io.File(w, "manifest.json").toPath)
      assert(manifest.contains("\"wave\":"))
      assert(manifest.contains("\"partitions\":"))
      assert(manifest.contains("\"rows\":"))
    }
  }
}
