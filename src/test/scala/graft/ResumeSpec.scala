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
