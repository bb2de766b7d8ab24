package graft

import graft.crawl.{Records, WaveRunner}
import graft.crawl.WaveRunner.CrawlConfig
import graft.model.FacultyRecord
import graft.oracle.SequentialOracle
import graft.synth.SyntheticSite
import graft.synth.SyntheticSite.SiteConfig

import org.apache.spark.sql.Row

/** The exactness gate (BASELINE.json north_rule): under the same seed list and
  * politeness budget, the engine's crawl ordering, URL-seen set, extracted
  * faculty records, and per-row span sequences must match the sequential
  * oracle — an independent re-statement of reference `scraper.py:14-163`.
  */
class CrawlOracleSpec extends SparkSpec {

  private def runBoth(site: SiteConfig, crawl: CrawlConfig = CrawlConfig()) = {
    val seeds   = SyntheticSite.seeds(site)
    val fetcher = SyntheticSite.fetcher(site)
    val oracle  = SequentialOracle.run(seeds, fetcher)
    val engine  = WaveRunner.run(spark, seeds, fetcher, Nil, crawl)
    (seeds, oracle, engine)
  }

  private def engineOrder(engine: WaveRunner.CrawlResult): Vector[(String, String)] =
    engine.crawlOrder.orderBy("seq").collect()
      .map(r => (r.getAs[String]("host"), r.getAs[String]("url"))).toVector

  private def engineRecords(spark: org.apache.spark.sql.SparkSession,
      engine: WaveRunner.CrawlResult, seeds: Seq[SyntheticSite.Seed]): Vector[FacultyRecord] =
    Records.facultyRecords(spark, engine.docs, seeds)
      .orderBy("seed_rank", "row_rank")
      .drop("seed_rank", "row_rank")
      .collect().map { r =>
        FacultyRecord(r.getAs[String]("name"), r.getAs[String]("title"),
          r.getAs[String]("university"), r.getAs[String]("department"),
          r.getAs[String]("email"),
          r.getSeq[String](r.fieldIndex("research_interests")).toList,
          r.getSeq[String](r.fieldIndex("publications")).toList,
          r.getAs[String]("profile_url"))
      }.toVector

  test("single host: global crawl ordering matches the sequential oracle exactly") {
    val site = SiteConfig(universities = 1, deptsPerU = 1, facultyPerDept = 6)
    val (_, oracle, engine) = runBoth(site)
    assert(engineOrder(engine) === oracle.crawlOrder)
  }

  test("forced shard-local bloom residency: ordering, seen, records unchanged") {
    // bloomBroadcastMaxBytes = 0 forces the Dataset[BloomShard] cogroup path
    // (the 10^10 residency) through the FULL engine — exactness must hold
    // identically to the broadcast regime
    val site = SiteConfig(universities = 2, deptsPerU = 2, facultyPerDept = 5,
      errorFraction = 0.2)
    val (seeds, oracle, engine) =
      runBoth(site, CrawlConfig(bloomBroadcastMaxBytes = 0L))
    val got = engineOrder(engine).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val exp = oracle.crawlOrder.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(got === exp)
    assert(engine.seen.collect().map(_.getAs[String]("url")).toSet === oracle.seen)
    assert(engineRecords(spark, engine, seeds) === oracle.records)
  }

  test("single host: URL-seen set and faculty records match exactly") {
    val site = SiteConfig(universities = 1, deptsPerU = 1, facultyPerDept = 6)
    val (seeds, oracle, engine) = runBoth(site)
    val engineSeen = engine.seen.collect().map(_.getAs[String]("url")).toSet
    assert(engineSeen === oracle.seen)
    assert(engineRecords(spark, engine, seeds) === oracle.records)
  }

  test("multi-host with errors, relative links, linkless rows: per-host order, seen, records") {
    val site = SiteConfig(universities = 2, deptsPerU = 2, facultyPerDept = 5,
      errorFraction = 0.25, relativeLinkFraction = 0.6, noLinkFraction = 0.15)
    val (seeds, oracle, engine) = runBoth(site)

    val gotByHost = engineOrder(engine).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expByHost = oracle.crawlOrder.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(gotByHost.keySet === expByHost.keySet)
    for (h <- expByHost.keySet)
      assert(gotByHost(h) === expByHost(h), s"per-host ordering diverged for $h")

    val engineSeen = engine.seen.collect().map(_.getAs[String]("url")).toSet
    assert(engineSeen === oracle.seen)
    assert(engineRecords(spark, engine, seeds) === oracle.records)
  }

  test("per-row span-sequence equality (kind, text, media_ref, order) for every document") {
    val site = SiteConfig(universities = 2, deptsPerU = 1, facultyPerDept = 4,
      errorFraction = 0.2)
    val (_, oracle, engine) = runBoth(site)
    val engineDocs: Map[String, Vector[(String, String, String, Int)]] =
      engine.docs.collect().map { r =>
        val spans = r.getAs[Seq[Row]]("spans").sortBy(_.getAs[Int]("offset")).map { s =>
          (s.getAs[String]("kind"), s.getAs[String]("text"),
            s.getAs[String]("media_ref"), s.getAs[Int]("offset"))
        }.toVector
        r.getAs[String]("url") -> spans
      }.toMap
    val oracleDocs = oracle.documents
      .map(d => d.doc_id -> d.spans.sortBy(_.offset)
        .map(s => (s.kind, s.text, s.media_ref, s.offset)).toVector).toMap
    assert(engineDocs.keySet === oracleDocs.keySet)
    for ((id, exp) <- oracleDocs)
      assert(engineDocs(id) === exp, s"span sequence diverged for $id")
  }

  test("wider budget (4 req/wave) preserves per-host ordering and final state") {
    val site = SiteConfig(universities = 1, deptsPerU = 2, facultyPerDept = 7)
    val (seeds, oracle, engine) = runBoth(site, CrawlConfig(waveSeconds = 4.0))
    val gotByHost = engineOrder(engine).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expByHost = oracle.crawlOrder.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    for (h <- expByHost.keySet)
      assert(gotByHost(h) === expByHost(h), s"per-host ordering diverged for $h")
    assert(engine.seen.collect().map(_.getAs[String]("url")).toSet === oracle.seen)
    assert(engineRecords(spark, engine, seeds) === oracle.records)
    // 7 profiles at 4/wave = ceil(7/4)=2 waves + index wave → 3 waves total
    assert(engine.waves === 3)
  }

  test("salted selection (skew path) leaves ordering and state unchanged") {
    val site = SiteConfig(universities = 1, deptsPerU = 1, facultyPerDept = 9)
    val (seeds, oracle, engine) =
      runBoth(site, CrawlConfig(waveSeconds = 3.0, saltShards = 4))
    assert(engineOrder(engine) === {
      // oracle order regrouped to the engine's wave-major commit order:
      // per-host sequences are the invariant; single host ⇒ identical
      oracle.crawlOrder
    })
    assert(engine.seen.collect().map(_.getAs[String]("url")).toSet === oracle.seen)
    assert(engineRecords(spark, engine, seeds) === oracle.records)
  }
}
