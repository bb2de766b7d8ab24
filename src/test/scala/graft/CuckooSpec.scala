package graft

import graft.frontier.{CuckooFilter, PartitionedCuckoo, UrlSeen}
import graft.synth.SyntheticSite
import graft.synth.SyntheticSite.SiteConfig
import graft.crawl.WaveRunner
import graft.crawl.WaveRunner.CrawlConfig
import graft.oracle.SequentialOracle
import org.scalacheck.Gen
import GenHelper.samples

/** Cuckoo-filter URL-seen variant (north rule: "Bloom/Cuckoo"): no false
  * negatives, working deletion, sane FPP, shard merge, and the full engine
  * running on it matches the sequential oracle.
  */
class CuckooSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives up to sizing; FPP stays near the 16-bit design point") {
    val cf = CuckooFilter.create(10000)
    val keys = (0L until 10000L).map(k => k * 0x9E3779B97F4A7C15L + 17)
    keys.foreach(k => assert(cf.put(k), s"insert failed below capacity for $k"))
    keys.foreach(k => assert(cf.mightContain(k), s"false negative for $k"))
    val probes = (1L to 100000L).map(k => -k * 0x517CC1B727220A95L)
    val fp = probes.count(cf.mightContain)
    // design ε ≈ 2·4/2^16 ≈ 0.012%; allow generous slack for the small sample
    assert(fp < 120, s"false-positive count $fp way above the design point")
  }

  test("deletion removes membership (the capability Bloom lacks)") {
    val cf = CuckooFilter.create(1000)
    (0L until 500L).foreach(k => assert(cf.put(k)))
    (0L until 500L by 2).foreach(k => assert(cf.remove(k), s"remove failed for $k"))
    (1L until 500L by 2).foreach(k => assert(cf.mightContain(k), s"lost surviving key $k"))
    val stillThere = (0L until 500L by 2).count(cf.mightContain)
    assert(stillThere < 10, s"$stillThere deleted keys still positive")
    assert(cf.size === 250L)
  }

  test("property: cuckoo pre-filter + exact anti-join never drops an unseen key") {
    val gen = for {
      seenKeys <- Gen.listOf(Gen.chooseNum(-5000L, 5000L)).map(_.distinct)
      candKeys <- Gen.nonEmptyListOf(Gen.chooseNum(-5000L, 5000L)).map(_.distinct)
    } yield (seenKeys, candKeys)
    samples(gen, 8).foreach { case (seenKeys, candKeys) =>
      val seen = seenKeys.toDF("url_hash")
      val cand = candKeys.toDF("url_hash")
      val pc = PartitionedCuckoo.build(seen, nShards = 4, expectedTotal = 16384)
      seenKeys.foreach(k => assert(pc.mightContain(k), "no false negatives"))
      val got = UrlSeen.filterUnseen(cand, seen, pc)
        .collect().map(_.getLong(0)).toSet
      assert(got === (candKeys.toSet -- seenKeys.toSet))
    }
  }

  test("shard merge: all keys of both sides survive") {
    val a = PartitionedCuckoo.empty(nShards = 8, expectedTotal = 4096)
    val b = PartitionedCuckoo.empty(nShards = 8, expectedTotal = 4096)
    (0L until 800L).foreach(a.put)
    (800L until 1600L).foreach(b.put)
    a.mergeWith(b)
    (0L until 1600L).foreach(k => assert(a.mightContain(k), s"lost $k in merge"))
  }

  test("full engine on the cuckoo seen-filter matches the sequential oracle") {
    val site = SiteConfig(universities = 2, deptsPerU = 2, facultyPerDept = 5,
      errorFraction = 0.2)
    val seeds   = SyntheticSite.seeds(site)
    val fetcher = SyntheticSite.fetcher(site)
    val oracle  = SequentialOracle.run(seeds, fetcher)
    val engine  = WaveRunner.run(spark, seeds, fetcher, Nil,
      CrawlConfig(seenFilter = "cuckoo"))
    val got = engine.crawlOrder.orderBy("seq").collect()
      .map(r => (r.getAs[String]("host"), r.getAs[String]("url"))).toVector
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val exp = oracle.crawlOrder.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(got === exp)
    assert(engine.seen.collect().map(_.getAs[String]("url")).toSet === oracle.seen)
    engine.release()
  }
}
