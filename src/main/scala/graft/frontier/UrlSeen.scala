package graft.frontier

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** URL-seen set: partitioned Bloom pre-filter + exact anti-join
  * (SURVEY.md §2.8 G4; BASELINE.json: "URL-seen is a partitioned Bloom/Cuckoo
  * filter keyed by canonicalized-URL xxHash64").
  *
  * Exactness contract: the Bloom alone has false positives, which would
  * wrongly DROP unseen URLs if trusted. It is therefore only the cheap
  * fast-path: candidates whose shard-Bloom probe is NEGATIVE are definitely
  * unseen and skip the join; probe-positive candidates (rare: FPP + true
  * dups) go through the exact `left_anti` join against the seen table. The
  * resulting seen set is exactly the reference's (reference dedup grounding:
  * `main.py:187-190` natural-key probes; `scraper.py:43-63` one fetch per
  * discovered URL).
  *
  * Scale math (10^10 URLs, the north-rule frontier): 1% FPP needs ~9.6
  * bits/key → ~12 GB of Bloom total. Sharded by `pmod(url_hash, nShards)`
  * into 1024 shards that is ~12 MB/shard; executors probing a co-partitioned
  * candidate stream touch exactly one shard per partition. In this sandbox
  * the shard array is driver-held and broadcast whole (MB-scale at test SF);
  * the sharding scheme — not the residency — is what carries to 10^10.
  */
final class PartitionedBloom(val nShards: Int, val shards: Array[BloomFilter])
    extends Serializable {
  def shardOf(hash: Long): Int = (((hash % nShards) + nShards) % nShards).toInt
  def mightContain(hash: Long): Boolean = shards(shardOf(hash)).mightContainLong(hash)
  def put(hash: Long): Unit = { shards(shardOf(hash)).putLong(hash); () }
  /** Merge a same-shape delta in place (shards built with identical sizing). */
  def mergeInPlace(delta: PartitionedBloom): Unit = {
    require(delta.nShards == nShards, "incompatible bloom sharding")
    var i = 0
    while (i < nShards) { shards(i).mergeInPlace(delta.shards(i)); i += 1 }
  }
}

object PartitionedBloom {
  /** Shards sized for `expectedTotal` keys at `fpp` — fixed at crawl start so
    * per-wave deltas stay merge-compatible.
    */
  def empty(nShards: Int, expectedTotal: Long, fpp: Double): PartitionedBloom = {
    val perShard = math.max(64L, expectedTotal / nShards)
    new PartitionedBloom(nShards,
      Array.fill(nShards)(BloomFilter.create(perShard, fpp)))
  }

  /** Build a delta Bloom from a DataFrame of `url_hash: long`, distributed:
    * each shard is assembled from its hash-range partition, then the (small,
    * fixed-size) shard filters are collected and merged driver-side.
    */
  def build(hashes: DataFrame, nShards: Int, expectedTotal: Long, fpp: Double): PartitionedBloom =
    buildWithCount(hashes, nShards, expectedTotal, fpp)._1

  /** Like [[build]] but also returns the input row count, piggybacked on the
    * same job — callers needing both (the wave loop) save a full action.
    */
  def buildWithCount(hashes: DataFrame, nShards: Int, expectedTotal: Long,
      fpp: Double): (PartitionedBloom, Long) = {
    val spark = hashes.sparkSession
    import spark.implicits._
    val perShard = math.max(64L, expectedTotal / nShards)
    val pb = empty(nShards, expectedTotal, fpp)
    val shardBlooms = hashes
      .select(col("url_hash").cast("long"))
      .as[Long]
      .groupByKey(h => (((h % nShards) + nShards) % nShards).toInt)
      .mapGroups { (shard, it) =>
        val bf = BloomFilter.create(perShard, fpp)
        var n  = 0L
        it.foreach { h => bf.putLong(h); n += 1 }
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        (shard, bos.toByteArray, n)
      }
      .collect()
    shardBlooms.foreach { case (shard, bytes, _) =>
      pb.shards(shard).mergeInPlace(
        BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes)))
    }
    (pb, shardBlooms.map(_._3).sum)
  }
}

object UrlSeen {

  /** Split `candidates` (must carry `url_hash`) into definitely-unseen rows
    * (Bloom-negative fast path, no join) plus exactly-verified rows
    * (Bloom-positive, rescued by `left_anti` against `seen`). Returns rows of
    * `candidates` whose url_hash is NOT in the seen set — exactly.
    *
    * @param seen DataFrame with `url_hash: long`, hash-partitioned upstream
    *             so the anti-join's probe side shuffles minimally.
    */
  def filterUnseen(candidates: DataFrame, seen: DataFrame, bloom: PartitionedBloom): DataFrame = {
    val spark = candidates.sparkSession
    val bc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((h: Long) => bc.value.mightContain(h))
    val flagged = candidates.withColumn("__maybe_seen", mightContain(col("url_hash")))
    val fastPath = flagged.filter(!col("__maybe_seen")).drop("__maybe_seen")
    val needExact = flagged.filter(col("__maybe_seen")).drop("__maybe_seen")
    val rescued = needExact.join(
      seen.select(col("url_hash")).hint("shuffle_hash"),
      Seq("url_hash"), "left_anti")
    fastPath.unionByName(rescued)
  }
}
