package graft.ops

import graft.SparkSpec

/** `TextOps.parallelized` sizes expensive per-row stages from file metadata
  * (no `df.rdd` on the common path). These cases pin the two estimate bounds
  * (ADVICE r4): a table of many sub-split files must still repartition (the
  * packed scan runs far fewer partitions than the per-file ceil sum), and a
  * non-file-backed DataFrame must fall back to the physical partition count
  * rather than silently never repartitioning.
  */
class ParallelizedSpec extends SparkSpec {
  import spark.implicits._

  private def target = spark.sparkContext.defaultParallelism

  test("many tiny files: packing bound triggers the repartition") {
    val dir = java.nio.file.Files.createTempDirectory("graft_manyfiles").toString
    // 3 * target tiny files — per-file ceil sum (= file count) clears the
    // core count, but the packed scan reads them as ~1 partition
    (1 to 3 * target * 10).map(i => (i.toLong, s"doc $i body"))
      .toDF("doc_id", "text")
      .repartition(3 * target)
      .write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
    assert(scan.inputFiles.length >= 3 * target)
    val out = TextOps.parallelized(scan)
    assert(out.rdd.getNumPartitions === target,
      "sub-split files must be respread across the cores")
  }

  test("single large-enough split estimate: no gratuitous shuffle is added") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fewfiles").toString
    (1 to 100).map(i => (i.toLong, s"doc $i"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    // shrink the split size so the one file estimates >= target splits
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "64")
      val scan = spark.read.parquet(dir)
      val out  = TextOps.parallelized(scan)
      assert(out eq scan, "estimate >= cores must leave the plan untouched")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("non-file-backed input: falls back to physical partition count") {
    val mem = (1 to 50).map(i => (i.toLong, s"m $i")).toDF("doc_id", "text").coalesce(1)
    assert(mem.inputFiles.isEmpty)
    val out = TextOps.parallelized(mem)
    assert(out.rdd.getNumPartitions === target)
  }
}
