package graft.crawl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Iceberg-shaped wave-snapshot table interface (SURVEY §7.4): the narrow
  * surface a real table catalog (Iceberg / Delta) drops into. The crawl
  * engine speaks ONLY to this trait — commit one wave's five outputs
  * atomically, list committed waves, read a wave's frontier or deltas back.
  *
  * Catalog mapping: `commitWave` = one table snapshot/commit per wave (the
  * manifest carries the wave id, parent snapshot, and per-partition lineage
  * — Iceberg's snapshot + manifest-list roles); `listCommitted` = snapshot
  * log; `readFrontier`/`readDelta` = time-travel reads of a snapshot.
  */
trait WaveStore {
  /** Committed wave ids (unordered). */
  def listCommitted(): Seq[Int]
  /** Atomically commit one wave: all five outputs + manifest, then the
    * commit marker — a reader never observes a partial wave.
    */
  def commitWave(wave: Int, frontier: DataFrame, seenDelta: DataFrame,
      docsDelta: DataFrame, orderDelta: DataFrame, metricsDelta: DataFrame): Unit
  def readFrontier(wave: Int): DataFrame
  /** kind ∈ {seen_delta, docs_delta, order_delta, metrics_delta}. */
  def readDelta(wave: Int, kind: String): DataFrame
}

/** No-catalog-jar implementation (the sandbox has no Iceberg jar): parquet
  * data files + JSON manifest + `_COMMITTED` marker as the atomic commit.
  */
final class ParquetSnapshotStore(spark: SparkSession, dir: String,
    partitions: Int) extends WaveStore {

  private def wdir(wave: Int): String = f"$dir/wave=$wave%05d"

  override def listCommitted(): Seq[Int] = {
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

  override def commitWave(wave: Int, frontier: DataFrame, seenDelta: DataFrame,
      docsDelta: DataFrame, orderDelta: DataFrame, metricsDelta: DataFrame): Unit = {
    val w = wdir(wave)
    frontier.write.mode("overwrite").parquet(s"$w/frontier")
    seenDelta.write.mode("overwrite").parquet(s"$w/seen_delta")
    docsDelta.write.mode("overwrite").parquet(s"$w/docs_delta")
    orderDelta.write.mode("overwrite").parquet(s"$w/order_delta")
    metricsDelta.write.mode("overwrite").parquet(s"$w/metrics_delta")
    writeManifest(w, wave)
    Files.writeString(Paths.get(s"$w/_COMMITTED"), "1")
    ()
  }

  override def readFrontier(wave: Int): DataFrame =
    spark.read.parquet(s"${wdir(wave)}/frontier")

  override def readDelta(wave: Int, kind: String): DataFrame =
    spark.read.parquet(s"${wdir(wave)}/$kind")

  /** Iceberg-style commit manifest: wave id, input snapshot, and per-partition
    * lineage (logical hash partition of the frontier → row count) —
    * BASELINE.json: "per-partition lineage and checkpointed resumability".
    */
  private def writeManifest(w: String, wave: Int): Unit = {
    val parts = spark.read.parquet(s"$w/frontier")
      .groupBy(pmod(col("urlHash"), lit(partitions)).as("pt")).count()
      .collect().sortBy(_.getLong(0))
      .map(r => s"""{"partition":${r.getLong(0)},"rows":${r.getLong(1)}}""")
      .mkString("[", ",", "]")
    val json =
      s"""{"wave":$wave,"inputSnapshot":${wave - 1},"partitions":$parts,"format":"parquet-v1"}"""
    Files.writeString(Paths.get(s"$w/manifest.json"), json)
    ()
  }
}
