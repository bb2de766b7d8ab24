package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media item (the output shape of the decode stage). */
final case class MediaMeta(doc_id: Long, n_bytes: Long, format: String,
    width: Int, height: Int, n_frames: Int)

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decode/feature stages as partition-local batch functions.
  *
  * The real decode (image/audio libs) is STUBBED — this container has no
  * codec libraries — behind [[Multimodal.stubDecode]], a deterministic fake
  * keyed on the payload hash. Everything Spark-side is real and tested:
  * binary column handling, schema, partition-batched execution shape
  * (`mapPartitions` — the Scala analog of `mapInPandas` batches), and the
  * metadata join-back.
  */
object Multimodal {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** documents with a synthesized binary payload column (`media: binary`) —
    * stands in for image/audio bytes; byte length is real (UTF-8 bytes).
    */
  def withMedia(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).withColumn("media", encode(col("text"), "UTF-8"))

  /** Oracle-checkable metadata over the binary column: byte length + a
    * derived frame count (1 frame per KiB, ceil).
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    withMedia(spark, dir).select(
      col("doc_id"),
      length(col("media")).cast("long").as("n_bytes"),
      ceil(length(col("media")).cast("double") / 1024.0).cast("int").as("n_frames"))

  val mediaMetaSql: String =
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
      |  CAST(ceil(strlen(text) / 1024.0) AS INT) AS n_frames
      |FROM documents""".stripMargin

  /** STUB decode: a deterministic fake "codec" — format/width/height derive
    * from a hash of the payload, NOT from real decoding. Replace the body
    * with an actual codec call when the runtime has one; the signature,
    * batching shape, and downstream schema are the real contract.
    */
  def stubDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    var z = java.util.Arrays.hashCode(payload).toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = z ^ (z >>> 31)
    val formats = Array("jpeg", "png", "wav", "mp4")
    MediaMeta(
      doc_id = docId,
      n_bytes = payload.length.toLong,
      format = formats(math.abs(z % 4).toInt),
      width = 64 + math.abs((z >> 8) % 1024).toInt,
      height = 64 + math.abs((z >> 24) % 1024).toInt,
      n_frames = 1 + math.abs((z >> 40) % 32).toInt)
  }

  /** The decode stage: partition-local batches over the binary column —
    * the executor-side shape a real codec pipeline has (open codec once per
    * partition, stream rows through it).
    */
  def decodeStage(spark: SparkSession, withMediaDF: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withMediaDF.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real pipeline: codec/session init here, once per partition
        it.map { case (id, payload) => stubDecode(id, payload) }
      }
  }

  /** Rows-only query: decode metadata per doc, aggregated per fake format
    * (exercises the full binary → mapPartitions → relational-join-back path).
    */
  def mediaDecodeStub(spark: SparkSession, dir: String): DataFrame =
    decodeStage(spark, withMedia(spark, dir)).toDF()
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n"), sum(col("n_bytes")).as("bytes"),
        sum(col("n_frames")).as("frames"))

  /** Frame sampling: fixed-stride slices of the payload, exploded to one row
    * per frame — the wire shape of a video frame sampler (slice, fan out,
    * fingerprint). The slicing itself needs NO codec, so unlike the decode
    * stage this is fully real and oracle-checkable: frame boundaries, counts,
    * and per-frame fingerprints are exact on both engines. Slices are
    * character-strided here (the sandbox payload is synthesized from text and
    * the oracle engine lacks blob slicing); a production sampler strides
    * bytes with the identical plan shape.
    *
    * Scale shape: one scan, row-local explode bounded by payload/stride, no
    * shuffle — per-frame work fans out WITHOUT materializing frames anywhere
    * but the operator's own output.
    */
  def frameSample(spark: SparkSession, dir: String, frameChars: Int = 1024): DataFrame = {
    val nf = greatest(ceil(length(col("text")) / frameChars.toDouble).cast("int"), lit(1))
    docs(spark, dir)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), nf - 1)).as("frame_no"))
      .withColumn("__frame",
        col("text").substr(col("frame_no") * frameChars + 1, lit(frameChars)))
      .select(col("doc_id"), col("frame_no"),
        length(col("__frame")).as("n_chars"),
        md5(col("__frame")).as("fp"))
  }

  val frameSampleSql: String =
    """SELECT doc_id, f AS frame_no,
      |  length(substring(text, f*1024 + 1, 1024)) AS n_chars,
      |  md5(substring(text, f*1024 + 1, 1024)) AS fp
      |FROM documents,
      |  unnest(generate_series(0,
      |    greatest(CAST(ceil(length(text)/1024.0) AS INT), 1) - 1)) AS t(f)""".stripMargin
}
