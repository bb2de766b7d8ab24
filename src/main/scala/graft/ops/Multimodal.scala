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
    *
    * The fake is keyed on the first 8 hex chars of MD5(payload) — chosen
    * (over a JVM-private mix) so the stub stays a pure function of the
    * payload BYTES that an independent SQL engine can replicate, which is
    * what gives `q_media_decode_stub` a DuckDB oracle (the driver gate
    * covers the whole binary → mapPartitions → aggregate path, not just its
    * row count).
    */
  def stubDecode(md: java.security.MessageDigest, docId: Long,
      payload: Array[Byte]): MediaMeta = {
    md.reset()
    val d = md.digest(payload)
    // first 4 digest bytes = first 8 hex chars, as an unsigned 32-bit value
    val z = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    val formats = Array("jpeg", "png", "wav", "mp4")
    MediaMeta(
      doc_id = docId,
      n_bytes = payload.length.toLong,
      format = formats((z % 4).toInt),
      width = 64 + ((z >> 8) % 1024).toInt,
      height = 64 + ((z >> 12) % 1024).toInt,
      n_frames = 1 + ((z >> 16) % 32).toInt)
  }

  /** Single-row convenience overload (tests): fresh digest per call. */
  def stubDecode(docId: Long, payload: Array[Byte]): MediaMeta =
    stubDecode(java.security.MessageDigest.getInstance("MD5"), docId, payload)

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
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, payload) => stubDecode(md, id, payload) }
      }
  }

  /** Decode metadata per doc, aggregated per fake format (exercises the full
    * binary → mapPartitions → relational-join-back path). Oracle-checkable:
    * the stub is a pure function of MD5(payload) — see [[mediaDecodeStubSql]].
    */
  def mediaDecodeStub(spark: SparkSession, dir: String): DataFrame =
    decodeStage(spark, withMedia(spark, dir)).toDF()
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n"), sum(col("n_bytes")).as("bytes"),
        sum(col("n_frames")).as("frames"))

  /** DuckDB replica of [[stubDecode]]'s arithmetic: z = the first 8 hex
    * chars of md5(text) as an unsigned 32-bit integer (the payload IS the
    * UTF-8 bytes of `text`, so md5(text) == md5(payload) on both engines),
    * then the same format/frame derivation. Sums cast to BIGINT to match
    * Spark's long (DuckDB widens BIGINT sums to HUGEINT).
    */
  val mediaDecodeStubSql: String =
    """WITH z AS (
      |  SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
      |    ( (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 268435456
      |    + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) * 16777216
      |    + (strpos('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 1048576
      |    + (strpos('0123456789abcdef', substr(md5(text), 4, 1)) - 1) * 65536
      |    + (strpos('0123456789abcdef', substr(md5(text), 5, 1)) - 1) * 4096
      |    + (strpos('0123456789abcdef', substr(md5(text), 6, 1)) - 1) * 256
      |    + (strpos('0123456789abcdef', substr(md5(text), 7, 1)) - 1) * 16
      |    + (strpos('0123456789abcdef', substr(md5(text), 8, 1)) - 1) ) AS z
      |  FROM documents)
      |SELECT
      |  CASE z % 4 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' WHEN 2 THEN 'wav'
      |    ELSE 'mp4' END AS format,
      |  count(*) AS n,
      |  CAST(sum(n_bytes) AS BIGINT) AS bytes,
      |  CAST(sum(1 + (z // 65536) % 32) AS BIGINT) AS frames
      |FROM z GROUP BY 1""".stripMargin

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
