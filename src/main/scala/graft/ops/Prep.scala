package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data PREPARATION operators over `documents` — the steps a corpus
  * pipeline runs between dedup/quality and the trainer: PII redaction,
  * deterministic stratified sampling (training-mix weights), and sequence
  * packing (token-budget binning). All three are DuckDB-oracled end-to-end;
  * every per-row stage is a codegen'd Catalyst expression (no UDFs).
  */
object Prep {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  // ---- PII redaction ----

  /** Shared regex dialect: these patterns use only syntax with identical
    * semantics in Java regex (Spark) and RE2 (DuckDB) — char classes,
    * bounded repetition, alternation; no backrefs or lookarounds.
    */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRe = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  /** Redact emails then phone numbers (order matters and is mirrored in the
    * oracle — the email replacement token contains no digits, so it can
    * never create a phone match). Emits the per-doc hit counts and the md5
    * of the redacted text, so the oracle hash-checks the full rewritten
    * string without shipping it.
    */
  def redactPii(spark: SparkSession, dir: String): DataFrame = {
    val redacted = regexp_replace(
      regexp_replace(col("text"), EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")
    TextOps.parallelized(docs(spark, dir))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
        length(redacted).cast("long").as("redacted_len"),
        md5(redacted).as("redacted_md5"))
  }

  val redactPiiSql: String = {
    // DuckDB regexp_replace needs the 'g' option for replace-all (Spark's
    // replaces all by default); patterns are the shared literals verbatim
    // (SQL single-quoted strings keep backslashes as-is)
    val em = EmailRe
    val ph = PhoneRe
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$em')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$ph')) AS BIGINT) AS n_phones,
       |  CAST(length(redacted) AS BIGINT) AS redacted_len,
       |  md5(redacted) AS redacted_md5
       |FROM (SELECT doc_id, text,
       |        regexp_replace(regexp_replace(text, '$em', '<EMAIL>', 'g'),
       |                       '$ph', '<PHONE>', 'g') AS redacted
       |      FROM documents) r""".stripMargin
  }

  // ---- deterministic stratified sampling (training-mix weights) ----

  /** Per-language keep rates in basis points (0..10000) — the up/down-
    * sampling weights of a training mix. Deterministic: the keep decision
    * hashes only the doc id (md5 of its decimal string, first 6 hex digits
    * mod 10000 — the engine-portable uniform hash proven for the media
    * stub), so the sample is reproducible run-to-run and engine-to-engine,
    * needs no global state, and is row-local at any scale.
    */
  val SampleRatesBp: Map[String, Long] = Map("en" -> 5000L, "de" -> 2500L)
  val SampleDefaultBp: Long = 10000L

  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val hex = md5(col("doc_id").cast("string"))
    val z = conv(substring(hex, 1, 6), 16, 10).cast("long") % 10000L
    val rate = SampleRatesBp.foldRight(lit(SampleDefaultBp): org.apache.spark.sql.Column) {
      case ((l, bp), els) => when(col("lang") === l, lit(bp)).otherwise(els)
    }
    docs(spark, dir)
      .withColumn("__z", z)
      .filter(col("__z") < rate)
      .select(col("doc_id"), col("lang"), col("__z").as("sample_key"))
  }

  val sampleStratifiedSql: String = {
    // DuckDB has no hex→int cast; rebuild the 6-digit value arithmetically
    // (same trick as the media-stub oracle)
    val digits = (1 to 6).map { i =>
      s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1)" +
        s" * ${math.pow(16, 6 - i).toLong}"
    }.mkString("( ", "\n      + ", " )")
    val cases = SampleRatesBp.toSeq.sortBy(_._1)
      .map { case (l, bp) => s"WHEN lang = '$l' THEN $bp" }.mkString(" ")
    s"""SELECT doc_id, lang, sample_key FROM (
       |  SELECT doc_id, lang, $digits % 10000 AS sample_key
       |  FROM documents) s
       |WHERE sample_key < (CASE $cases ELSE $SampleDefaultBp END)""".stripMargin
  }

  // ---- sequence packing (token-budget binning) ----

  /** Concat-and-slice packing (the pretraining shape): documents in doc_id
    * order form one global token stream sliced into `seqLen`-token windows;
    * each doc reports its stream offset and the [start_bin, end_bin] window
    * span it lands in (docs may straddle window boundaries — that IS the
    * packing discipline).
    *
    * Scale shape: the global running sum is NOT an unpartitioned window
    * (PlanSpec bans those — one task would stream every document). Same
    * two-phase pattern as the crawl-order sequence: doc_ids are range-
    * bucketed (order-preserving), per-bucket token sums prefix-sum on the
    * driver (O(buckets) scalars), and the intra-bucket running sum is a
    * bucket-partitioned window joined back to its bucket's offset.
    */
  def packSequences(spark: SparkSession, dir: String, seqLen: Long = 512L,
      buckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = TextOps.parallelized(docs(spark, dir))
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    val maxRow = d.agg(max(col("doc_id"))).head()
    val maxId  = if (maxRow.isNullAt(0)) -1L else maxRow.getLong(0) // empty table → empty result
    val span  = math.max(1L, (maxId + buckets) / buckets) // ceil((max+1)/buckets)
    val withB = d.withColumn("__b", (col("doc_id") / span).cast("int"))
    val bucketSums = withB.groupBy(col("__b")).agg(sum(col("n_tokens")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until buckets).scanLeft(0L) {
      case (acc, b) => acc + bucketSums.getOrElse(b, 0L)
    }.dropRight(1).zipWithIndex.map { case (off, b) => (b, off) }
    val sp = d.sparkSession
    import sp.implicits._
    val offDF = broadcast(offsets.toDF("__b", "__off"))
    val w = Window.partitionBy(col("__b")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(offDF, Seq("__b"))
      .withColumn("__cum", col("__off") + sum(col("n_tokens")).over(w))
      .select(
        col("doc_id"), col("n_tokens"),
        expr(s"CAST((__cum - n_tokens) DIV $seqLen AS BIGINT)").as("start_bin"),
        expr(s"CAST(greatest(__cum - 1, __cum - n_tokens) DIV $seqLen AS BIGINT)")
          .as("end_bin"))
  }

  def packSequencesSql(seqLen: Long = 512L): String =
    s"""SELECT doc_id, n AS n_tokens, (cum - n) // $seqLen AS start_bin,
       |  greatest(cum - 1, cum - n) // $seqLen AS end_bin
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n,
       |    CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+')))
       |      OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM documents) c""".stripMargin
}
