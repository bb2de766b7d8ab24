package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    // persist the NARROW (doc_id, n_tokens) projection: three consumers
    // (max-id scalar, bucket sums, the final windowed plan) previously each
    // re-scanned + re-TOKENIZED the corpus — the r5 verdict's flagged
    // two-driver-action shape. Now the corpus is scanned and tokenized ONCE;
    // the two scalar actions and the final plan read 16-byte cached rows
    // (guide §1.2/§5). Callers release via `clearCache()`.
    val d = TextOps.parallelized(docs(spark, dir))
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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

  // ---- deterministic corpus shuffle + training-shard assignment ----

  /** DuckDB replica of `conv(substring(md5(x), 1, 6), 16, 10)` — DuckDB has
    * no hex→int cast, so the 6-digit value is rebuilt arithmetically (the
    * engine-portable uniform hash proven for the media stub / stratified
    * sample).
    */
  private def md5Mod6Sql(x: String): String =
    (1 to 6).map { i =>
      s"(strpos('0123456789abcdef', substr(md5($x), $i, 1)) - 1)" +
        s" * ${math.pow(16, 6 - i).toLong}"
    }.mkString("( ", "\n      + ", " )")

  /** The trainer-facing global shuffle: every document gets a SHARD and a
    * position within it, both pure functions of `doc_id` (md5 order — no RNG
    * state, reproducible engine-to-engine and resumable mid-write). This is
    * the step that breaks source/domain locality before sequence packing, so
    * adjacent training sequences draw from the whole corpus.
    *
    * Scale shape: shard = row-local hash; position = a window PARTITIONED by
    * shard (one hash shuffle, per-shard local sort — with shards sized to
    * executors, each task sorts corpus/shards rows; no global sort, no
    * unpartitioned window).
    */
  val ShuffleShards: Int = 8

  def shuffleShard(spark: SparkSession, dir: String,
      shards: Int = ShuffleShards): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col("doc_id"))
    docs(spark, dir)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("__h"))
      .withColumn("shard",
        conv(substring(col("__h"), 1, 6), 16, 10).cast("long") % shards)
      .select(col("doc_id"), col("shard"),
        row_number().over(w).cast("long").as("pos"))
  }

  val shuffleShardSql: String =
    s"""SELECT doc_id, shard, CAST(row_number() OVER (
       |    PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
       |FROM (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
       |        ${md5Mod6Sql("CAST(doc_id AS VARCHAR)")} % $ShuffleShards AS shard
       |      FROM documents) s""".stripMargin

  // ---- cross-document boilerplate n-gram stats ----

  /** Per-document share of token n-grams that are corpus BOILERPLATE — grams
    * appearing in at least `minDocFracBp`/10000 of all documents (C4/CCNet
    * remove exactly this cross-document repeated material; the fraction
    * threshold keeps the semantics scale-free). Documents shorter than n
    * tokens have no grams and drop out, mirrored by the oracle.
    *
    * Scale shape: the gram projection is persisted so the corpus is scanned
    * ONCE across the frequency and scoring branches; document frequency is a
    * two-phase distinct-agg on the gram key; the boilerplate set is
    * BROADCAST back (bounded above by totalGramOccurrences/minDocs — a
    * frequency-thresholded set is small by construction); the only other
    * shuffle is the final doc-keyed count.
    */
  val BoilerplateMinDocFracBp: Long = 800L // gram in >= 8% of documents

  def boilerplateGrams(spark: SparkSession, dir: String, n: Int = 2,
      minDocFracBp: Long = BoilerplateMinDocFracBp): DataFrame = {
    val base = TextOps.parallelized(docs(spark, dir))
    // corpus row count from the RAW scan, not the parallelized() projection:
    // counting through the conditional repartition executed a full-width
    // round-robin shuffle of the corpus just to count rows (guide §2.4 —
    // remove shuffles outright); a bare parquet count reads no data columns
    val total = docs(spark, dir).count() // one scalar action, bounded at any scale
    // Persist the per-doc gram ARRAY (not the exploded rows): the document
    // frequency then needs only a row-local array_distinct + explode +
    // plain count — ONE aggregation phase — where the round-5 form ran
    // countDistinct(doc_id) over the exploded multiset, a two-phase
    // distinct-expand shuffle of every gram occurrence (guide §2.3:
    // aggregate before you shuffle; dedup row-local when the key allows).
    // Exactness: each (doc, gram) appears once after array_distinct, so
    // count(*) per gram ≡ countDistinct(doc_id). The scoring branch explodes
    // the same cached arrays for the occurrence counts.
    val garr = base
      .select(col("doc_id"), gramArr(TextOps.tokens(col("text")), n).as("gs"))
      // eager localCheckpoint, not persist (round 6, guide §5): the gram
      // arrays are consumed by the boilerplate-set BROADCAST subtree and the
      // scoring branch — concurrent jobs that each rebuilt a lazy cache, and
      // the array-heavy CachedBatch encode/decode cost more than the rows
      // (the minhashLshPairs finding)
      .localCheckpoint()
    val boiler = garr
      .select(explode(array_distinct(col("gs"))).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") * 10000L >= lit(total * minDocFracBp))
      .select(col("g"), lit(1L).as("__b"))
    garr.select(col("doc_id"), explode(col("gs")).as("g"))
      .join(broadcast(boiler), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__b"), lit(0L))).as("n_boiler"))
      .select(col("doc_id"), col("n_grams"), col("n_boiler"),
        expr("CAST((n_boiler * 10000) DIV n_grams AS BIGINT)").as("boiler_bp"))
  }

  def boilerplateGramsSql(n: Int = 2,
      minDocFracBp: Long = BoilerplateMinDocFracBp): String =
    s"""WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
       |            FROM documents),
       |grams AS (${gramRowsSql(n)}),
       |boiler AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) nd
       |                          FROM grams GROUP BY 1) f
       |           WHERE nd * 10000 >=
       |                 (SELECT count(*) FROM documents) * $minDocFracBp)
       |SELECT g.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |  CAST(sum(CASE WHEN b.g IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_boiler,
       |  CAST((sum(CASE WHEN b.g IS NULL THEN 0 ELSE 1 END) * 10000) // count(*)
       |       AS BIGINT) AS boiler_bp
       |FROM grams g LEFT JOIN boiler b ON g.g = b.g
       |GROUP BY g.doc_id""".stripMargin

  // ---- exact span dedup at token-chunk granularity ----

  /** Corpus-wide exact SPAN dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better", at fixed-chunk granularity): each
    * document's token stream is cut into disjoint `chunk`-token chunks
    * (trailing partial kept); a chunk occurrence SURVIVES iff it is the
    * corpus-wide first occurrence of that chunk text — ordered by
    * (doc_id, position), so later repeats across documents AND within one
    * document drop. Emits per-doc chunk counts and the REWRITTEN text
    * (surviving chunks re-joined in document order) — the payload a trainer
    * actually consumes. Token-less documents have no chunks and drop out,
    * mirrored by the oracle.
    *
    * Scale shape: ONE corpus scan; the chunk cut is row-local; keep-first is
    * a window PARTITIONED by chunk text (one hash shuffle on the chunk key —
    * the same shuffle an agg+join-back would pay, without the join); the
    * rebuild is a doc-keyed agg whose per-group state is bounded by the
    * document length. Nothing is quadratic and nothing collects.
    */
  val ChunkTokens: Int = 16

  def chunkDedup(spark: SparkSession, dir: String,
      chunk: Int = ChunkTokens): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("chunk")).orderBy(col("doc_id"), col("pos"))
    // the tokenless-doc guard lives INSIDE the explode expression, not in a
    // `.filter(size(toks) >= 1)` (round 6, guide §4.4): a filter over the
    // aliased token array was pushed below the projection with the tokenizer
    // SUBSTITUTED into the predicate — tokenizing every row twice (the same
    // duplication corpusPrep hit). posexplode of the empty CASE branch emits
    // no rows, so tokenless documents drop exactly as the filter dropped
    // them (NULL text → NULL size → ELSE branch — the filter's NULL
    // semantics too); `sequence(0, -1)` stepping DOWN is still unreachable.
    TextOps.parallelized(docs(spark, dir))
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), posexplode(expr(
        s"""CASE WHEN size(toks) >= 1 THEN
           |  transform(sequence(0, CAST((size(toks) - 1) DIV $chunk AS INT)),
           |    i -> concat_ws(' ', slice(toks, i * $chunk + 1, $chunk)))
           |ELSE array() END""".stripMargin)))
      .withColumnRenamed("col", "chunk")
      .withColumn("kept", (row_number().over(w) === 1).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("kept")).as("n_kept"),
        array_join(transform(array_sort(collect_list(
          when(col("kept") === 1L, struct(col("pos"), col("chunk"))))),
          x => x.getField("chunk")), " ").as("clean_text"))
  }

  def chunkDedupSql(chunk: Int = ChunkTokens): String =
    s"""WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
       |            FROM documents),
       |chunks AS (
       |  SELECT doc_id, i AS pos,
       |    array_to_string(list_slice(toks, i * $chunk + 1, i * $chunk + $chunk),
       |                    ' ') AS chunk
       |  FROM tok, unnest(CASE WHEN len(toks) >= 1
       |    THEN generate_series(0, (len(toks) - 1) // $chunk) ELSE [] END) AS t(i)),
       |flagged AS (
       |  SELECT doc_id, pos, chunk,
       |    CASE WHEN row_number() OVER (PARTITION BY chunk
       |                                 ORDER BY doc_id, pos) = 1
       |         THEN 1 ELSE 0 END AS kept
       |  FROM chunks)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(kept) AS BIGINT) AS n_kept,
       |  COALESCE(string_agg(CASE WHEN kept = 1 THEN chunk END, ' '
       |                      ORDER BY pos), '') AS clean_text
       |FROM flagged GROUP BY doc_id""".stripMargin

  // ---- vocabulary build + token-id encoding ----

  /** Trainer-facing tokenizer back-end: build the top-`v` corpus vocabulary
    * (frequency desc, token asc — a total order, so the cut at `v` is
    * deterministic on any engine), then encode every document as its id
    * sequence in token order, OOV as -1. Emits (doc_id, n_tokens, n_oov,
    * ids) — the arrays a sequence-packing stage consumes. Token-less
    * documents drop out (no sequence to emit), mirrored by the oracle.
    *
    * Scale shape: one corpus scan feeds a persisted positional token
    * projection used by BOTH branches; the frequency agg is token-keyed with
    * map-side partials; the top-`v` cut is TakeOrderedAndProject into a
    * bounded driver collect (v rows — the vocabulary is driver-sized by
    * definition) re-broadcast as the join side; the encode re-agg is
    * doc-keyed with per-group state bounded by document length.
    */
  val VocabSize: Int = 64

  def vocabEncode(spark: SparkSession, dir: String,
      v: Int = VocabSize): DataFrame = {
    import spark.implicits._
    val t = TextOps.parallelized(docs(spark, dir))
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
      .withColumnRenamed("col", "tok")
      .persist()
    val vocab = t.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(v)
      .collect() // bounded: exactly v rows
      .zipWithIndex.map { case (r, i) => (r.getString(0), i.toLong) }.toSeq
      .toDF("tok", "id")
    t.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("id").isNull, 1L).otherwise(0L)).as("n_oov"),
        transform(array_sort(collect_list(
          struct(col("pos"), coalesce(col("id"), lit(-1L)).as("id")))),
          x => x.getField("id")).as("ids"))
  }

  def vocabEncodeSql(v: Int = VocabSize): String =
    s"""WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
       |            FROM documents),
       |t AS (SELECT doc_id, unnest(toks) AS tok,
       |             generate_subscripts(toks, 1) AS pos
       |      FROM tok),
       |vocab AS (
       |  SELECT tok, CAST(row_number() OVER (ORDER BY n DESC, tok) - 1 AS BIGINT) AS id
       |  FROM (SELECT tok, count(*) AS n FROM t GROUP BY tok
       |        ORDER BY n DESC, tok LIMIT $v))
       |SELECT t.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  list(COALESCE(v.id, -1) ORDER BY t.pos) AS ids
       |FROM t LEFT JOIN vocab v USING (tok)
       |GROUP BY t.doc_id""".stripMargin

  // ---- shared n-gram plumbing (repetition stats + decontamination) ----

  /** Row-local token k-grams joined with single spaces — the fused native
    * scan ([[graft.functions.WordGrams]]) when a session is active (same
    * registration pattern as `TextOps.tokens`); HOF fallback + parity spec
    * below.
    */
  private def gramArr(toks: Column, k: Int): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) =>
        graft.functions.TextExprs.register(s)
        graft.functions.TextExprs.grams(toks, k)
      case None => gramArrHof(toks, k)
    }

  /** HOF reference form of [[gramArr]]. `sequence(1, 0)` in Spark counts
    * DOWN (step −1), so short docs must short-circuit to an empty array
    * explicitly.
    */
  private[graft] def gramArrHof(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - lit(k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** DuckDB mirror of [[gramArr]] exploded to one row per gram position:
    * 1-based list slicing, `generate_series(1, 0)` is empty (unlike Spark).
    */
  private def gramRowsSql(k: Int): String = {
    val joined = (0 until k).map(j => s"toks[i + $j]").mkString(" || ' ' || ")
    s"""SELECT doc_id, $joined AS g
       |FROM tok, unnest(CASE WHEN len(toks) >= $k
       |  THEN generate_series(1, len(toks) - ${k - 1}) ELSE [] END) AS t(i)"""
      .stripMargin
  }

  // ---- repetition stats (Gopher-style repetition filters) ----

  /** Per-document repetition signals in integer basis points (the quality-
    * filter family of Rae et al.'s Gopher corpus rules): duplicate-token
    * fraction, the most frequent bigram's share of all bigrams, and the
    * share of trigram occurrences whose trigram repeats. Integer `DIV`
    * arithmetic end-to-end so the DuckDB oracle hashes exactly.
    *
    * Scale shape: ONE corpus scan. Token/distinct counts are row-local; the
    * bigram and trigram multiplicity profiles ride a single tagged explode
    * through two partial-aggregating shuffles (gram-keyed count, then
    * doc-keyed fold). A zero-width sentinel element per doc keeps empty and
    * one-token documents in the output without a join back to the base.
    */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame = {
    val d = TextOps.parallelized(docs(spark, dir))
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n"),
        size(array_distinct(col("toks"))).cast("long").as("nd"),
        explode(concat(
          array(struct(lit(0).as("k"), lit("").as("g"))), // per-doc sentinel
          transform(gramArr(col("toks"), 2),
            g => struct(lit(2).as("k"), g.as("g"))),
          transform(gramArr(col("toks"), 3),
            g => struct(lit(3).as("k"), g.as("g"))))).as("e"))
    d.groupBy(col("doc_id"), col("e.k").as("k"), col("e.g").as("g"))
      .agg(count(lit(1)).as("c"), first(col("n")).as("n"), first(col("nd")).as("nd"))
      .groupBy(col("doc_id"))
      .agg(
        first(col("n")).as("n"), first(col("nd")).as("nd"),
        max(when(col("k") === 2, col("c"))).as("bmx"),
        sum(when(col("k") === 2, col("c"))).as("btot"),
        sum(when(col("k") === 3 && col("c") >= 2, col("c"))).as("tdup"),
        sum(when(col("k") === 3, col("c"))).as("ttot"))
      .select(col("doc_id"), col("n").as("n_tokens"),
        expr("CAST(CASE WHEN n > 0 THEN ((n - nd) * 10000) DIV n ELSE 0 END AS BIGINT)")
          .as("dup_token_bp"),
        expr("CAST(coalesce((bmx * 10000) DIV btot, 0) AS BIGINT)").as("top_bigram_bp"),
        expr("CAST(coalesce((tdup * 10000) DIV ttot, 0) AS BIGINT)").as("dup_trigram_bp"))
  }

  val repetitionStatsSql: String =
    s"""WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
       |            FROM documents),
       |base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) n,
       |                CAST(len(list_distinct(toks)) AS BIGINT) nd FROM tok),
       |bagg AS (SELECT doc_id, max(c) mx, sum(c) tot,
       |                sum(CASE WHEN c >= 2 THEN c ELSE 0 END) dup
       |         FROM (SELECT doc_id, g, count(*) c FROM (${gramRowsSql(2)})
       |               GROUP BY 1, 2) GROUP BY 1),
       |tagg AS (SELECT doc_id, max(c) mx, sum(c) tot,
       |                sum(CASE WHEN c >= 2 THEN c ELSE 0 END) dup
       |         FROM (SELECT doc_id, g, count(*) c FROM (${gramRowsSql(3)})
       |               GROUP BY 1, 2) GROUP BY 1)
       |SELECT b.doc_id AS doc_id, b.n AS n_tokens,
       |  CAST(CASE WHEN b.n > 0 THEN ((b.n - b.nd) * 10000) // b.n ELSE 0 END
       |       AS BIGINT) AS dup_token_bp,
       |  CAST(COALESCE((ba.mx * 10000) // ba.tot, 0) AS BIGINT) AS top_bigram_bp,
       |  CAST(COALESCE((ta.dup * 10000) // ta.tot, 0) AS BIGINT) AS dup_trigram_bp
       |FROM base b LEFT JOIN bagg ba ON b.doc_id = ba.doc_id
       |            LEFT JOIN tagg ta ON b.doc_id = ta.doc_id""".stripMargin

  // ---- decontamination (eval-set n-gram overlap) ----

  /** Flag training documents sharing token n-grams with a held-out eval
    * split (test-set decontamination). The eval split is derived
    * deterministically here (`doc_id % evalMod == 0`) so the oracle can
    * reproduce it; a production pipeline passes its benchmark table instead.
    * Default n=3 gives measurable overlap on the synthetic corpus — real
    * decontamination runs 8-13-gram windows, which is only a parameter.
    *
    * Scale shape: per-doc DISTINCT grams are computed row-local
    * (`array_distinct` before the explode — no dedup shuffle), the projected
    * gram table is persisted so the corpus is scanned once across the eval
    * and train branches, and the eval side is BROADCAST: benchmark suites
    * are tiny next to a 100-TB corpus, so contamination marking is a
    * map-side join; the only shuffle is the final doc-keyed count.
    */
  def decontaminate(spark: SparkSession, dir: String, n: Int = 3,
      evalMod: Long = 13L): DataFrame = {
    val grams = TextOps.parallelized(docs(spark, dir))
      .select(col("doc_id"), array_distinct(gramArr(TextOps.tokens(col("text")), n)).as("gs"))
      .select(col("doc_id"), size(col("gs")).cast("long").as("n_grams"),
        explode(col("gs")).as("g"))
      // eager localCheckpoint: the eval side is a broadcast subtree racing
      // the train branch over a lazy cache (see boilerplateGrams)
      .localCheckpoint()
    val ev = grams.filter(col("doc_id") % evalMod === 0)
      .select(col("g")).distinct().withColumn("__hit", lit(1L))
    grams.filter(col("doc_id") % evalMod =!= 0)
      .join(broadcast(ev), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(first(col("n_grams")).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .select(col("doc_id"), col("n_grams"), col("n_hits"),
        expr("CAST((n_hits * 10000) DIV n_grams AS BIGINT)").as("contaminated_bp"))
  }

  def decontaminateSql(n: Int = 3, evalMod: Long = 13L): String =
    s"""WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
       |            FROM documents),
       |grams AS (SELECT DISTINCT doc_id, g FROM (${gramRowsSql(n)})),
       |ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % $evalMod = 0),
       |tr AS (SELECT doc_id, g FROM grams WHERE doc_id % $evalMod <> 0),
       |hits AS (SELECT t.doc_id AS doc_id, count(*) nh
       |         FROM tr t JOIN ev e USING (g) GROUP BY 1),
       |tot AS (SELECT doc_id, count(*) ng FROM tr GROUP BY 1)
       |SELECT t.doc_id AS doc_id, CAST(t.ng AS BIGINT) AS n_grams,
       |  CAST(COALESCE(h.nh, 0) AS BIGINT) AS n_hits,
       |  CAST((COALESCE(h.nh, 0) * 10000) // t.ng AS BIGINT) AS contaminated_bp
       |FROM tot t LEFT JOIN hits h ON t.doc_id = h.doc_id""".stripMargin

  // ---- domain-mix quota capping ----

  /** Per-source document quotas (a training mix's per-domain caps),
    * complementing [[sampleStratified]]'s rate-based thinning: each source
    * keeps its first `quota` documents in a deterministic shuffled order
    * (md5 of the doc id, doc_id tiebreak — reproducible engine-to-engine,
    * no RNG state). The window is PARTITIONED by source, so at corpus scale
    * each domain ranks locally after one hash shuffle; no global sort.
    */
  val MixQuotas: Map[String, Long] = Map("src0" -> 5L, "src1" -> 40L)
  val MixDefaultQuota: Long = 12L

  def domainMixCap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val quota = MixQuotas.toSeq.sortBy(_._1)
      .foldRight(lit(MixDefaultQuota): Column) { case ((s, q), els) =>
        when(col("source") === s, lit(q)).otherwise(els)
      }
    // NO parallelized() here (round 6, guide §2.4 — remove shuffles
    // outright): unlike the tokenizing operators, this query has no
    // expensive per-row stage before its window — the md5 sort key is
    // evaluated after the window's own source-keyed exchange, which
    // redistributes the rows regardless, so the conditional round-robin
    // repartition was a second full shuffle of the corpus rows for nothing.
    docs(spark, dir)
      .select(col("doc_id"), col("source"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= quota)
  }

  val domainMixCapSql: String = {
    val cases = MixQuotas.toSeq.sortBy(_._1)
      .map { case (s, q) => s"WHEN source = '$s' THEN $q" }.mkString(" ")
    s"""SELECT doc_id, source, CAST(rn AS BIGINT) AS rn FROM (
       |  SELECT doc_id, source, row_number() OVER (
       |    PARTITION BY source
       |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM documents) r
       |WHERE rn <= (CASE $cases ELSE $MixDefaultQuota END)""".stripMargin
  }
}
