package graft.relational

import graft.ops.TextOps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Inverted-index (term → posting list) text search — the engine's analog of
  * the reference's GIN full-text indexes on research interests and
  * publication titles (`database/schema.sql:65,84`).
  *
  * The reference declares text search a first-class ACCESS PATH, not a scan:
  * at 100 TB a keyword search must probe a posting table (one broadcast join
  * of the query terms + one aggregate over matching postings), never
  * `contains()`-scan the corpus. `Star.search`'s substring filters stay for
  * reference-parity of the API semantics; [[searchTokens]] is the scale path
  * for token queries.
  *
  * At scale the posting table is materialized once (partitioned/bucketed by
  * `term`) and reused across queries; here it is built in-plan and persisted
  * for the query's own multi-use (release via `clearCache()`).
  */
object InvertedIndex {

  /** Posting rows (id, term) from a text column: distinct non-stopword
    * tokens, one row per (document, term). One explode + nothing else —
    * building the index is a single pass over the corpus.
    */
  def postings(df: DataFrame, idCol: String, text: Column): DataFrame =
    df.select(col(idCol), explode(TextOps.contentTokens(text)).as("term"))

  /** Ids whose posting sets contain ALL `terms` (AND semantics): probe the
    * posting table with a broadcast of the query terms, count distinct hits
    * per id, keep full matches. Work is O(postings of the query terms), not
    * O(corpus).
    */
  def searchTokens(postings: DataFrame, idCol: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val spark = postings.sparkSession
    import spark.implicits._
    val q = terms.distinct.map(_.toLowerCase).toDF("term")
    postings.join(broadcast(q), "term")
      .groupBy(col(idCol))
      .agg(countDistinct(col("term")).as("n_hit"))
      .filter(col("n_hit") === terms.distinct.length)
  }

  /** Oracle query (`q_text_search`): build postings over `documents`, derive
    * the query as the corpus's two most frequent index terms (deterministic:
    * count desc, term asc — self-contained at any SF), AND-search them, and
    * return the matching documents. The posting projection is persisted — it
    * feeds both the query-term derivation and the probe.
    */
  def textSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = postings(docs, "doc_id", col("text"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val queryTerms = p.groupBy(col("term")).count()
      .orderBy(col("count").desc, col("term").asc)
      .limit(2)
      .select(col("term"))
    // postings are DISTINCT per (doc_id, term) by construction — [[postings]]
    // explodes `contentTokens`, whose array_except dedups the token array —
    // so count(*) ≡ countDistinct(term) per doc. The countDistinct form
    // planned a two-exchange distinct-expand chain (hash on (doc_id, term),
    // re-hash on doc_id); the plain count is ONE partial-aggregating
    // exchange on doc_id (guide §2.3/§2.4 — round 6).
    val matched = p.join(broadcast(queryTerms), "term")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === 2)
    docs.join(matched, "doc_id")
      .select(col("doc_id"), col("source"), col("n_hit"))
  }

  val textSearchSql: String = {
    val stops = TextOps.Stopwords.mkString("['", "', '", "']")
    s"""WITH postings AS (
       |  SELECT doc_id, unnest(list_filter(
       |    list_distinct(regexp_extract_all(lower(text), '[a-z]+')),
       |    t -> NOT list_contains($stops, t))) AS term
       |  FROM documents),
       |q AS (SELECT term FROM postings GROUP BY term
       |      ORDER BY count(*) DESC, term ASC LIMIT 2),
       |m AS (SELECT doc_id, count(DISTINCT term) AS n_hit
       |      FROM postings JOIN q USING (term)
       |      GROUP BY doc_id HAVING count(DISTINCT term) = 2)
       |SELECT d.doc_id, d.source, m.n_hit
       |FROM documents d JOIN m USING (doc_id)""".stripMargin
  }
}
