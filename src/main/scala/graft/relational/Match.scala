package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The resume↔faculty match pipeline (SURVEY.md §3 E2, §2.4 A4-A7) — the
  * deterministic core of `matcher.py:306-406`.
  *
  * Reference-sanctioned degradation (SURVEY §7.4): transformer/spaCy scores
  * are model-dependent and out of the deterministic spec; with them disabled
  * the reference's combined similarity renormalizes to exactly the TF-IDF
  * cosine (`matcher.py:244-263`), and keyword extraction falls back to the
  * regex branch (`matcher.py:295-304`). What remains is fully deterministic:
  *
  *  - interests/education/publications similarity: 2-document TF-IDF cosine
  *    (1-2grams, smoothed idf ln((n+1)/(df+1))+1, L2 norm — the sklearn
  *    configuration at `matcher.py:46-50`)
  *  - keyword_match = |common keywords| / max(|resume keywords|, 1)
  *  - overall = .5·interests + .2·education + .1·pubs + .2·keywords
  *    (`matcher.py:383-388`), all display scores rounded to 2dp, overall
  *    computed from unrounded components (as the reference does)
  *  - rank desc by overall, deterministic faculty_id tiebreak, top-k
  *    (`matcher.py:404`, `faculty_api/main.py:448`)
  *
  * Execution shape: the resume is a handful of literals — every score is a
  * row-local computation over the faculty table (broadcast-style J6, no
  * shuffle), then TakeOrderedAndProject for the top-k.
  */
object Match {

  final case class Education(degree: String, field: String, institution: String, year: Option[Int])
  final case class Resume(
      name: String,
      research_interests: Seq[String],
      education: Seq[Education],
      publications: Seq[String])

  /** Compact english stopword list (deterministic stand-in for the NLTK /
    * sklearn lists the reference loads; fixed here so results are pinned).
    */
  val Stopwords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from", "has", "he",
    "in", "is", "it", "its", "of", "on", "that", "the", "to", "was", "were",
    "will", "with", "this", "these", "those", "or", "not", "but", "they", "their")

  /** Tokens: lowercase `\w\w+` runs (sklearn's token_pattern) minus stopwords. */
  def tokens(text: String): Seq[String] =
    "[a-z0-9]{2,}".r.findAllIn(text.toLowerCase).filterNot(Stopwords).toSeq

  /** Unigrams + bigrams over the stopword-filtered tokens (ngram_range (1,2),
    * `matcher.py:46-50`).
    */
  def tokensWithBigrams(text: String): Seq[String] = {
    val ts = tokens(text)
    ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  /** TF-IDF cosine on the 2-document corpus {a, b} (`matcher.py:117-153`):
    * idf(t) = ln((2+1)/(df+1)) + 1 with df ∈ {1,2}; weights tf·idf,
    * L2-normalized; cosine = dot. 0 when either side is empty.
    */
  def pairwiseTfidfCosine(aText: String, bText: String): Double =
    pairwiseTfidfCosineFixed(aText)(bText)

  /** Curried form for a CONSTANT left document: tokenizes + tf-counts `aText`
    * once, returning a closure scoring any right document against it. The
    * match pipeline scores one resume against N faculty rows — the uncurried
    * form re-tokenizes the identical resume N times inside the UDF.
    */
  def pairwiseTfidfCosineFixed(aText: String): String => Double = {
    val a   = tokensWithBigrams(aText)
    val tfA = a.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val idfShared = 1.0                      // ln(3/3)+1
    val idfUnique = math.log(3.0 / 2.0) + 1  // ln(3/2)+1
    (bText: String) => {
      val b = tokensWithBigrams(bText)
      if (a.isEmpty || b.isEmpty) 0.0
      else {
        val tfB = b.groupBy(identity).view.mapValues(_.size.toDouble).toMap
        val wA = tfA.map { case (t, f) =>
          t -> f * (if (tfB.contains(t)) idfShared else idfUnique) }
        val wB = tfB.map { case (t, f) =>
          t -> f * (if (tfA.contains(t)) idfShared else idfUnique) }
        val dot = wA.collect { case (t, w) if wB.contains(t) => w * wB(t) }.sum
        val nA  = math.sqrt(wA.values.map(w => w * w).sum)
        val nB  = math.sqrt(wB.values.map(w => w * w).sum)
        if (nA == 0 || nB == 0) 0.0 else dot / (nA * nB)
      }
    }
  }

  /** Fallback keyword extraction (`matcher.py:295-304`): `[a-zA-Z]{3,}` words
    * minus stopwords, duplicates kept (the reference divides by the list
    * length, not the set size).
    */
  def keywords(text: String): Seq[String] =
    "[a-zA-Z]{3,}".r.findAllIn(text).toSeq.filterNot(w => Stopwords(w.toLowerCase))

  /** keyword_match = |common lowered sets| / max(|resume keywords|, 1)
    * (`matcher.py:373-378`).
    */
  def keywordMatch(resumeText: String, facultyText: String): Double =
    keywordMatchFixed(resumeText)(facultyText)

  /** Curried form for a constant resume (see [[pairwiseTfidfCosineFixed]]). */
  def keywordMatchFixed(resumeText: String): String => Double = {
    val rk      = keywords(resumeText)
    val rkLower = rk.map(_.toLowerCase).toSet
    val denom   = math.max(rk.size, 1)
    (facultyText: String) => {
      val fk = keywords(facultyText)
      if (rk.isEmpty || fk.isEmpty) 0.0
      else (rkLower intersect fk.map(_.toLowerCase).toSet).size.toDouble / denom
    }
  }

  private def eduText(es: Seq[Education]): String =
    es.map(e => s"${e.degree} ${e.field} ${e.institution}").mkString(" ")

  /** Match a resume against a faculty table.
    *
    * @param faculty columns: faculty_id, name, department_name,
    *                university_name, research_interests array<string>,
    *                publications array<string>
    */
  def matchResume(spark: SparkSession, faculty: DataFrame, resume: Resume,
      topK: Int = 5): DataFrame = {
    val resumeInterests = resume.research_interests.mkString(" ")
    val resumeEdu       = eduText(resume.education)
    val resumePubs      = resume.publications.mkString(" ")

    // resume-side tf maps are computed ONCE on the driver and travel in the
    // UDF closures — the resume is a constant; re-tokenizing it per faculty
    // row was N-1 wasted tokenizations
    val cosineVsInterests = udf(pairwiseTfidfCosineFixed(resumeInterests))
    val cosineVsPubs      = udf(pairwiseTfidfCosineFixed(resumePubs))
    val kwVsInterests     = udf(keywordMatchFixed(resumeInterests))

    val fInterests = concat_ws(" ", col("research_interests"))
    val fPubs      = concat_ws(" ", coalesce(col("publications"), array()))

    val scored = faculty
      .withColumn("interests_raw", cosineVsInterests(fInterests))
      // faculty rows carry no education in the reference star → 0.0
      .withColumn("education_raw", lit(0.0))
      .withColumn("publications_raw",
        when(lit(resumePubs.nonEmpty) && size(coalesce(col("publications"), array())) > 0,
          cosineVsPubs(fPubs)).otherwise(0.0))
      .withColumn("keyword_raw",
        when(lit(resumeInterests.nonEmpty) && size(col("research_interests")) > 0,
          kwVsInterests(fInterests)).otherwise(0.0))
      .withColumn("overall_raw",
        col("interests_raw") * 0.5 + col("education_raw") * 0.2 +
          col("publications_raw") * 0.1 + col("keyword_raw") * 0.2)
    scored.select(
      col("faculty_id"),
      col("name"),
      col("department_name").as("department"),
      col("university_name").as("university"),
      round(col("interests_raw"), 2).as("interests_similarity"),
      round(col("education_raw"), 2).as("education_similarity"),
      round(col("publications_raw"), 2).as("publications_similarity"),
      round(col("keyword_raw"), 2).as("keyword_match"),
      round(col("overall_raw"), 2).as("overall_score"))
      .orderBy(col("overall_score").desc, col("faculty_id").asc)
      .limit(topK)
  }

  /** The API's mock compatibility variant (`faculty_api/main.py:175-206`):
    * exact lowered-membership interest overlap, placeholder education 0.5 and
    * publications 0.3, weights .6/.3/.1.
    */
  def apiCompatibility(spark: SparkSession, faculty: DataFrame,
      resumeInterests: Seq[String], topK: Int = 5): DataFrame = {
    val r = resumeInterests.map(_.toLowerCase)
    val fLower = transform(col("research_interests"), i => lower(i))
    val matching = size(filter(
      array(r.map(lit): _*), x => array_contains(fLower, x)))
    val interests = when(lit(r.nonEmpty) && size(col("research_interests")) > 0,
      matching.cast("double") /
        greatest(lit(r.size), size(col("research_interests"))).cast("double"))
      .otherwise(0.0)
    faculty
      .withColumn("interests_raw", interests)
      .select(
        col("faculty_id"), col("name"),
        col("department_name").as("department"),
        col("university_name").as("university"),
        round(col("interests_raw"), 2).as("interests_similarity"),
        lit(0.5).as("education_similarity"),
        lit(0.3).as("publications_similarity"),
        round(col("interests_raw") * 0.6 + lit(0.5) * 0.3 + lit(0.3) * 0.1, 2)
          .as("overall_score"))
      .orderBy(col("overall_score").desc, col("faculty_id").asc)
      .limit(topK)
  }
}
