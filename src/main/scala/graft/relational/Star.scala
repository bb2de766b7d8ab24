package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Normalization of flat faculty records into the reference's relational star
  * (`database/schema.sql`: universities → departments → faculty →
  * research_interests / publications) and the flagship denormalizing query
  * back out of it (`main.py:351-372`).
  *
  * Ids are stable 64-bit hashes of the natural keys (SURVEY §1.2: "stable
  * 64-bit ids, not auto-increment") — deterministic across runs and across
  * partitions, no driver-side sequence, no window over the whole table. At
  * 100 TB that is the difference between a row-local projection and a global
  * ordering problem.
  */
object Star {

  final case class StarTables(
      universities: DataFrame,      // university_id, name, location, website
      departments: DataFrame,       // department_id, university_id, name, website
      faculty: DataFrame,           // faculty_id, department_id, first_name, last_name,
                                    //   title, email, profile_url, scraped_at
      researchInterests: DataFrame, // interest_id, faculty_id, interest
      publications: DataFrame       // publication_id, faculty_id, title, year
  )

  /** Build the star from faculty records
    * (name, title, university, department, email, research_interests,
    * publications, profile_url) — the shape `scraper.py:69-78` emits and
    * `main.py:135-280` imports.
    *
    * @param scrapedAt injected timestamp literal (reference `datetime.now()`
    *                  at `main.py:210,236`; injected per wave for determinism,
    *                  SURVEY §2.7 F19)
    */
  def normalize(spark: SparkSession, records: DataFrame,
      scrapedAt: java.sql.Timestamp): StarTables = {
    val uid = xxhash64(col("university"))
    val did = xxhash64(col("university"), col("department"))
    val fid = xxhash64(col("university"), col("department"),
      SpanNames.firstName(col("name")), SpanNames.lastName(col("name")))

    val universities = records.select(
      uid.as("university_id"), col("university").as("name"))
      .distinct()
      .withColumn("location", lit(""))
      .withColumn("website", lit(""))

    val departments = records.select(
      did.as("department_id"), uid.as("university_id"),
      col("department").as("name"))
      .distinct()
      .withColumn("website", lit(""))

    // Natural key = (university, department, first, last) — the reference's
    // upsert probe (`main.py:187-190`). Colliding records MERGE, last write
    // wins (`main.py:196-213` updates title/email/profile_url on match). Last
    // = record order when the input carries (seed_rank, row_rank); otherwise
    // the deterministic lexicographic max.
    val ord =
      if (records.columns.contains("seed_rank") && records.columns.contains("row_rank"))
        struct(col("seed_rank"), col("row_rank"))
      else struct(lit(0), lit(0))
    val faculty = records
      .groupBy(fid.as("faculty_id"))
      .agg(max(struct(
        ord.as("__ord"),
        did.as("department_id"),
        SpanNames.firstName(col("name")).as("first_name"),
        SpanNames.lastName(col("name")).as("last_name"),
        col("title"), col("email"), col("profile_url"))).as("c"))
      .select(col("faculty_id"), col("c.department_id"), col("c.first_name"),
        col("c.last_name"), col("c.title"), col("c.email"), col("c.profile_url"))
      .withColumn("scraped_at", lit(scrapedAt))

    // children come from the WINNING record only — the reference replaces all
    // child rows on re-import (delete-then-reinsert, `main.py:244-270`)
    val winners = records
      .groupBy(fid.as("faculty_id"))
      .agg(max(struct(ord.as("__ord"),
        col("research_interests").as("ri"), col("publications").as("pb"))).as("c"))
      .select(col("faculty_id"), col("c.ri").as("research_interests"),
        col("c.pb").as("publications"))

    val researchInterests = winners.select(
      col("faculty_id"), posexplode(col("research_interests")).as(Seq("pos", "interest")))
      .select(xxhash64(col("faculty_id"), col("pos")).as("interest_id"),
        col("faculty_id"), col("interest"))

    val publications = winners.select(
      col("faculty_id"), posexplode(col("publications")).as(Seq("pos", "title")))
      .select(
        xxhash64(col("faculty_id"), col("pos")).as("publication_id"),
        col("faculty_id"), col("title"),
        graft.extract.SpanExtract.pubYear(col("title")).as("year"))

    StarTables(universities, departments, faculty, researchInterests, publications)
  }

  /** The flagship query (`main.py:351-372`): star back to flat profiles with
    * DISTINCT child aggregation. Dimensions broadcast; null children filtered
    * as the reference does (`main.py:389-390`).
    *
    * Scale shape: each child table is pre-aggregated to ONE row per
    * faculty_id before joining — joining both children first (the reference
    * SQL's literal shape) fans every faculty row out interests×publications
    * ways (≤50× under the 5/10 caps) before the group-by re-collapses it.
    * Pre-aggregation makes the join sides 1:1 and drops the fan-out shuffle
    * entirely; the result is row-identical.
    */
  def facultyProfiles(star: StarTables): DataFrame = {
    val interestsAgg = star.researchInterests
      .groupBy(col("faculty_id"))
      .agg(array_sort(collect_set(col("interest"))).as("research_interests"))
    val pubsAgg = star.publications
      .groupBy(col("faculty_id"))
      .agg(array_sort(collect_set(col("title"))).as("publications"))
    star.faculty
      .join(broadcast(star.departments
        .select(col("department_id"), col("name").as("department_name"),
          col("university_id"))), "department_id")
      .join(broadcast(star.universities
        .select(col("university_id"), col("name").as("university_name"))), "university_id")
      .join(interestsAgg, Seq("faculty_id"), "left")
      .join(pubsAgg, Seq("faculty_id"), "left")
      .select(col("faculty_id"), col("first_name"), col("last_name"),
        col("title"), col("email"), col("profile_url"),
        col("department_name"), col("university_name"),
        coalesce(col("research_interests"), array().cast("array<string>"))
          .as("research_interests"),
        coalesce(col("publications"), array().cast("array<string>"))
          .as("publications"))
      .withColumn("name", trim(concat_ws(" ", col("first_name"), col("last_name"))))
  }

  /** Search over profiles (`faculty_api/main.py:144-172`, P1-P4): conjunctive
    * optional filters — substring on university/department, exact lowered
    * membership on research areas, OR-keyword over name/department/interests.
    */
  def search(profiles: DataFrame,
      university: Option[String] = None,
      department: Option[String] = None,
      researchAreas: Seq[String] = Nil,
      keywords: Option[String] = None): DataFrame = {
    var df = profiles
    university.foreach(u =>
      df = df.filter(contains(lower(col("university_name")), lit(u.toLowerCase))))
    department.foreach(d =>
      df = df.filter(contains(lower(col("department_name")), lit(d.toLowerCase))))
    if (researchAreas.nonEmpty) {
      val lowered = transform(col("research_interests"), i => lower(i))
      df = df.filter(
        researchAreas.map(a => array_contains(lowered, a.toLowerCase))
          .reduce(_ || _)) // ANY area exact-matches ANY interest (main.py:156-160)
    }
    keywords.foreach { kw =>
      val k = kw.toLowerCase
      df = df.filter(
        contains(lower(col("name")), lit(k)) ||
          contains(lower(col("department_name")), lit(k)) ||
          exists(col("research_interests"), i => contains(lower(i), lit(k))))
    }
    df
  }

  /** Indexed keyword search (the GIN-index analog, `database/schema.sql:65,84`):
    * probe an inverted index over name + department + interests instead of
    * substring-scanning every profile. Token-exact AND semantics (the
    * full-text-search contract), vs [[search]]'s substring OR — at corpus
    * scale this is the access path; the scan stays only for API parity.
    */
  def searchIndexed(profiles: DataFrame, keywords: Seq[String]): DataFrame = {
    val text = concat_ws(" ", col("name"), col("department_name"),
      concat_ws(" ", col("research_interests")))
    val idx = InvertedIndex.postings(
      profiles.withColumn("__text", text), "faculty_id", col("__text"))
    profiles.join(
      InvertedIndex.searchTokens(idx, "faculty_id", keywords).select("faculty_id"),
      Seq("faculty_id"), "left_semi")
  }
}

/** Name splitting shared by star-building (reference `main.py:182-184`). */
private object SpanNames {
  import org.apache.spark.sql.Column
  def firstName(name: Column): Column = graft.extract.SpanExtract.firstName(name)
  def lastName(name: Column): Column  = graft.extract.SpanExtract.lastName(name)
}
