package graft

import graft.crawl.{Records, WaveRunner}
import graft.relational.{Star, Upsert}
import graft.synth.SyntheticSite
import graft.synth.SyntheticSite.SiteConfig
import org.apache.spark.sql.functions._

/** Star normalization (schema.sql) + flagship denormalization (main.py:351-372)
  * + search (P1-P4) + upsert semantics (main.py:196-270), end-to-end from a
  * real crawl of the synthetic site.
  */
class StarSpec extends SparkSpec {
  import spark.implicits._

  private val site    = SiteConfig(universities = 2, deptsPerU = 2, facultyPerDept = 4)
  private val seeds   = SyntheticSite.seeds(site)
  private val ts      = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  private lazy val records = {
    val crawl = WaveRunner.run(spark, seeds, SyntheticSite.fetcher(site), Nil,
      WaveRunner.CrawlConfig(waveSeconds = 4.0))
    Records.facultyRecords(spark, crawl.docs, seeds).cache()
  }

  /** Reference upsert key: (university, department, first, last) — same-name
    * records in one department merge, last wins (main.py:187-213).
    */
  private def lastWins = records.collect()
    .sortBy(r => (r.getAs[Int]("seed_rank"), r.getAs[Int]("row_rank")))
    .map { r =>
      val parts = r.getAs[String]("name").split(" ")
      val key = (r.getAs[String]("university"), r.getAs[String]("department"),
        parts.head, if (parts.length > 1) parts.last else "")
      key -> r
    }.toMap // toMap keeps the LAST occurrence per key

  test("normalize: star cardinalities and FK integrity") {
    val star = Star.normalize(spark, records, ts)
    assert(star.universities.count() === 2)
    assert(star.departments.count() === 4)
    assert(star.faculty.count() === lastWins.size)
    // FK integrity: every child key resolves
    assert(star.departments.join(star.universities, "university_id").count() === 4)
    assert(star.faculty.join(star.departments, "department_id").count() === lastWins.size)
    assert(star.researchInterests.join(star.faculty, "faculty_id").count() ===
      star.researchInterests.count())
    assert(star.publications.join(star.faculty, "faculty_id").count() ===
      star.publications.count())
    // publication years extracted (synth pubs embed 1995-2024)
    val years = star.publications.select("year").collect().map(_.getInt(0))
    assert(years.nonEmpty && years.forall(y => y >= 1995 && y <= 2024))
  }

  test("flagship roundtrip: normalize → facultyProfiles reproduces the records") {
    val star = Star.normalize(spark, records, ts)
    val profiles = Star.facultyProfiles(star)
    assert(profiles.count() === lastWins.size)
    val got = profiles.select("first_name", "last_name", "university_name",
      "department_name", "email", "research_interests")
      .collect()
      .map(r => ((r.getString(2), r.getString(3), r.getString(0), r.getString(1)),
        (r.getString(4), r.getSeq[String](5).toSet))).toMap
    val exp = lastWins.map { case (k, r) =>
      k -> (r.getAs[String]("email"),
        r.getSeq[String](r.fieldIndex("research_interests")).toSet)
    }
    assert(got === exp)
  }

  test("search: P1-P4 conjunctive semantics (faculty_api/main.py:144-172)") {
    val star = Star.normalize(spark, records, ts)
    val profiles = Star.facultyProfiles(star).cache()
    val all = profiles.count()
    assert(Star.search(profiles, university = Some("university 0")).count() === 8)
    assert(Star.search(profiles, department = Some("electrical")).count() === 8)
    assert(Star.search(profiles).count() === all)
    // exact membership (not substring) for research areas (main.py:156-160)
    val anyInterest = profiles.select(explode(col("research_interests")).as("i"))
      .limit(1).collect().head.getString(0)
    assert(Star.search(profiles, researchAreas = Seq(anyInterest.toUpperCase)).count() > 0)
    assert(Star.search(profiles,
      researchAreas = Seq(anyInterest.substring(0, 3))).count() === 0)
    // OR-keyword across name/department/interests (main.py:163-170)
    val kw = Star.search(profiles, keywords = Some("dr."))
    assert(kw.count() === all) // every synth name starts with "Dr."
  }

  test("indexed keyword search: posting probe agrees with a token-exact scan") {
    val star = Star.normalize(spark, records, ts)
    val profiles = Star.facultyProfiles(star).cache()
    // pick real tokens from one profile's interests
    val someInterest = profiles.select(explode(col("research_interests")).as("i"))
      .limit(1).collect().head.getString(0)
    val terms = someInterest.toLowerCase.split("[^a-z]+")
      .filter(t => t.nonEmpty && !graft.ops.TextOps.Stopwords.contains(t))
      .take(2).toSeq
    assume(terms.nonEmpty)
    val got = Star.searchIndexed(profiles, terms)
      .select("faculty_id").collect().map(_.getLong(0)).toSet
    // brute-force oracle: token-exact AND over the same name+dept+interests text
    val expected = profiles.collect().filter { r =>
      val text = (r.getAs[String]("name") + " " + r.getAs[String]("department_name") +
        " " + r.getSeq[String](r.fieldIndex("research_interests")).mkString(" "))
        .toLowerCase
      val toks = "[a-z]+".r.findAllIn(text).toSet
      terms.forall(toks)
    }.map(_.getAs[Long]("faculty_id")).toSet
    assert(got === expected)
    assert(got.nonEmpty, "planted terms must match at least their own profile")
  }

  test("upsert: matched update wins, unmatched keeps, inserts appended (main.py:196-239)") {
    val current = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "bal")
    val updates = Seq((2L, "b", 99.0), (3L, "c", 30.0)).toDF("id", "name", "bal")
    val got = Upsert.upsert(current, updates.withColumnRenamed("bal", "new_bal")
        .withColumn("bal", col("new_bal")),
      "id", Map("bal" -> "new_bal"))
      .select("id", "name", "bal")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set((1L, "a", 10.0), (2L, "b", 99.0), (3L, "c", 30.0)))
  }

  test("child replacement: delete-then-reinsert per parent key (main.py:244-270)") {
    val old = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("faculty_id", "interest")
    val neu = Seq((1L, "new1"), (1L, "new2")).toDF("faculty_id", "interest")
    val got = Upsert.replaceChildren(old, neu, "faculty_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "new1"), (1L, "new2"), (2L, "z")))
  }
}
