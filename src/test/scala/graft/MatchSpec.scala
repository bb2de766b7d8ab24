package graft

import graft.relational.Match
import graft.relational.Match.{Education, Resume}

/** Golden-fixture tests for the match pipeline, using the reference's own
  * example harness data (`matcher.py:408-470`: John Doe resume vs Dr. Alice
  * Smith / Dr. Bob Johnson) and the API mock resume
  * (`faculty_api/main.py:407-418`). Expected values hand-derived from the
  * deterministic spec (2-doc TF-IDF cosine + keyword overlap — SURVEY §7.4).
  */
class MatchSpec extends SparkSpec {
  import spark.implicits._

  private val resume = Resume(
    name = "John Doe",
    research_interests = Seq("Machine Learning", "Natural Language Processing",
      "Computer Vision"),
    education = Seq(Education("PhD", "Computer Science", "Stanford University", Some(2022))),
    publications = Nil)

  private def facultyDF = Seq(
    (1L, "Dr. Alice Smith", "Computer Science", "Stanford University",
      Seq("Machine Learning", "Artificial Intelligence", "Deep Learning"), Seq.empty[String]),
    (2L, "Dr. Bob Johnson", "Electrical Engineering", "MIT",
      Seq("Robotics", "Computer Vision", "Sensor Networks"), Seq.empty[String]))
    .toDF("faculty_id", "name", "department_name", "university_name",
      "research_interests", "publications")

  test("pairwise 2-doc TF-IDF cosine matches hand-computed sklearn values") {
    val r = resume.research_interests.mkString(" ")
    val alice = Seq("Machine Learning", "Artificial Intelligence", "Deep Learning").mkString(" ")
    val bob   = Seq("Robotics", "Computer Vision", "Sensor Networks").mkString(" ")
    // shared terms resume∩alice: {machine, learning, "machine learning"},
    // dot=4 (learning tf=2 on alice side), norms sqrt(3+10·idf²)·sqrt(6+7·idf²)
    assert(math.abs(Match.pairwiseTfidfCosine(r, alice) - 0.18832) < 1e-4)
    assert(math.abs(Match.pairwiseTfidfCosine(r, bob) - 0.16320) < 1e-4)
    assert(Match.pairwiseTfidfCosine("", alice) === 0.0)
    assert(Match.pairwiseTfidfCosine(r, r) > 0.99999) // self-similarity = 1
  }

  test("keyword fallback branch (matcher.py:295-304, 373-378)") {
    val r = resume.research_interests.mkString(" ")
    // resume keywords: 7 words ≥3 chars; common with alice: {machine, learning}
    assert(math.abs(Match.keywordMatch(r,
      "Machine Learning Artificial Intelligence Deep Learning") - 2.0 / 7) < 1e-9)
    assert(Match.keywordMatch("", "x") === 0.0)
  }

  test("golden match: reference example fixtures rank Alice over Bob with expected scores") {
    val got = Match.matchResume(spark, facultyDF, resume, topK = 5).collect()
    assert(got.length === 2)
    val alice = got(0)
    val bob   = got(1)
    assert(alice.getAs[String]("name") === "Dr. Alice Smith")
    assert(alice.getAs[Double]("interests_similarity") === 0.19)
    assert(alice.getAs[Double]("education_similarity") === 0.0)
    assert(alice.getAs[Double]("publications_similarity") === 0.0)
    assert(alice.getAs[Double]("keyword_match") === 0.29)
    assert(alice.getAs[Double]("overall_score") === 0.15)
    assert(bob.getAs[String]("name") === "Dr. Bob Johnson")
    assert(bob.getAs[Double]("interests_similarity") === 0.16)
    assert(bob.getAs[Double]("keyword_match") === 0.29)
    assert(bob.getAs[Double]("overall_score") === 0.14)
  }

  test("API mock compatibility variant (faculty_api/main.py:175-206)") {
    val got = Match.apiCompatibility(spark, facultyDF,
      resume.research_interests, topK = 5).collect()
    // alice: 1 matching interest of max(3,3) → 0.33; bob: 1/3 → 0.33
    got.foreach { r =>
      assert(r.getAs[Double]("interests_similarity") === 0.33)
      assert(r.getAs[Double]("education_similarity") === 0.5)
      assert(r.getAs[Double]("publications_similarity") === 0.3)
      // 0.33·0.6 + 0.5·0.3 + 0.3·0.1 → round(0.38, 2)
      assert(r.getAs[Double]("overall_score") === 0.38)
    }
    // deterministic tiebreak: faculty_id asc
    assert(got.map(_.getAs[Long]("faculty_id")).toList === List(1L, 2L))
  }

  test("top-k bound and empty-interest degradation") {
    val top1 = Match.matchResume(spark, facultyDF, resume, topK = 1).collect()
    assert(top1.length === 1 && top1.head.getAs[String]("name") === "Dr. Alice Smith")
    val emptyResume = Resume("X", Nil, Nil, Nil)
    val got = Match.matchResume(spark, facultyDF, emptyResume).collect()
    assert(got.forall(_.getAs[Double]("overall_score") === 0.0))
  }
}
