package graft

import graft.extract.ResumeParse
import org.scalatest.funsuite.AnyFunSuite

/** Resume-parser operators (F9-F15) against the reference's documented golden
  * output (`resume_parser/README.md:53-73`) and regex fixtures from
  * `parser.py`.
  */
class ResumeParseSpec extends AnyFunSuite {

  private val goldenResume =
    """John Doe
      |john.doe@email.com
      |
      |EDUCATION
      |PhD in Computer Science, Stanford University, 2016 - 2020
      |
      |RESEARCH INTERESTS
      |* Machine Learning
      |* Natural Language Processing
      |* Computer Vision
      |
      |EXPERIENCE
      |Research Assistant, Stanford AI Lab
      |""".stripMargin

  test("golden parse matches the reference README's documented output") {
    val got = ResumeParse.parse(goldenResume)
    assert(got.name === "John Doe")
    assert(got.education.length === 1)
    val e = got.education.head
    assert(e.degree === "PhD")
    assert(e.field === "Computer Science")
    assert(e.institution === "Stanford University")
    assert(e.year === Some(2020)) // most recent year in the paragraph
    assert(got.research_interests ===
      Seq("Machine Learning", "Natural Language Processing", "Computer Vision"))
  }

  test("F9 sections: roman-numeral prefixes, colons, FULL_TEXT fallback") {
    val s = ResumeParse.splitSections(
      "intro\nII. WORK EXPERIENCE:\nacme corp\nSKILLS\nscala, spark")
    assert(s.map(_._1) === Seq("WORK EXPERIENCE", "SKILLS"))
    assert(s.toMap.apply("WORK EXPERIENCE") === "acme corp")
    assert(s.toMap.apply("SKILLS") === "scala, spark")
    assert(ResumeParse.splitSections("no headers here") ===
      Seq("FULL_TEXT" -> "no headers here"))
  }

  test("F9 sections preserve document order; first matching header wins") {
    // 6 sections — enough that an unordered HashMap would scramble them; the
    // reference's dict iteration takes QUALIFICATIONS (first in document
    // order) over the later EDUCATION section
    val text = Seq(
      "QUALIFICATIONS", "BS in Physics, Acme College, 2001",
      "SKILLS", "scala",
      "PROJECTS", "p",
      "AWARDS", "a",
      "LANGUAGES", "en",
      "EDUCATION", "PhD in Math, Stanford University, 2010").mkString("\n")
    val sections = ResumeParse.splitSections(text)
    assert(sections.map(_._1) === Seq("QUALIFICATIONS", "SKILLS", "PROJECTS",
      "AWARDS", "LANGUAGES", "EDUCATION"))
    val edu = ResumeParse.extractEducation(sections)
    assert(edu.head.degree === "BS")
    assert(edu.head.institution === "Acme College")
  }

  test("F9 duplicate header: first position, last value (python dict parity)") {
    val sections = ResumeParse.splitSections(
      "EDUCATION\nold content\nSKILLS\nscala\nEDUCATION\nBS in Chemistry, Oak College, 1999")
    assert(sections.map(_._1) === Seq("EDUCATION", "SKILLS"))
    assert(sections.head._2 === "BS in Chemistry, Oak College, 1999")
  }

  test("F10 degree cascade: first matching keyword in list order wins") {
    val edu = ResumeParse.extractEducation(Seq(
      "EDUCATION" -> "Master of Science in Electrical Engineering, MIT College, 2018"))
    // "MS" is \b-bounded so it does NOT match inside "Master of Science"
    assert(edu.head.degree === "Master of Science")
    assert(edu.head.field === "Electrical Engineering")
    assert(edu.head.institution === "MIT College")
  }

  test("F10/F11: degree keyword is word-bounded; institution patterns") {
    // reference quirk kept: \bB\.S\.\b cannot match "B.S. " (no word char
    // after the final dot) — Python behaves identically, so the entry comes
    // from the institution match with an empty degree
    val edu = ResumeParse.extractEducation(Seq(
      "EDUCATION" -> "B.S. in Physics\nUniversity of Washington\n1999"))
    assert(edu.head.degree === "")
    // second reference quirk: [a-zA-Z\s] includes \n, so the TitleCase
    // institution pattern absorbs the preceding line (Python identical)
    assert(edu.head.institution === "Physics\nUniversity")
    assert(edu.head.year === Some(1999))
    val edu2 = ResumeParse.extractEducation(Seq(
      "EDUCATION" -> "BS in Physics, Washington College, 1999"))
    assert(edu2.head.degree === "BS")
    assert(edu2.head.field === "Physics")
  }

  test("F12 bullets: glyph variants, numbered items, 100-char threshold") {
    val sec = Seq("RESEARCH INTERESTS" ->
      ("• Deep Learning\n- Graph Mining\n1. Speech Recognition\n* " + "x" * 120))
    val got = ResumeParse.extractInterests(sec)
    assert(got === Seq("Deep Learning", "Graph Mining", "Speech Recognition"))
  }

  test("F13 interest markers: split on , ; — only bare and/or dropped") {
    // reference quirk kept: the and/or filter is exact-match on the whole
    // piece (parser.py:288), so "and robotics" survives
    val got = ResumeParse.extractInterests(Seq(
      "RESEARCH" -> "My research interests include NLP, vision; and robotics. More text."))
    assert(got === Seq("NLP", "vision", "and robotics"))
    val bare = ResumeParse.extractInterests(Seq(
      "RESEARCH" -> "research areas: ML, and, vision."))
    assert(bare === Seq("ML", "vision"))
  }

  test("F14 topic heuristic: TitleCase phrases with tech words, capped at 10") {
    // reference quirk kept: the topic regex greedily absorbs trailing
    // lowercase words (parser.py:295-299)
    val sec = Seq("SKILLS" ->
      "Worked on Machine Learning and Query Optimization plus Cooking Recipes daily")
    val got = ResumeParse.extractInterests(sec)
    assert(got === Seq("Machine Learning and", "Query Optimization plus"))
  }

  test("F15 name fallback: first line unless resume-word or too long") {
    assert(ResumeParse.extractName("Jane Q Smith\nmore") === "Jane Q Smith")
    assert(ResumeParse.extractName("Curriculum Vitae\nJane") === "")
    assert(ResumeParse.extractName("a b c d e f\nJane") === "")
  }

  test("Spark boundary: parseResumes adds typed columns") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, goldenResume)).toDF("id", "text")
    val got = ResumeParse.parseResumes(df, "text")
      .select("name", "research_interests").collect().head
    assert(got.getString(0) === "John Doe")
    assert(got.getSeq[String](1).length === 3)
  }
}
