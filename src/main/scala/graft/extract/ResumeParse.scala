package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, udf}

import scala.util.matching.Regex

/** Resume text → structured extraction (SURVEY.md §2.7 F9-F15), the
  * deterministic re-statement of `resume_parser/parser.py`.
  *
  * The reference's spaCy-NER name branch (`parser.py:125-130`) is
  * model-dependent and excluded from the deterministic spec (SURVEY §7.4);
  * the fallback branches are implemented verbatim:
  *  - F9  section splitter (`parser.py:63-110`): header regex with optional
  *    roman-numeral prefixes, content sliced between headers, FULL_TEXT
  *    fallback
  *  - F10 degree/field (`parser.py:167-197`): keyword cascade, field = text
  *    after "<degree>[, ]in|of ..." up to comma/newline
  *  - F11 institution (`parser.py:200-209`): TitleCase…(University|College|
  *    Institute|School) or "University of X"
  *  - A3  year = max 19xx/20xx in the paragraph (`parser.py:212-215`)
  *  - F12 bullet lists, F13 interest markers, F14 TitleCase topic heuristic
  *    with tech-word filter, 10-interest cap (`parser.py:262-311`)
  *  - F15 name fallback (`parser.py:132-141`): first line if ≤4 words and no
  *    resume words
  *
  * Pure Scala functions (the reference operates on raw text, not spans),
  * exposed as UDFs at the ingest boundary per SURVEY §2.10 — the hot
  * relational pipeline downstream stays codegen-clean.
  */
object ResumeParse {

  final case class ParsedEducation(degree: String, field: String,
      institution: String, year: Option[Int])
  final case class ParsedResume(name: String, education: Seq[ParsedEducation],
      research_interests: Seq[String])

  // parser.py:71-82
  private val SectionHeaders = Seq(
    "EDUCATION", "ACADEMIC BACKGROUND", "QUALIFICATIONS",
    "EXPERIENCE", "WORK EXPERIENCE", "EMPLOYMENT", "PROFESSIONAL EXPERIENCE",
    "SKILLS", "TECHNICAL SKILLS", "TECHNOLOGIES", "CORE COMPETENCIES",
    "RESEARCH", "RESEARCH INTERESTS", "RESEARCH EXPERIENCE",
    "PROJECTS", "PROJECT EXPERIENCE",
    "PUBLICATIONS", "PAPERS", "ARTICLES",
    "CERTIFICATIONS", "CERTIFICATES",
    "AWARDS", "HONORS", "ACHIEVEMENTS",
    "LANGUAGES", "LANGUAGE SKILLS",
    "REFERENCES", "PROFESSIONAL REFERENCES")

  private val SectionRe: Regex =
    ("(?i)(?:^|\\n)(?:(?:I\\.?|II\\.?|III\\.?|IV\\.?)\\s+)?(" +
      SectionHeaders.mkString("|") + ")[:\\s]*(?:\\n|$)").r

  /** F9 — section name → content, in DOCUMENT order (parser.py:86-110).
    *
    * The reference stores sections in a Python dict and every consumer takes
    * the FIRST matching header in iteration order — i.e. insertion (document)
    * order, with a duplicated header keeping its first position but last
    * value. A plain Scala `Map` hashes ≥5 entries into arbitrary order and
    * silently breaks that first-match parity; `LinkedHashMap` reproduces the
    * dict semantics exactly.
    */
  def splitSections(text: String): Seq[(String, String)] = {
    val ms = SectionRe.findAllMatchIn(text).toVector
    if (ms.isEmpty) Seq("FULL_TEXT" -> text)
    else {
      val ordered = scala.collection.mutable.LinkedHashMap.empty[String, String]
      ms.zipWithIndex.foreach { case (m, i) =>
        val start = m.end
        val end   = if (i == ms.length - 1) text.length else ms(i + 1).start
        ordered.update(m.group(1).toUpperCase, text.substring(start, end).trim)
      }
      ordered.toSeq
    }
  }

  // parser.py:167-172
  private val DegreeKeywords = Seq(
    "PhD", "Ph.D", "Doctor of Philosophy",
    "MS", "M.S.", "Master of Science", "Master's", "Masters", "MA", "M.A.",
    "BS", "B.S.", "Bachelor of Science", "Bachelor's", "Bachelors", "BA", "B.A.",
    "MBA", "M.B.A.", "Master of Business Administration")

  private val UniversityRes = Seq(
    """(?:^|\n|\s)([A-Z][a-zA-Z\s]+(?:University|College|Institute|School))""".r,
    """(?:^|\n|\s)(University of [A-Z][a-zA-Z\s]+)""".r)

  private val YearRe = """\b(19\d{2}|20\d{2})\b""".r

  /** F10/F11/A3 — education entries from a section (parser.py:143-228).
    * First matching header in document order wins (sections is ordered).
    */
  def extractEducation(sections: Seq[(String, String)]): Seq[ParsedEducation] = {
    val section = sections.collectFirst {
      case (name, content) if name.contains("EDUCATION") ||
        name.contains("ACADEMIC") || name.contains("QUALIFICATIONS") => content
    }.orElse(sections.collectFirst { case ("FULL_TEXT", c) => c })
    section.toSeq.flatMap { sec =>
      sec.split("\n\n").toSeq.filter(_.trim.nonEmpty).flatMap { para =>
        val degree = DegreeKeywords.find { k =>
          ("(?i)\\b" + Regex.quote(k) + "\\b").r.findFirstIn(para).isDefined
        }
        val field = degree.flatMap { k =>
          ("(?i)\\b" + Regex.quote(k) + "\\b[,\\s]+(?:in|of)?\\s+([^,\\n]+)").r
            .findFirstMatchIn(para).map(_.group(1).trim)
        }
        val institution = UniversityRes.view
          .flatMap(_.findFirstMatchIn(para).map(_.group(1).trim))
          .headOption
        val year = YearRe.findAllIn(para).toSeq match {
          case Seq()  => None
          case years  => Some(years.map(_.toInt).max) // most recent (parser.py:215)
        }
        if (degree.isDefined || institution.isDefined)
          Some(ParsedEducation(degree.getOrElse(""), field.getOrElse(""),
            institution.getOrElse(""), year))
        else None
      }
    }
  }

  // parser.py:262-263 (bullet glyph set verbatim)
  private val BulletRe =
    """(?:^|\n)[\s]*(?:[\*\-•◦‣⁃⁌⁍⦾⦿⧈⧇⧄⧅]|\d+\.)[\s]+([^\n]+)""".r
  private val InterestMarkers = Seq(
    "research interests include", "interested in", "focusing on",
    "specializing in", "research areas", "areas of interest")
  private val TopicRe = """\b([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*(?:\s+[a-z]+)*)\b""".r
  private val TechWords = Seq(
    "learning", "intelligence", "mining", "vision", "language",
    "processing", "recognition", "network", "computing", "systems",
    "design", "engineering", "analysis", "theory", "optimization")

  /** F12/F13/F14 — research interests (parser.py:230-311).
    * First matching header in document order wins (sections is ordered).
    */
  def extractInterests(sections: Seq[(String, String)]): Seq[String] = {
    val section = sections.collectFirst {
      case (n, c) if n.contains("RESEARCH") || n.contains("INTERESTS") => c
    }.orElse(sections.collectFirst { case (n, c) if n.contains("SKILLS") => c })
      .orElse(sections.collectFirst { case ("FULL_TEXT", c) => c })
    section.toSeq.flatMap { sec =>
      val bullets = BulletRe.findAllMatchIn(sec).map(_.group(1)).toSeq
      if (bullets.nonEmpty) {
        bullets.filter(_.length < 100) // long bullets are descriptions (parser.py:268)
          .map(b => b.replaceAll("^[^a-zA-Z0-9]+", "").trim)
      } else {
        val marked = InterestMarkers.view.flatMap { marker =>
          ("(?i)(?:" + Regex.quote(marker) + ")\\s*:?\\s*([^.]+)").r
            .findFirstMatchIn(sec).map(_.group(1).trim)
        }.headOption.map { text =>
          text.split("[,;]").toSeq.map(_.trim)
            .filter(s => s.nonEmpty && s.toLowerCase != "and" && s.toLowerCase != "or")
        }
        marked.getOrElse {
          TopicRe.findAllMatchIn(sec).map(_.group(1)).toSeq
            .filter(t => t.length >= 5 && t.length <= 50 && t.split("\\s+").length <= 5)
            .filter(t => TechWords.exists(w => t.toLowerCase.contains(w)))
            .take(10) // parser.py:311
        }
      }
    }
  }

  /** F15 — name fallback branch (parser.py:132-141). */
  def extractName(text: String): String = {
    val firstLines = text.split("\n").take(5)
    val firstLine  = firstLines.headOption.getOrElse("").trim
    val resumeWords = Seq("resume", "cv", "curriculum", "vitae")
    if (firstLine.split("\\s+").length <= 4 &&
      !resumeWords.exists(firstLine.toLowerCase.contains)) firstLine
    else ""
  }

  /** Full parse (parser.py:313-327). */
  def parse(text: String): ParsedResume = {
    val sections = splitSections(text)
    ParsedResume(extractName(text), extractEducation(sections),
      extractInterests(sections))
  }

  // ---- Spark boundary (SURVEY §2.10: UDFs at ingest only) ----

  val sectionsUdf = udf((text: String) => splitSections(text))
  val parseUdf    = udf((text: String) => parse(text))

  /** Parse a table of resume texts: adds name, education, research_interests. */
  def parseResumes(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__parsed", parseUdf(col(textCol)))
      .withColumn("name", col("__parsed.name"))
      .withColumn("education", col("__parsed.education"))
      .withColumn("research_interests", col("__parsed.research_interests"))
      .drop("__parsed")
}
