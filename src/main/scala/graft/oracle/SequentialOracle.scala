package graft.oracle

import graft.model.{FacultyRecord, Span, SpanDoc}
import graft.synth.SyntheticSite.Seed
import graft.urls.Urls

import scala.collection.mutable

/** Sequential re-statement of the reference crawl (reference
  * `scraper.py:14-163` + record assembly `scraper.py:69-78`), operating on
  * span documents. This is the exactness oracle the Spark engine is compared
  * against (BASELINE.json: crawl ordering, URL-seen set, extracted records,
  * per-row span-sequence equality).
  *
  * Deliberately implemented as independent imperative loops — it shares only
  * the URL canonicalizer with the engine (canonical identity must be shared
  * or nothing is comparable), not the extraction pipeline.
  *
  * Reference fetch order (`scraper.py:43-63`): seed index page first, then
  * each faculty row's profile immediately, in index-document order, at 1
  * req/s on the single host. With multiple seed hosts the per-host order is
  * the invariant (the reference never interleaves hosts; a polite parallel
  * crawler does — per-host sequences must still match exactly).
  */
object SequentialOracle {

  final case class OracleResult(
      crawlOrder: Vector[(String, String)],       // (host, url) in fetch order
      seen: Set[String],                          // canonical URLs ever enqueued
      records: Vector[FacultyRecord],
      documents: Vector[SpanDoc]                  // successfully fetched pages
  )

  private val EmailRe = ("""\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b""").r
  private val SplitRe = "[,;•]"

  def run(seeds: Seq[Seed], fetch: String => Option[SpanDoc]): OracleResult = {
    val order   = Vector.newBuilder[(String, String)]
    val seen    = mutable.LinkedHashSet.empty[String]
    val records = Vector.newBuilder[FacultyRecord]
    val docs    = Vector.newBuilder[SpanDoc]

    for (seed <- seeds.sortBy(_.rank)) {
      val seedUrl = Urls.normalize(seed.url)
      val host    = Urls.hostOf(seedUrl)
      seen += seedUrl
      order += ((host, seedUrl))
      fetch(seedUrl) match {
        case None => // index fetch error → no rows from this seed (scraper.py:30-32)
        case Some(doc) =>
          docs += doc
          for (row <- parseIndexRows(doc.spans)) {
            var email     = ""
            var interests = Seq.empty[String]
            var pubs      = Seq.empty[String]
            val profUrl = row.href.map(h => Urls.canonicalize(h, seedUrl))
            profUrl.foreach { p =>
              seen += p
              order += ((Urls.hostOf(p), p))
              fetch(p) match {
                case None => // profile error → empty detail fields (scraper.py:102-106,160-162)
                case Some(pdoc) =>
                  docs += pdoc
                  email = extractEmail(pdoc.spans)
                  interests = extractInterests(pdoc.spans)
                  pubs = extractPublications(pdoc.spans)
              }
            }
            records += FacultyRecord(
              name = row.name,
              title = row.title,
              university = seed.university,
              department = seed.department,
              email = email,
              research_interests = interests,
              publications = pubs,
              profile_url = profUrl.getOrElse(""))
          }
      }
    }
    OracleResult(order.result(), seen.toSet, records.result(), docs.result())
  }

  final case class IndexRow(rank: Int, name: String, title: String, href: Option[String])

  /** Each heading starts a faculty row; first link / first text before the
    * next heading are the profile anchor and title (scraper.py:43-55).
    */
  def parseIndexRows(spans: Array[Span]): Vector[IndexRow] = {
    val s = spans.sortBy(_.offset)
    val headIdx = s.indices.filter(i => s(i).kind == "heading")
    headIdx.zipWithIndex.map { case (hi, rank) =>
      val end = headIdx.find(_ > hi).getOrElse(s.length)
      val inRow = s.slice(hi + 1, end)
      IndexRow(
        rank = rank,
        name = s(hi).text,
        title = inRow.find(_.kind == "text").map(_.text).getOrElse(""),
        href = inRow.find(_.kind == "link").map(_.media_ref))
    }.toVector
  }

  def extractEmail(spans: Array[Span]): String = {
    val full = spans.sortBy(_.offset).map(_.text).mkString(" ")
    EmailRe.findFirstIn(full).getOrElse("")
  }

  def extractInterests(spans: Array[Span]): Seq[String] = {
    val s = spans.sortBy(_.offset)
    val h = s.find(sp => sp.kind == "heading" && "(?i)research".r.findFirstIn(sp.text).isDefined)
    h.toSeq.flatMap { hd =>
      s.find(sp => sp.kind == "text" && sp.offset > hd.offset).toSeq.flatMap { blob =>
        blob.text.split(SplitRe).map(_.trim).filter(_.nonEmpty).toSeq
      }
    }
  }

  def extractPublications(spans: Array[Span]): Seq[String] = {
    val s = spans.sortBy(_.offset)
    val h = s.find(sp => sp.kind == "heading" &&
      "(?i)publications|selected publications".r.findFirstIn(sp.text).isDefined)
    h.toSeq.flatMap { hd =>
      val next = s.find(sp => sp.kind == "heading" && sp.offset > hd.offset)
        .map(_.offset).getOrElse(Int.MaxValue)
      s.filter(sp => sp.kind == "listitem" && sp.offset > hd.offset && sp.offset < next)
        .map(_.text).take(5).toSeq
    }
  }
}
