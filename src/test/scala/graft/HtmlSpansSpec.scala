package graft

import graft.extract.HtmlSpans
import graft.model.Span
import graft.synth.SyntheticSite
import graft.synth.SyntheticSite.SiteConfig
import org.scalatest.funsuite.AnyFunSuite

/** render ∘ parse must be the identity on span documents — the HTML boundary
  * (SURVEY §2.10 parseHtmlSpans) cannot lose or reorder spans.
  */
class HtmlSpansSpec extends AnyFunSuite {

  test("roundtrip on every synthetic page type (incl. escaping-sensitive text)") {
    val cfg = SiteConfig(universities = 2, deptsPerU = 2, facultyPerDept = 5,
      bioWords = 30)
    val urls =
      SyntheticSite.seeds(cfg).map(_.url) ++
        Seq(SyntheticSite.profileUrl(0, 0, 1), SyntheticSite.profileUrl(1, 1, 4))
    urls.foreach { u =>
      val doc  = SyntheticSite.fetch(cfg)(u).get
      val back = HtmlSpans.parse(HtmlSpans.render(doc.doc_id, doc.spans))
      assert(back.toSeq === doc.spans.toSeq, s"roundtrip failed for $u")
    }
  }

  test("roundtrip with entities and quotes") {
    val spans = Array(
      Span("heading", "A & B <Lab> \"x\"", "", 0),
      Span("link", "a<b>&c", "https://h.com/p?a=1&b=2", 1),
      Span("text", "", "", 2),
      Span("media", "", "https://h.com/i.png", 3))
    assert(HtmlSpans.parse(HtmlSpans.render("d", spans)).toSeq === spans.toSeq)
  }

  test("htmlFetcher produces identical documents to the direct fetcher") {
    val cfg = SiteConfig(universities = 1, deptsPerU = 1, facultyPerDept = 6,
      errorFraction = 0.3)
    val urls = SyntheticSite.seeds(cfg).map(_.url) ++
      (0 until 6).map(k => SyntheticSite.profileUrl(0, 0, k))
    val a = SyntheticSite.fetcher(cfg)
    val b = SyntheticSite.htmlFetcher(cfg)
    urls.foreach { u =>
      (a(u), b(u)) match {
        case (None, None)           => // both error
        case (Some(x), Some(y))     => assert(x.spans.toSeq === y.spans.toSeq, u)
        case (x, y)                 => fail(s"fetchers disagree on $u: $x vs $y")
      }
    }
  }
}
