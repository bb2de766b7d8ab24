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

  test("roundtrip preserves class context (cls renders as class attributes)") {
    val spans = Array(
      Span("heading", "Jane Doe", "", 0, "views-row field-content"),
      Span("link", "Jane Doe", "/people/jane-doe", 1, "views-row field-content"),
      Span("text", "Professor & Chair", "", 2, "views-row people-title"),
      Span("media", "", "/i.png", 3, "views-row"),
      Span("listitem", "Paper One", "", 4, ""))
    assert(HtmlSpans.parse(HtmlSpans.render("d", spans)).toSeq === spans.toSeq)
  }

  test("parse captures own + inherited classes (descendant-selector carrier)") {
    val html =
      """<body>
        |<div class="views-row">
        |  <div class='field-content'><h3><a href="/people/jane">Jane Doe</a></h3></div>
        |  <div class="people-title">Professor</div>
        |  <img src="/jane.png" class="portrait">
        |</div>
        |<h2>No classes here</h2>
        |</body>""".stripMargin
    val spans = HtmlSpans.parse(html)
    val byKind = spans.map(s => (s.kind, s.text, s.cls)).toSeq
    assert(byKind === Seq(
      ("heading", "Jane Doe", "views-row field-content"),
      ("link", "Jane Doe", "views-row field-content"),
      ("text", "Professor", "views-row people-title"),
      ("media", "", "views-row portrait"),
      ("heading", "No classes here", "")))
  }

  test("hand-written faculty index page (scraper.py:41-55 structures)") {
    // mirrors the reference's selector targets: .views-row containers,
    // .field-content h3 with a nested profile anchor, .people-title div text
    val html =
      """<!DOCTYPE html>
        |<html><head><title>Directory</title>
        |<style>.views-row { margin: 2px }</style>
        |<script>var tracking = "<div>not content</div>";</script>
        |</head>
        |<BODY class="page">
        |<!-- navigation chrome -->
        |<div id=nav><a href="/search">Search</a></div>
        |<div class="views-row">
        |  <div class='field-content'><h3><a href="/people/jane-doe">Jane Doe</a></h3></div>
        |  <div class="people-title">Professor of Computer Science</div>
        |</div>
        |<div class="views-row">
        |  <div class='field-content'><h3><a href='/people/bob-roe'>Bob &amp; Roe</a></h3></div>
        |  <div class="people-title">Associate Professor</div>
        |</div>
        |</BODY></html>""".stripMargin
    val spans = HtmlSpans.parse(html)
    val kinds = spans.map(s => (s.kind, s.text, s.media_ref)).toSeq
    assert(kinds === Seq(
      ("link", "Search", "/search"),
      ("heading", "Jane Doe", ""),
      ("link", "Jane Doe", "/people/jane-doe"),
      ("text", "Professor of Computer Science", ""),
      ("heading", "Bob & Roe", ""),
      ("link", "Bob & Roe", "/people/bob-roe"),
      ("text", "Associate Professor", "")))
    // document order must be dense and sorted
    assert(spans.map(_.offset).toSeq === spans.indices.toSeq)
    // the index-row extractor consumes this directly: heading + nested anchor
    // + title text per row, exactly the scraper's per-row fields
  }

  test("hand-written profile page: ul→li vs div→p publication containers") {
    // scraper.py:142-155 distinguishes a <ul> publications container (li
    // items) from a <div> container (p items); both must surface as spans
    val ulPage =
      """<body><h2>Publications</h2>
        |<ul class="pub-list">
        |  <li>Paper One (2019)</li>
        |  <li>Paper <em>Two</em> (2021)
        |  <li>Paper Three</li>
        |</ul></body>""".stripMargin
    val ulSpans = HtmlSpans.parse(ulPage).filter(_.kind == "listitem").map(_.text)
    assert(ulSpans.length === 3) // second <li> implicitly closed by the third
    assert(ulSpans(0) === "Paper One (2019)")
    assert(ulSpans(1).startsWith("Paper Two (2021)"))
    val divPage =
      """<body><h2>Selected Publications</h2>
        |<div class="publications">
        |  <p>Alpha Journal, 2018</p>
        |  <p>Beta Conf, 2020</p>
        |</div></body>""".stripMargin
    val divSpans = HtmlSpans.parse(divPage)
    assert(divSpans.map(_.kind).toSeq === Seq("heading", "text", "text"))
    assert(divSpans(1).text === "Alpha Journal, 2018")
  }

  test("attribute forms, numeric entities, images, implicit p-close") {
    val html = "<div><IMG SRC=/logo.png alt='x'><p>a &#65;&amp;&#x42; b" +
      "<p>second</p><img src=\"pix/i.jpg\" /></div>"
    val spans = HtmlSpans.parse(html)
    assert(spans.map(s => (s.kind, s.text, s.media_ref)).toSeq === Seq(
      ("media", "", "/logo.png"),
      ("text", "a A&B b", ""),   // numeric + named entities; implicit close
      ("text", "second", ""),
      ("media", "", "pix/i.jpg")))
  }

  test("implicit li/p close fires across an unclosed inline tag (HTML5/bs4 parity)") {
    // `<li>a<b>x<li>b`: the open <b> must not shield the first <li> — two
    // sibling items, no duplicated text (the pre-fix parser nested them)
    val li = HtmlSpans.parse("<ul><li>a<b>x<li>b</li></ul>")
    assert(li.map(s => (s.kind, s.text)).toSeq ===
      Seq(("listitem", "ax"), ("listitem", "b")))
    val p = HtmlSpans.parse("<div><p>one<em>fine</em><p>two</p></div>")
    assert(p.map(s => (s.kind, s.text)).toSeq ===
      Seq(("text", "onefine"), ("text", "two")))
  }

  test("nested find_next('div') shape: bio text after a heading (scraper.py:125)") {
    // profile bio lives in a plain div following the name heading — bare
    // container text must surface as a text span in document order
    val html =
      """<body><div class="profile">
        |<h1>Dr. Jane Doe</h1>
        |<div class="bio">Jane works on <b>machine learning</b> and systems.</div>
        |<div>Contact: jane@example.edu</div>
        |</div></body>""".stripMargin
    val spans = HtmlSpans.parse(html)
    assert(spans.map(s => (s.kind, s.text)).toSeq === Seq(
      ("heading", "Dr. Jane Doe"),
      ("text", "Jane works on machine learning and systems."),
      ("text", "Contact: jane@example.edu")))
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
