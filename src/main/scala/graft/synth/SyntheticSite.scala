package graft.synth

import graft.model.{Span, SpanDoc}
import graft.urls.Urls

/** Deterministic synthetic university-site corpus (FIXTURES.md §A).
  *
  * Models the pages the reference scrapes: department faculty index pages
  * (reference `scraper.py:41-55`) and faculty profile pages (reference
  * `scraper.py:122-158`), re-expressed in the interleaved text+media span
  * document model (BASELINE.json input_hint).
  *
  * Everything derives from the URL via splitmix64 mixing — `fetch` is a pure
  * function with no backing map, so executors can materialize any page from
  * its URL alone. That is what lets the same fetcher stand in for the network
  * at a 10^10-URL frontier: page identity is O(1) state.
  *
  * Span conventions (documented in FIXTURES.md):
  *  - `link` spans carry the href in `media_ref` and the anchor text in `text`
  *  - `media` spans carry the image URL in `media_ref`, `text` = ""
  *  - index pages: a nav `link` (not a faculty anchor, precedes all headings),
  *    then per faculty row: `heading`(name), `link`(href, anchor=name),
  *    `text`(title), every 3rd row a `media` headshot
  *  - profile pages: `heading` "Research[ Interests]", `text` interest blob
  *    with `,;•` delimiters (exercises reference `scraper.py:129`), `text`
  *    with exactly one email (reference `scraper.py:133-136`), `media`,
  *    `heading` "[Selected ]Publications", >5 `listitem` pubs each embedding
  *    a 19xx/20xx year (exercises the 5-cap `scraper.py:158` and year
  *    extraction `main.py:263-265`), trailing `link`s back to the index and a
  *    collaborator (exercise depth filtering + URL-seen dedup).
  */
object SyntheticSite {

  final case class SiteConfig(
      universities: Int = 2,
      deptsPerU: Int = 2,
      facultyPerDept: Int = 5,
      errorFraction: Double = 0.0,     // profile pages that fail to fetch
      relativeLinkFraction: Double = 0.5, // hrefs emitted relative (scraper.py:109)
      noLinkFraction: Double = 0.0,    // index rows with no profile anchor
      pubsPerFaculty: Int = 7,
      bioWords: Int = 0,   // extra prose per profile (models real page weight)
      seed: Long = 42L
  )

  final case class Seed(url: String, rank: Int, university: String, department: String)

  private val deptCodes  = Vector("cs", "ee", "math", "bio", "phys", "chem", "stat", "econ")
  private val deptNames  = Vector("Computer Science", "Electrical Engineering", "Mathematics",
    "Biology", "Physics", "Chemistry", "Statistics", "Economics")
  private val firstNames = Vector("Alice", "Bob", "Carol", "David", "Emma", "Frank", "Grace",
    "Henry", "Irene", "Jack", "Karen", "Liam", "Mona", "Nate", "Olga", "Paul", "Quinn", "Rosa",
    "Sam", "Tara")
  private val lastNames = Vector("Smith", "Johnson", "Lee", "Brown", "Garcia", "Chen", "Patel",
    "Kim", "Lopez", "Wang", "Davis", "Miller", "Wilson", "Moore", "Taylor", "Anderson", "Thomas",
    "Jackson", "White", "Harris")
  private val titles = Vector("Professor", "Associate Professor", "Assistant Professor",
    "Lecturer", "Research Professor")
  private val interestPool = Vector("Machine Learning", "Natural Language Processing",
    "Computer Vision", "Distributed Systems", "Databases", "Algorithmic Theory", "Robotics",
    "Human-Computer Interaction", "Security", "Computer Graphics", "Bioinformatics",
    "Quantum Computing")
  private val pubTopics = Vector("Scalable Inference", "Neural Parsing", "Query Optimization",
    "Consensus Protocols", "Sparse Retrieval", "Program Synthesis", "Graph Embeddings",
    "Cache Coherence", "Differential Privacy", "Stream Processing")
  private val pubVenues = Vector("SIGMOD", "NeurIPS", "OSDI", "ACL", "VLDB", "SOSP", "ICML", "KDD")
  private val bioVocab = Vector("research", "students", "teaching", "systems", "models",
    "theory", "applied", "laboratory", "graduate", "projects", "collaboration", "methods",
    "analysis", "design", "published", "conference", "journal", "award", "fellowship",
    "advising", "seminar", "computation", "scalable", "distributed", "learning")

  // ---- deterministic mixing ----
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def rng(seed: Long, parts: Long*): Long =
    parts.foldLeft(mix(seed))((acc, p) => mix(acc ^ p))
  private def pick[A](xs: Vector[A], r: Long): A = xs(((r % xs.size) + xs.size).toInt % xs.size)
  private def frac(r: Long): Double = ((r >>> 11).toDouble / (1L << 53).toDouble)

  // ---- URL space ----
  def hostFor(u: Int, d: Int): String = {
    val code = deptCodes(d % deptCodes.size)
    val sfx  = if (d >= deptCodes.size) (d / deptCodes.size).toString else ""
    s"$code$sfx.u$u.edu"
  }
  def indexUrl(u: Int, d: Int): String  = s"https://${hostFor(u, d)}/people/faculty"
  def profileUrl(u: Int, d: Int, k: Int): String = s"https://${hostFor(u, d)}/people/f$k"
  def universityName(u: Int): String    = s"University $u"
  def departmentName(d: Int): String    = deptNames(d % deptNames.size) + (
    if (d >= deptNames.size) s" ${d / deptNames.size}" else "")

  private val HostRe    = """([a-z]+)(\d*)\.u(\d+)\.edu""".r
  private val ProfileRe = """/people/f(\d+)""".r

  /** Parse a canonical URL of this site into (u, d, kOpt); None if foreign. */
  def parseUrl(url: String): Option[(Int, Int, Option[Int])] = {
    val host = Urls.hostOf(url)
    host match {
      case HostRe(code, sfx, u) =>
        val base = deptCodes.indexOf(code)
        if (base < 0) None
        else {
          val d    = base + (if (sfx.isEmpty) 0 else sfx.toInt * deptCodes.size)
          val path = url.drop(Urls.originOf(url).length)
          path match {
            case "/people/faculty"           => Some((u.toInt, d, None))
            case ProfileRe(k)                => Some((u.toInt, d, Some(k.toInt)))
            case _                           => None
          }
        }
      case _ => None
    }
  }

  def seeds(cfg: SiteConfig): Seq[Seed] = {
    val out = for {
      u <- 0 until cfg.universities
      d <- 0 until cfg.deptsPerU
    } yield (u, d)
    out.zipWithIndex.map { case ((u, d), i) =>
      Seed(indexUrl(u, d), i, universityName(u), departmentName(d))
    }
  }

  // ---- faculty attributes (pure functions of (cfg.seed, u, d, k)) ----
  def facultyName(cfg: SiteConfig, u: Int, d: Int, k: Int): String = {
    val r = rng(cfg.seed, 1L, u, d, k)
    s"Dr. ${pick(firstNames, r)} ${pick(lastNames, mix(r))}"
  }
  def facultyTitle(cfg: SiteConfig, u: Int, d: Int, k: Int): String =
    pick(titles, rng(cfg.seed, 2L, u, d, k))
  def facultyEmail(cfg: SiteConfig, u: Int, d: Int, k: Int): String =
    s"f$k@${hostFor(u, d)}"
  def facultyInterests(cfg: SiteConfig, u: Int, d: Int, k: Int): Seq[String] = {
    val r = rng(cfg.seed, 3L, u, d, k)
    val n = 2 + (((r % 3) + 3) % 3).toInt // 2..4
    (0 until n).map(i => pick(interestPool, rng(cfg.seed, 3L, u, d, k, i)))
  }
  def facultyPubs(cfg: SiteConfig, u: Int, d: Int, k: Int): Seq[String] =
    (0 until cfg.pubsPerFaculty).map { i =>
      val r     = rng(cfg.seed, 4L, u, d, k, i)
      val year  = 1995 + (((r % 30) + 30) % 30).toInt // 1995..2024
      val topic = pick(pubTopics, r)
      val venue = pick(pubVenues, mix(r))
      s"$topic for ${pick(interestPool, mix(r + i))}. $venue $year."
    }
  def isErrorProfile(cfg: SiteConfig, u: Int, d: Int, k: Int): Boolean =
    frac(rng(cfg.seed, 5L, u, d, k)) < cfg.errorFraction
  def rowHasLink(cfg: SiteConfig, u: Int, d: Int, k: Int): Boolean =
    frac(rng(cfg.seed, 6L, u, d, k)) >= cfg.noLinkFraction
  def hrefIsRelative(cfg: SiteConfig, u: Int, d: Int, k: Int): Boolean =
    frac(rng(cfg.seed, 7L, u, d, k)) < cfg.relativeLinkFraction

  /** The href exactly as it appears in the page (pre-canonicalization).
    * Relative forms and decorated absolute forms (fragment, mixed-case host)
    * exercise the canonicalizer the way `scraper.py:109-110` is exercised.
    */
  def hrefFor(cfg: SiteConfig, u: Int, d: Int, k: Int): String =
    if (hrefIsRelative(cfg, u, d, k)) s"/people/f$k"
    else {
      val r = rng(cfg.seed, 8L, u, d, k)
      val base = profileUrl(u, d, k)
      (((r % 3) + 3) % 3).toInt match {
        case 0 => base
        case 1 => base + "#bio" // fragment must be stripped
        case 2 => // mixed-case host must lowercase to the same canonical URL
          val host = hostFor(u, d)
          base.replace(host, host.toUpperCase)
      }
    }

  // ---- page synthesis ----

  /** A serializable fetch function capturing only `cfg` (use this from test
    * suites/benchmarks: eta-expanding `fetch(cfg) _` inside a class captures
    * the enclosing instance, which may not be serializable).
    */
  def fetcher(cfg: SiteConfig): String => Option[SpanDoc] = {
    val c = cfg
    (url: String) => fetch(c)(url)
  }

  /** Fetch through the full network-payload path: page → HTML bytes → parsed
    * spans (graft.extract.HtmlSpans). Identical results to [[fetcher]]
    * (render∘parse is the identity, property-tested) but with realistic
    * per-page parse cost — a crawler's fetch stage spends its CPU here, so
    * benchmarks use this fetcher.
    */
  def htmlFetcher(cfg: SiteConfig): String => Option[SpanDoc] = {
    val c = cfg
    (url: String) =>
      fetch(c)(url).map { doc =>
        val html = graft.extract.HtmlSpans.render(doc.doc_id, doc.spans)
        SpanDoc(doc.doc_id, graft.extract.HtmlSpans.parse(html))
      }
  }

  /** Fetch a page by URL. None = fetch error (4xx/5xx analog) or foreign URL.
    * Pure: same (cfg, url) always yields the same document.
    */
  def fetch(cfg: SiteConfig)(url: String): Option[SpanDoc] = {
    parseUrl(url).flatMap {
      case (u, d, None) if u < cfg.universities && d < cfg.deptsPerU =>
        Some(indexPage(cfg, u, d))
      case (u, d, Some(k))
          if u < cfg.universities && d < cfg.deptsPerU && k < cfg.facultyPerDept =>
        if (isErrorProfile(cfg, u, d, k)) None else Some(profilePage(cfg, u, d, k))
      case _ => None
    }
  }

  def indexPage(cfg: SiteConfig, u: Int, d: Int): SpanDoc = {
    val b = new SpanBuilder
    // page chrome: title as `text` (faculty rows are the only headings on an
    // index page) and a nav link that precedes every heading → anchorKind=nav
    b.add("text", s"${departmentName(d)} Faculty — ${universityName(u)}")
    b.link("About the department", s"https://${hostFor(u, d)}/about")
    for (k <- 0 until cfg.facultyPerDept) {
      val name = facultyName(cfg, u, d, k)
      b.add("heading", name)
      if (rowHasLink(cfg, u, d, k)) b.link(name, hrefFor(cfg, u, d, k))
      b.add("text", facultyTitle(cfg, u, d, k))
      if (k % 3 == 0) b.media(s"https://${hostFor(u, d)}/img/f$k.jpg")
    }
    SpanDoc(indexUrl(u, d), b.result())
  }

  def profilePage(cfg: SiteConfig, u: Int, d: Int, k: Int): SpanDoc = {
    val b = new SpanBuilder
    b.add("heading", facultyName(cfg, u, d, k))
    b.add("text", facultyTitle(cfg, u, d, k))
    val rHead = rng(cfg.seed, 9L, u, d, k)
    b.add("heading", if (frac(rHead) < 0.5) "Research" else "Research Interests")
    val delims = Vector(", ", "; ", " • ")
    val blob = facultyInterests(cfg, u, d, k).zipWithIndex.map { case (s, i) =>
      if (i == 0) s else pick(delims, rng(cfg.seed, 10L, u, d, k, i)) + s
    }.mkString
    b.add("text", blob)
    b.add("text", s"Contact: ${facultyEmail(cfg, u, d, k)} (office ${(k % 7) + 100})")
    b.media(s"https://${hostFor(u, d)}/img/portrait_f$k.png")
    b.add("heading", if (frac(mix(rHead)) < 0.5) "Publications" else "Selected Publications")
    facultyPubs(cfg, u, d, k).foreach(p => b.add("listitem", p))
    b.add("heading", "Links") // closes the publications block
    b.link("All faculty", "/people/faculty") // back-link: dup of the seed (dedup test)
    b.link("Collaborator", s"/people/f${(k + 1) % cfg.facultyPerDept}") // depth-2 link
    if (cfg.bioWords > 0) {
      // prose block AFTER the structured sections: raises realistic page
      // weight (KBs of text) without touching extraction semantics (no '@',
      // no digits, placed after the Links heading)
      b.add("heading", "Biography")
      val words = new StringBuilder(cfg.bioWords * 8)
      var i = 0
      while (i < cfg.bioWords) {
        if (i > 0) words.append(' ')
        words.append(pick(bioVocab, rng(cfg.seed, 11L, u, d, k, i)))
        i += 1
      }
      b.add("text", words.toString)
    }
    SpanDoc(profileUrl(u, d, k), b.result())
  }

  private final class SpanBuilder {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Span]
    def add(kind: String, text: String): Unit = buf += Span(kind, text, "", buf.length)
    def link(text: String, href: String): Unit = buf += Span("link", text, href, buf.length)
    def media(ref: String): Unit = buf += Span("media", "", ref, buf.length)
    def result(): Array[Span] = buf.toArray
  }
}
