package graft.model

/** Core data model of the engine.
  *
  * Shapes are derived from the reference's behavior (see SURVEY.md §1):
  *  - `Span`/`SpanDoc`: the interleaved text+media document model mandated by
  *    BASELINE.json `input_hint` — an ordered sequence of typed fragments as
  *    produced by the reference's HTML parse (reference `scraper.py:35-55`,
  *    `scraper.py:119-155`).
  *  - `FacultyRecord`: the scraper's output row (reference `scraper.py:69-78`).
  *  - `FrontierEntry`: the explicit form of the reference's implicit URL
  *    work-list (reference `scraper.py:43-63`), extended with the fields the
  *    north rule requires (hash key, host, depth, priority, retries, wave).
  */
final case class Span(
    kind: String,      // heading | text | listitem | link | media
    text: String,      // visible text ("" for pure media spans)
    media_ref: String, // image/object URL ("" for text kinds)
    offset: Int,       // document position, 0-based, dense
    /** CSS class context: the element's own class attribute plus its
      * ancestors' (outermost first), space-joined — the flat-span carrier for
      * the reference's class-ADDRESSED selectors (`scraper.py:41` `.views-row`,
      * `:46` `.field-content h3`, `:50` `.people-title`): a descendant
      * selector `.c kind` becomes "kind spans whose cls contains token c".
      * "" when no class anywhere on the path (and for non-HTML producers).
      */
    cls: String = ""
)

/** An interleaved text+media document (one fetched page). */
final case class SpanDoc(
    doc_id: String, // canonical URL of the page
    spans: Array[Span]
) {
  override def equals(o: Any): Boolean = o match {
    case d: SpanDoc => d.doc_id == doc_id && d.spans.sameElements(spans)
    case _          => false
  }
  override def hashCode: Int =
    doc_id.hashCode * 31 + java.util.Arrays.hashCode(spans.asInstanceOf[Array[AnyRef]])
}

object FrontierStatus {
  val Pending = "pending"
  val Fetched = "fetched"
  val Error   = "error"
}

/** One URL in the crawl frontier.
  *
  * @param url            canonical URL (see [[graft.urls.Urls.canonicalize]])
  * @param urlHash        xxhash64(url) — the identity key for URL-seen
  * @param host           lowercased host, partitioning key for politeness
  * @param depth          0 = seed (index page), 1 = profile page, ...
  * @param priority       batch-selection priority (higher fetched first)
  * @param status         pending | fetched | error
  * @param retries        fetch attempts that failed so far
  * @param discoveredWave wave in which this URL was first enqueued
  * @param discoveredRank intra-parent document-order rank (reference fetch
  *                       order is index-document order, scraper.py:43)
  * @param parentUrl      URL of the page that linked here ("" for seeds)
  */
final case class FrontierEntry(
    url: String,
    urlHash: Long,
    host: String,
    depth: Int,
    priority: Double,
    status: String,
    retries: Int,
    discoveredWave: Int,
    discoveredRank: Long,
    parentUrl: String
)

/** A link discovered on a fetched page (pre-canonicalization). */
final case class Link(url: String, anchorKind: String, rank: Long)

/** Result of fetching one frontier entry (produced by the fetch stage). */
final case class FetchResult(
    url: String,
    urlHash: Long,
    host: String,
    depth: Int,
    wave: Int,
    discoveredRank: Long,
    ok: Boolean,
    spans: Array[Span],
    links: Array[Link],
    fetchMs: Long
)

/** The scraper's output row — reference `scraper.py:69-78`. */
final case class FacultyRecord(
    name: String,
    title: String,
    university: String,
    department: String,
    email: String,
    research_interests: Seq[String],
    publications: Seq[String],
    profile_url: String
)

/** One committed fetch in the crawl ordering list (the exactness artifact the
  * north rule compares against the sequential oracle).
  */
final case class CrawlOrderEntry(
    seq: Long,  // global committed position (wave-major, host, intra-host rank)
    wave: Int,
    host: String,
    hostRank: Long, // intra-host position within the wave
    url: String
)

/** Per-host robots rules, broadcast-joined onto the frontier (SURVEY §2.8 G9).
  * The reference has no robots handling; default = allow-all with the
  * reference's 1 req/s budget (reference `scraper.py:83`).
  */
final case class RobotsRule(
    host: String,
    denyPrefixes: Seq[String],
    crawlDelayS: Double
)

/** Per-wave, per-host crawl metrics (north rule: per-partition lineage+metrics). */
final case class WaveMetric(
    wave: Int,
    host: String,
    fetched: Long,
    errors: Long,
    fetchMsTotal: Long,
    urlsEnqueued: Long // per-wave total (enqueues are attributed to the wave, not the host)
)
