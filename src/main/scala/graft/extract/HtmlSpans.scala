package graft.extract

import graft.model.Span

/** HTML ⇄ span-document conversion (SURVEY.md §2.10 `parseHtmlSpans`).
  *
  * The reference parses fetched HTML with BeautifulSoup into the ordered
  * element view the extraction operators consume (`scraper.py:35,119`); this
  * is the engine's equivalent boundary: raw page bytes → the interleaved
  * text+media span model (BASELINE.json input_hint). Executed inside the
  * fetch stage's `mapPartitions` — the one place imperative per-row code is
  * the right tool (network + parse), everything downstream is relational.
  *
  * The subset of HTML handled is the block model the span schema encodes:
  * h1-h6 → heading, p → text, li → listitem, a[href] → link (anchor text in
  * `text`, href in `media_ref`), img[src] → media. Entities &amp; &lt; &gt;
  * &quot; are escaped/unescaped so render∘parse is the identity on span
  * documents (property-tested).
  */
object HtmlSpans {

  def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => b.append("&amp;")
        case '<' => b.append("&lt;")
        case '>' => b.append("&gt;")
        case '"' => b.append("&quot;")
        case c   => b.append(c)
      }
      i += 1
    }
    b.toString
  }

  def unescape(s: String): String =
    s.replace("&quot;", "\"").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&amp;", "&")

  /** Render a span document as an HTML page (the synthetic site's "network
    * payload"; also usable to materialize docs for external tools).
    */
  def render(docId: String, spans: Array[Span]): String = {
    val b = new StringBuilder(spans.length * 48 + 128)
    b.append("<!DOCTYPE html><html><head><title>")
      .append(escape(docId)).append("</title></head><body>\n")
    spans.sortBy(_.offset).foreach { s =>
      s.kind match {
        case "heading"  => b.append("<h2>").append(escape(s.text)).append("</h2>\n")
        case "text"     => b.append("<p>").append(escape(s.text)).append("</p>\n")
        case "listitem" => b.append("<li>").append(escape(s.text)).append("</li>\n")
        case "link" => b.append("<a href=\"").append(escape(s.media_ref))
          .append("\">").append(escape(s.text)).append("</a>\n")
        case "media" => b.append("<img src=\"").append(escape(s.media_ref))
          .append("\"/>\n")
        case _ => // unknown kinds are not representable; skip
      }
    }
    b.append("</body></html>").toString
  }

  private val Tag = ("""(?s)<h2>(.*?)</h2>|<p>(.*?)</p>|<li>(.*?)</li>|""" +
    """<a href="(.*?)">(.*?)</a>|<img src="(.*?)"/>""").r

  /** Parse an HTML page into spans (document order, dense offsets). */
  def parse(html: String): Array[Span] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Span]
    var off = 0
    for (m <- Tag.findAllMatchIn(html)) {
      val span =
        if (m.group(1) != null) Span("heading", unescape(m.group(1)), "", off)
        else if (m.group(2) != null) Span("text", unescape(m.group(2)), "", off)
        else if (m.group(3) != null) Span("listitem", unescape(m.group(3)), "", off)
        else if (m.group(4) != null)
          Span("link", unescape(m.group(5)), unescape(m.group(4)), off)
        else Span("media", "", unescape(m.group(6)), off)
      out += span
      off += 1
    }
    out.toArray
  }
}
