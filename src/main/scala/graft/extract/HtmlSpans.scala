package graft.extract

import graft.model.Span

import scala.collection.mutable.ArrayBuffer

/** HTML ⇄ span-document conversion (SURVEY.md §2.10 `parseHtmlSpans`).
  *
  * The reference parses fetched HTML with BeautifulSoup into the ordered
  * element view the extraction operators consume (`scraper.py:35,119`); this
  * is the engine's equivalent boundary: raw page bytes → the interleaved
  * text+media span model (BASELINE.json input_hint). Executed inside the
  * fetch stage's `mapPartitions` — the one place imperative per-row code is
  * the right tool (network + parse), everything downstream is relational.
  *
  * [[parse]] is a single-pass tokenizer over real-world HTML, not a grammar
  * for this engine's own renderer: arbitrary tags with attributes in any
  * order/quoting (the reference's class-addressed containers —
  * `scraper.py:41` `.views-row`, `:46` `.field-content h3`, `:50`
  * `.people-title` — parse as plain containers whose text surfaces as spans),
  * `ul→li` vs `div→p` publication containers (`scraper.py:142-155`), anchors
  * nested inside headings/blocks (`scraper.py:54`), implicit `<p>`/`<li>`
  * closes, void elements, comments/doctype, skipped `script/style/head`
  * subtrees, and named+numeric entities.
  *
  * Span mapping (the block model the span schema encodes):
  *  - h1–h6 → `heading`, p → `text`, li → `listitem`, ordered by OPEN position
  *  - a[href] → `link` (href in `media_ref`); anchors nested in a block also
  *    contribute their text to the block, like bs4 `get_text()`
  *  - img[src] → `media`
  *  - bare text directly inside containers (div/td/section/...) becomes a
  *    `text` span per run (trimmed; whitespace-only runs dropped) — how
  *    `.people-title`-style div text surfaces; inline tags (b/em/span/...)
  *    are transparent to a run
  *  - block/link texts are the verbatim concatenation of their text nodes
  *    (no trim — trimming is an extraction-operator concern, F7/F8), which
  *    also makes render∘parse the identity on span documents (property-
  *    tested, including empty blocks)
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

  /** Entity decode, single pass (replacements are not re-scanned, so escape∘
    * unescape is the identity): named amp/lt/gt/quot/apos/nbsp + numeric
    * `&#NN;` / `&#xNN;`. Unknown or malformed entities pass through verbatim.
    */
  def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val rep: String =
          if (semi > i && semi - i <= 10) {
            s.substring(i + 1, semi) match {
              case "amp"  => "&"
              case "lt"   => "<"
              case "gt"   => ">"
              case "quot" => "\""
              case "apos" => "'"
              case "nbsp" => " "
              case e if e.length > 2 && (e.startsWith("#x") || e.startsWith("#X")) =>
                try Character.toChars(Integer.parseInt(e.substring(2), 16)).mkString
                catch { case _: Exception => null }
              case e if e.length > 1 && e.startsWith("#") =>
                try Character.toChars(e.substring(1).toInt).mkString
                catch { case _: Exception => null }
              case _ => null
            }
          } else null
        if (rep != null) { b.append(rep); i = semi + 1 }
        else { b.append(c); i += 1 }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Render a span document as an HTML page (the synthetic site's "network
    * payload"; also usable to materialize docs for external tools).
    */
  def render(docId: String, spans: Array[Span]): String = {
    val b = new StringBuilder(spans.length * 48 + 128)
    b.append("<!DOCTYPE html><html><head><title>")
      .append(escape(docId)).append("</title></head><body>\n")
    // class context renders as the element's own class attribute (flattened —
    // parse of the rendered page reads it back verbatim, so render∘parse
    // stays the identity including `cls`)
    def cls(s: Span): String =
      if (s.cls.isEmpty) "" else " class=\"" + escape(s.cls) + "\""
    spans.sortBy(_.offset).foreach { s =>
      s.kind match {
        case "heading"  => b.append("<h2").append(cls(s)).append(">")
          .append(escape(s.text)).append("</h2>\n")
        case "text"     => b.append("<p").append(cls(s)).append(">")
          .append(escape(s.text)).append("</p>\n")
        case "listitem" => b.append("<li").append(cls(s)).append(">")
          .append(escape(s.text)).append("</li>\n")
        case "link" => b.append("<a href=\"").append(escape(s.media_ref))
          .append("\"").append(cls(s)).append(">").append(escape(s.text)).append("</a>\n")
        case "media" => b.append("<img src=\"").append(escape(s.media_ref))
          .append("\"").append(cls(s)).append("/>\n")
        case _ => // unknown kinds are not representable; skip
      }
    }
    b.append("</body></html>").toString
  }

  private val BlockKinds: Map[String, String] = Map(
    "h1" -> "heading", "h2" -> "heading", "h3" -> "heading",
    "h4" -> "heading", "h5" -> "heading", "h6" -> "heading",
    "p" -> "text", "li" -> "listitem")

  /** Transparent to a bare-text run: formatting/phrasing tags whose presence
    * must not split surrounding container text ("See <b>x</b> now" is one
    * run). `a` is here too — its text joins the run while ALSO becoming a
    * link span.
    */
  private val InlineTags = Set(
    "a", "b", "i", "em", "strong", "u", "small", "sup", "sub", "span", "abbr",
    "code", "br", "wbr", "font", "time", "label", "mark", "cite", "q", "s")

  private val VoidTags = Set(
    "img", "br", "hr", "meta", "input", "link", "source", "col", "embed",
    "area", "base", "track", "wbr")

  private val SkipSubtree = Set("script", "style", "head", "template", "noscript")

  /** Parse an HTML page into spans (document order, dense offsets). */
  def parse(html: String): Array[Span] = {
    val n = html.length
    // span under construction: text filled at element close (blocks/links)
    final class Proto(val kind: String, val ref: String, val cls: String) {
      var text: String = ""
      var buf: StringBuilder = null
    }
    val out   = ArrayBuffer.empty[Proto]
    var stack = List.empty[(String, Proto, String)] // (tag, collector-or-null, own class)
    var nBlocksOpen = 0
    var nLinksOpen  = 0
    val bare = new StringBuilder

    // class context = ancestors' class attributes outermost-first + the
    // element's own, space-joined (the flat-span carrier for descendant
    // selectors — see Span.cls)
    def inheritedCls(own: String): String = {
      val parts = (stack.reverseIterator.map(_._3) ++ Iterator(own))
        .filter(_.nonEmpty).toList
      if (parts.isEmpty) "" else parts.mkString(" ")
    }

    def flushBare(): Unit = {
      if (bare.nonEmpty) {
        val t = bare.toString.trim
        bare.setLength(0)
        if (t.nonEmpty) {
          // bare container text inherits the enclosing containers' classes —
          // how `.people-title`-style div text becomes class-addressable
          val p = new Proto("text", "", inheritedCls(""))
          p.text = t
          out += p
        }
      }
    }

    def addText(raw: String): Unit = if (raw.nonEmpty) {
      val t = unescape(raw)
      stack.foreach { case (_, pr, _) => if (pr != null) pr.buf.append(t) }
      // container-level run: only text that belongs to NO collector — anchor
      // text surfaces as the link span, not as a duplicate bare-text span
      if (nBlocksOpen == 0 && nLinksOpen == 0) bare.append(t)
    }

    def seal(pr: Proto): Unit = if (pr != null) {
      pr.text = pr.buf.toString
      if (pr.kind == "link") nLinksOpen -= 1 else nBlocksOpen -= 1
    }

    def closeTag(name: String): Unit =
      if (stack.exists(_._1 == name)) {
        if (!InlineTags.contains(name)) flushBare()
        val (above, rest) = stack.span(_._1 != name)
        above.foreach { case (_, pr, _) => seal(pr) } // implicit closes
        seal(rest.head._2)
        stack = rest.tail
      } // else: stray close tag, ignore

    /** End (exclusive '>' position + 1) of a skipped raw subtree. */
    def skipRawUntilClose(tag: String, from: Int): Int = {
      val target = "</" + tag
      var i = from
      while (i < n) {
        val lt = html.indexOf('<', i)
        if (lt < 0) return n
        if (html.regionMatches(true, lt, target, 0, target.length)) {
          val gt = html.indexOf('>', lt)
          return if (gt < 0) n else gt + 1
        }
        i = lt + 1
      }
      n
    }

    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { addText(html.substring(i)); i = n }
      else {
        if (lt > i) addText(html.substring(i, lt))
        if (lt + 1 >= n) { i = n }
        else if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else if (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?') {
          val gt = html.indexOf('>', lt)
          i = if (gt < 0) n else gt + 1
        } else if (html.charAt(lt + 1) == '/') {
          var j = lt + 2
          while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
          val name = html.substring(lt + 2, j).toLowerCase
          val gt = html.indexOf('>', j)
          closeTag(name)
          i = if (gt < 0) n else gt + 1
        } else if (html.charAt(lt + 1).isLetter) {
          // open tag: name + attributes (quote-aware — '>' inside a quoted
          // attribute value must not end the tag)
          var j = lt + 1
          while (j < n && html.charAt(j).isLetterOrDigit) j += 1
          val tag = html.substring(lt + 1, j).toLowerCase
          var selfClose = false
          val attrs = Map.newBuilder[String, String]
          while (j < n && html.charAt(j) != '>') {
            val c = html.charAt(j)
            if (c == '/' && j + 1 < n && html.charAt(j + 1) == '>') { selfClose = true; j += 1 }
            else if (c.isWhitespace || c == '/') j += 1
            else {
              val as = j
              while (j < n && !html.charAt(j).isWhitespace &&
                html.charAt(j) != '=' && html.charAt(j) != '>' && html.charAt(j) != '/') j += 1
              val aname = html.substring(as, j).toLowerCase
              while (j < n && html.charAt(j).isWhitespace) j += 1
              var avalue = ""
              if (j < n && html.charAt(j) == '=') {
                j += 1
                while (j < n && html.charAt(j).isWhitespace) j += 1
                if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                  val q = html.charAt(j); j += 1
                  val vs = j
                  while (j < n && html.charAt(j) != q) j += 1
                  avalue = html.substring(vs, j)
                  if (j < n) j += 1
                } else {
                  val vs = j
                  while (j < n && !html.charAt(j).isWhitespace && html.charAt(j) != '>') j += 1
                  avalue = html.substring(vs, j)
                }
              }
              if (aname.nonEmpty) attrs += aname -> avalue
            }
          }
          i = if (j < n) j + 1 else n
          val a = attrs.result()

          if (SkipSubtree.contains(tag)) {
            if (!selfClose) i = skipRawUntilClose(tag, i)
          } else {
            if (!InlineTags.contains(tag)) flushBare()
            // implicit close: a <p>/<li>-family tag opening while the same tag
            // is open with only INLINE tags in between closes it (HTML5 / bs4
            // behavior: `<li>a<b>x<li>b` is two sibling items, the unclosed
            // <b> does not shield the first <li> from the implicit close —
            // closeTag pops and seals the intervening inline entries)
            if (BlockKinds.contains(tag)) {
              val boundary = stack.dropWhile(e => InlineTags.contains(e._1))
              if (boundary.nonEmpty && boundary.head._1 == tag) closeTag(tag)
            }
            val ownCls = unescape(a.getOrElse("class", ""))
            if (BlockKinds.contains(tag)) {
              val p = new Proto(BlockKinds(tag), "", inheritedCls(ownCls))
              p.buf = new StringBuilder
              out += p
              if (selfClose) { p.text = "" }
              else { stack ::= (tag, p, ownCls); nBlocksOpen += 1 }
            } else if (tag == "img") {
              a.get("src").foreach { src =>
                out += new Proto("media", unescape(src), inheritedCls(ownCls))
              }
            } else if (tag == "a" && a.contains("href") && !selfClose) {
              val p = new Proto("link", unescape(a("href")), inheritedCls(ownCls))
              p.buf = new StringBuilder
              out += p
              stack ::= ("a", p, ownCls)
              nLinksOpen += 1
            } else if (VoidTags.contains(tag) || selfClose) {
              () // void / self-closed container: no span, nothing to push
            } else {
              stack ::= (tag, null, ownCls)
            }
          }
        } else {
          addText("<") // stray '<' that is not a tag
          i = lt + 1
        }
      }
    }
    flushBare()
    stack.foreach { case (_, pr, _) => seal(pr) } // unclosed at EOF

    val spans = new Array[Span](out.length)
    var k = 0
    while (k < out.length) {
      val p = out(k)
      spans(k) = Span(p.kind, p.text, p.ref, k, p.cls)
      k += 1
    }
    spans
  }
}
