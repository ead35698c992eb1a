package graft.text

import scala.collection.mutable

/** Strict subset HTML tokenizer + tree builder — the DOM layer under
  * [[MainContent]]'s boilerplate-strip heuristics (the north rule's
  * "HTML boilerplate strip … DOM heuristics" capability; the reference
  * handles only already-extracted text, so this layer is specified by the
  * published WHATWG grammar subset below, not by reference behavior).
  *
  * Supported subset — everything OUTSIDE it throws with position context
  * (the PdfText/PdfPages "reject loudly" contract; a web-scale pipeline
  * must see malformed markup as data it routed to the wrong parser, not
  * silently mis-extract):
  *  - elements with lowercase-folded names `[a-zA-Z][a-zA-Z0-9-]*`,
  *    attributes `name`, `name=bare`, `name="…"`, `name='…'` (values
  *    entity-decoded), self-closing `/>` and HTML void elements;
  *  - raw-text elements `script`/`style`: content scanned verbatim to the
  *    matching case-insensitive close tag, NOT entity-decoded;
  *  - `<!-- … -->` comments (dropped) and a `<!doctype …>` declaration
  *    (dropped); CDATA sections and processing instructions are rejected;
  *  - character references via [[HtmlEntities.unescape]] in text and
  *    attribute values;
  *  - every non-void open tag must be explicitly closed by ITS name —
  *    in the default STRICT mode, mis-nesting, stray close tags, and EOF
  *    inside an element throw (this parser feeds a deterministic
  *    extraction oracle, so ambiguity is an error there);
  *    `parse(html, lenient = true)` — the crawl-ingest mode — instead
  *    applies the deterministic WHATWG tree-recovery subset documented on
  *    that overload (implied end tags, mismatched-close auto-close, EOF
  *    auto-close). Lexical errors throw in BOTH modes.
  *
  * Text nodes keep their character data verbatim (entity-decoded);
  * whitespace-ONLY text nodes (inter-tag indentation) are dropped at tree
  * build. Whitespace normalization beyond that is downstream's job
  * ([[Normalization]]) — collapsing here would destroy the byte-exact
  * span round trip the catalog oracle checks.
  */
object HtmlDom {

  sealed trait Node
  final case class Text(data: String) extends Node
  final case class Elem(
      tag: String,
      attrs: Vector[(String, String)],
      children: Vector[Node]) extends Node {
    def attr(name: String): Option[String] =
      attrs.collectFirst { case (k, v) if k == name => v }
    def classes: Set[String] =
      attr("class").map(_.split("\\s+").filter(_.nonEmpty).toSet).getOrElse(Set.empty)
  }

  /** HTML void elements (WHATWG §13.1.2): never have content or a close tag. */
  val VoidTags: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")

  /** Raw-text elements: content is script data, not markup. */
  val RawTextTags: Set[String] = Set("script", "style")

  /** Tags whose OPEN tag implies `</p>` when a `p` is open (WHATWG
    * §13.2.6.4.7 "in body", the `<p>`-in-button-scope close list) — the
    * single most common real-web omission (`<p>one<p>two<div>`).
    */
  val PClosingTags: Set[String] = Set(
    "address", "article", "aside", "blockquote", "details", "div", "dl",
    "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2", "h3",
    "h4", "h5", "h6", "header", "hr", "main", "menu", "nav", "ol", "p",
    "pre", "section", "table", "ul")

  /** Sibling-implied end tags (WHATWG "generate implied end tags"): opening
    * the KEY tag closes an open element in the VALUE set sitting on top of
    * the stack (`<li>a<li>b`, `<tr>..<tr>`, `<dt>..<dd>`).
    */
  val SiblingClosers: Map[String, Set[String]] = Map(
    "li" -> Set("li"), "dt" -> Set("dt", "dd"), "dd" -> Set("dt", "dd"),
    "tr" -> Set("tr", "td", "th"), "td" -> Set("td", "th"),
    "th" -> Set("td", "th"), "option" -> Set("option"))

  private def fail(html: String, pos: Int, msg: String): Nothing = {
    val ctx = html.substring(math.max(0, pos - 20), math.min(html.length, pos + 20))
      .replace("\n", "\\n")
    throw new IllegalArgumentException(s"HTML parse error at offset $pos: $msg (…$ctx…)")
  }

  private def isNameStart(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isNameChar(c: Char) =
    isNameStart(c) || (c >= '0' && c <= '9') || c == '-'
  private def isWs(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Parse a complete document/fragment. Top-level nodes (after dropping
    * the doctype, comments, and whitespace-only text) hang off a synthetic
    * `#root` element, so fragments without a single `<html>` envelope
    * parse too.
    */
  def parse(html: String): Elem = parse(html, lenient = false)

  /** Parse with an optional LENIENT tree-recovery mode — the crawl-ingest
    * path's parser (real-web HTML omits close tags constantly; an ingest
    * job that dies on the first `<p>a<p>b` cannot process a crawl). The
    * recovery rules are the deterministic core of the WHATWG tree builder:
    *
    *  - IMPLIED END TAGS: opening a [[PClosingTags]] member while `p` is
    *    the innermost open element closes the `p` ([`<p>one<p>two<div>`]);
    *    opening a [[SiblingClosers]] key closes a matching open sibling on
    *    top of the stack (`<li>a<li>b`, `<tr>…<tr>`, `<dt>…<dd>`) —
    *    applied repeatedly, so `<li><p>text<li>` closes both.
    *  - MISMATCHED CLOSE TAG `</x>`: when `x` is open somewhere on the
    *    stack, every deeper unclosed element is auto-closed first (the
    *    `<b><i>t</b>` shape closes the `i`); a close tag for a tag that
    *    is NOT open is ignored (HTML5 parse error → ignore-token path).
    *  - EOF auto-closes all open elements.
    *
    * Recovery is TREE-level only: lexical errors (CDATA, processing
    * instructions, unterminated comments / raw text / attribute values)
    * still throw in both modes — a page broken at the byte level is
    * quarantine data, not a tree to guess at (WarcIngestJob's error
    * channel catches these per page).
    */
  def parse(html: String, lenient: Boolean): Elem = {
    var i = if (html.nonEmpty && html.charAt(0) == '\uFEFF') 1 else 0
    val n = html.length
    // (tag, attrs, children-so-far) frames; root frame has tag "#root"
    val stack = mutable.ArrayBuffer[(String, Vector[(String, String)], mutable.ArrayBuffer[Node])](
      ("#root", Vector.empty, mutable.ArrayBuffer[Node]()))

    def addText(raw: String): Unit =
      if (raw.nonEmpty && !raw.forall(isWs)) stack.last._3 += Text(HtmlEntities.unescape(raw))

    // pop the innermost open element and graft it into its parent (the
    // shared step of explicit closes and every lenient auto-close)
    def closeTop(): Unit = {
      val (openTag, openAttrs, kids) = stack.remove(stack.length - 1)
      stack.last._3 += Elem(openTag, openAttrs, kids.toVector)
    }

    def readName(at: Int): (String, Int) = {
      if (at >= n || !isNameStart(html.charAt(at))) fail(html, at, "expected tag name")
      var j = at + 1
      while (j < n && isNameChar(html.charAt(j))) j += 1
      (html.substring(at, j).toLowerCase(java.util.Locale.ROOT), j)
    }

    def skipWs(at: Int): Int = { var j = at; while (j < n && isWs(html.charAt(j))) j += 1; j }

    // parses attributes from `at` to the closing '>'; returns (attrs, selfClosing, posAfterGt)
    def readAttrs(at: Int): (Vector[(String, String)], Boolean, Int) = {
      val attrs = Vector.newBuilder[(String, String)]
      var j = skipWs(at)
      while (true) {
        if (j >= n) fail(html, j, "EOF inside tag")
        val c = html.charAt(j)
        if (c == '>') return (attrs.result(), false, j + 1)
        if (c == '/') {
          val k = skipWs(j + 1)
          if (k >= n || html.charAt(k) != '>') fail(html, j, "stray '/' in tag")
          return (attrs.result(), true, k + 1)
        }
        if (!isNameStart(c)) fail(html, j, s"unexpected '$c' in tag")
        val (aname, afterName) = readName(j)
        j = skipWs(afterName)
        if (j < n && html.charAt(j) == '=') {
          j = skipWs(j + 1)
          if (j >= n) fail(html, j, "EOF in attribute value")
          val q = html.charAt(j)
          if (q == '"' || q == '\'') {
            val end = html.indexOf(q, j + 1)
            if (end < 0) fail(html, j, "unterminated quoted attribute value")
            attrs += (aname -> HtmlEntities.unescape(html.substring(j + 1, end)))
            j = skipWs(end + 1)
          } else {
            var k = j
            while (k < n && !isWs(html.charAt(k)) && html.charAt(k) != '>') k += 1
            if (k == j) fail(html, j, "empty unquoted attribute value")
            attrs += (aname -> HtmlEntities.unescape(html.substring(j, k)))
            j = skipWs(k)
          }
        } else {
          attrs += (aname -> "") // boolean attribute
          j = skipWs(j)
        }
      }
      sys.error("unreachable")
    }

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { addText(html.substring(i)); i = n }
      else {
        addText(html.substring(i, lt))
        if (lt + 1 >= n) {
          if (lenient) { addText("<"); i = n } else fail(html, lt, "EOF after '<'")
        } else if (lenient && html.charAt(lt + 1) != '!' && html.charAt(lt + 1) != '?' &&
            html.charAt(lt + 1) != '/' && !isNameStart(html.charAt(lt + 1))) {
          // HTML5 data state: '<' before a non-letter is LITERAL TEXT
          // ("if x < 10" is everywhere on the real web) — strict mode still
          // rejects, the crawl path must not quarantine the whole page
          addText("<"); i = lt + 1
        } else if (lenient && html.charAt(lt + 1) == '/' &&
            (lt + 2 >= n || !isNameStart(html.charAt(lt + 2)))) {
          // '</' before a non-letter is a bogus comment per spec: skip to '>'
          val end = html.indexOf('>', lt + 2)
          i = if (end < 0) n else end + 1
        } else html.charAt(lt + 1) match {
          case '!' =>
            if (html.startsWith("<!--", lt)) {
              val end = html.indexOf("-->", lt + 4)
              if (end < 0) fail(html, lt, "unterminated comment")
              i = end + 3
            } else if (html.startsWith("<![CDATA[", lt)) {
              fail(html, lt, "CDATA sections are not in the supported subset")
            } else if (html.regionMatches(true, lt + 2, "doctype", 0, 7)) {
              val end = html.indexOf('>', lt)
              if (end < 0) fail(html, lt, "unterminated doctype")
              i = end + 1
            } else fail(html, lt, "unsupported markup declaration")
          case '?' => fail(html, lt, "processing instructions are not in the supported subset")
          case '/' =>
            val (name, afterName) = readName(lt + 2)
            val gt = skipWs(afterName)
            if (gt >= n || html.charAt(gt) != '>') fail(html, gt, s"malformed close tag </$name")
            if (lenient) {
              // auto-close deeper unclosed elements down to the matching
              // open tag; ignore a close tag for a tag that is not open
              val at = stack.lastIndexWhere(_._1 == name)
              if (at >= 1) { // 0 is the synthetic #root frame
                while (stack.length > at) closeTop()
              }
            } else {
              if (stack.length == 1) fail(html, lt, s"stray close tag </$name> at top level")
              if (stack.last._1 != name)
                fail(html, lt, s"mis-nested close tag: </$name> closes <${stack.last._1}>")
              closeTop()
            }
            i = gt + 1
          case _ =>
            val (name, afterName) = readName(lt + 1)
            val (attrs, selfClosed, afterGt) = readAttrs(afterName)
            if (lenient) {
              // implied end tags (before ANY open, void ones included —
              // `<p>text<hr>` closes the p): </p> before a p-closing
              // block, sibling closes for li/dt/dd/tr/td/th/option —
              // repeatedly, so `<li><p>text<li>` closes the p then the li
              val sib = SiblingClosers.getOrElse(name, Set.empty)
              var closing = true
              while (closing && stack.length > 1) {
                val top = stack.last._1
                // a sibling-closer (li/dt/dd/tr/td/th/option) ALSO closes an
                // open p above the sibling it closes — WHATWG "generate
                // implied end tags" runs before the sibling pop, so
                // `<li><p>text<li>` closes the p then the li (previously
                // the second li nested inside the first item's p)
                if ((top == "p" && (PClosingTags.contains(name) || sib.nonEmpty)) ||
                    sib.contains(top))
                  closeTop()
                else closing = false
              }
            }
            if (VoidTags.contains(name) || selfClosed) {
              stack.last._3 += Elem(name, attrs, Vector.empty)
              i = afterGt
            } else if (RawTextTags.contains(name)) {
              // scan verbatim to the matching case-insensitive close tag
              var j = afterGt
              var end = -1
              while (end < 0) {
                val c = html.indexOf('<', j)
                if (c < 0) fail(html, afterGt, s"unterminated <$name> raw text")
                if (c + 1 < n && html.charAt(c + 1) == '/' &&
                    html.regionMatches(true, c + 2, name, 0, name.length)) {
                  val after = skipWs(c + 2 + name.length)
                  if (after < n && html.charAt(after) == '>') end = c
                  else j = c + 1
                } else j = c + 1
              }
              val raw = html.substring(afterGt, end)
              val kids = if (raw.isEmpty) Vector.empty else Vector[Node](Text(raw))
              stack.last._3 += Elem(name, attrs, kids)
              val close = html.indexOf('>', end)
              i = close + 1
            } else {
              stack += ((name, attrs, mutable.ArrayBuffer[Node]()))
              i = afterGt
            }
        }
      }
    }
    if (stack.length != 1) {
      if (lenient) while (stack.length > 1) closeTop() // EOF auto-close
      else {
        val open = stack.drop(1).map(_._1).mkString("<", ">, <", ">")
        fail(html, n, s"EOF with unclosed elements: $open")
      }
    }
    val (_, _, kids) = stack.head
    Elem("#root", Vector.empty, kids.toVector)
  }
}
