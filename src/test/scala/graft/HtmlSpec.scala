package graft

import graft.text.{HtmlDom, MainContent}
import graft.text.HtmlDom.{Elem, Text}
import org.scalatest.funsuite.AnyFunSuite

/** HTML DOM parser + main-content heuristics: grammar subset and loud
  * rejections, the scoring discriminators (link density, tag weight,
  * class hints, chrome removal), and the interleaved span emission the
  * q_html_spans/q_html_main oracles check end to end.
  */
class HtmlSpec extends AnyFunSuite {

  private def parse(s: String) = HtmlDom.parse(s)

  // ---- parser: accepted subset ----------------------------------------------

  test("tree shape, attributes, boolean and unquoted attrs") {
    val root = parse("""<div id="a" class='x y' data-k=7 hidden><p>hi</p></div>""")
    val div = root.children.head.asInstanceOf[Elem]
    assert(div.tag == "div")
    assert(div.attr("id").contains("a"))
    assert(div.classes == Set("x", "y"))
    assert(div.attr("data-k").contains("7"))
    assert(div.attr("hidden").contains(""))
    val p = div.children.head.asInstanceOf[Elem]
    assert(p.tag == "p" && p.children == Vector(Text("hi")))
  }

  test("entities decode in text and attribute values; tag names case-fold") {
    val root = parse("""<P TITLE="a &amp; b">x &lt;= y &#228;</P>""")
    val p = root.children.head.asInstanceOf[Elem]
    assert(p.tag == "p")
    assert(p.attr("title").contains("a & b"))
    assert(p.children == Vector(Text("x <= y ä")))
  }

  test("void elements, self-closing, comments, doctype, whitespace-only text") {
    val root = parse(
      "<!DOCTYPE html>\n<div>\n  <img src=\"u\" alt=\"t\">\n  <br/>\n  <!-- note -->\n</div>")
    val div = root.children.head.asInstanceOf[Elem]
    // whitespace-only runs and the comment vanish; img/br are leaves
    assert(div.children.map(_.asInstanceOf[Elem].tag) == Vector("img", "br"))
  }

  test("script raw text keeps a bare '<' and is not entity-decoded") {
    val root = parse("<head><script>if (1 < 2 && x) { run('&amp;'); }</script></head>")
    val script = root.children.head.asInstanceOf[Elem].children.head.asInstanceOf[Elem]
    assert(script.tag == "script")
    assert(script.children == Vector(Text("if (1 < 2 && x) { run('&amp;'); }")))
  }

  // ---- parser: loud rejections ----------------------------------------------

  test("mis-nesting, stray close, unclosed EOF, CDATA, PI all throw with position") {
    val bad = Seq(
      "<div><p>x</div></p>",        // mis-nested close
      "</div>",                     // stray close at top level
      "<div><p>x",                  // EOF with unclosed elements
      "<div><![CDATA[x]]></div>",   // CDATA
      "<?xml version=\"1.0\"?>",    // processing instruction
      "<!-- never closed",          // unterminated comment
      "<p title=\"x>y</p>",         // unterminated quoted value
      "<script>var x = 1;")         // unterminated raw text
    bad.foreach { h =>
      val e = intercept[IllegalArgumentException](parse(h))
      assert(e.getMessage.contains("offset"), s"no position in: ${e.getMessage}")
    }
  }

  // ---- heuristics: container selection --------------------------------------

  test("link density sinks a link farm against plain prose (no hints anywhere)") {
    val prose = "plain words " * 20
    val html =
      s"""<body><div><a href="/1">${"link text " * 12}</a><a href="/2">${"more links " * 12}</a></div>
         |<div><p>$prose</p></div></body>""".stripMargin
    val ex = MainContent.extractHtml(html)
    assert(ex.spans.exists(_.text.startsWith("plain words")))
    assert(!ex.mainText.contains("link text"))
  }

  test("a positive class hint wins over an unhinted div of equal mass") {
    val t = "same amount of body text in both containers here " * 4
    val html = s"""<body><div><p>$t</p></div><div class="post-content"><p>$t PICKED</p></div></body>"""
    val ex = MainContent.extractHtml(html)
    assert(ex.mainText.contains("PICKED"))
  }

  test("article outweighs the body shell that contains it") {
    val html = "<body><article><p>the piece</p></article></body>"
    val ex = MainContent.extractHtml(html)
    assert(ex.containerTag == "article")
  }

  test("negative-hint and chrome subtrees are dead: not candidates, not text") {
    val html =
      """<body><article><p>short article</p></article>
        |<div class="comments"><p>a very long comment thread with far more characters than the article itself has, repeated opinions, replies to replies, and still more text</p></div>
        |<nav><a href="/x">everything about navigation menus and their many many links</a></nav></body>""".stripMargin
    val ex = MainContent.extractHtml(html)
    assert(ex.containerTag == "article")
    assert(ex.mainText == "short article")
  }

  test("chrome inside the chosen container is stripped without breaking the inline run") {
    val html =
      """<article><p>kept one</p><div class="share">tweet this</div><p>kept two</p>
        |before <aside>chrome</aside>after</article>""".stripMargin
    val ex = MainContent.extractHtml(html)
    assert(ex.spans.map(_.text) == Vector("kept one", "kept two", "before after"))
  }

  test("a chrome-only page throws loudly instead of returning an empty row") {
    val e = intercept[IllegalArgumentException](
      MainContent.extractHtml("<body><nav><a href='/'>only chrome</a></nav></body>"))
    assert(e.getMessage.contains("no candidate"))
  }

  // ---- span emission ---------------------------------------------------------

  test("interleaved spans: kinds, offsets, media_ref, inline flattening, br") {
    val html =
      """<article><h1>The Title</h1><p>first <b>bold</b> and <a href="/r">linked</a> words</p>
        |<img src="media://m/1" alt="a figure">
        |<p>line one<br>line two</p>stray tail text</article>""".stripMargin
    val ex = MainContent.extractHtml(html)
    assert(ex.spans.map(s => (s.kind, s.text, s.media_ref, s.offset)) == Vector(
      ("heading", "The Title", "", 0),
      ("text", "first bold and linked words", "", 1),
      ("image", "a figure", "media://m/1", 2),
      ("text", "line one\nline two", "", 3),
      ("text", "stray tail text", "", 4)))
    assert(ex.mainText ==
      "The Title\n\nfirst bold and linked words\n\nline one\nline two\n\nstray tail text")
  }

  test("nested containers recurse block-wise; list items are block leaves") {
    val html = "<main><div><p>alpha</p></div><ul><li>one</li><li>two</li></ul></main>"
    val ex = MainContent.extractHtml(html)
    assert(ex.spans.map(_.text) == Vector("alpha", "one", "two"))
    assert(ex.spans.map(_.offset) == Vector(0, 1, 2))
  }

  // ---- the synthesized catalog page round-trips -----------------------------

  test("htmlPageFor round-trips text with HTML-hostile characters") {
    val text = "a & b < c. d > e \"quoted\" 'apos'. tail"
    val ex = MainContent.extractHtml(graft.ops.Queries.htmlPageFor(8L, text))
    assert(ex.containerTag == "article")
    val kinds = ex.spans.map(_.kind)
    // doc 8 % 4 == 0 → heading, piece0, image, piece1, piece2
    assert(kinds == Vector("heading", "text", "image", "text", "text"))
    assert(ex.spans(2).media_ref == "media://doc_8/img_0")
    assert(ex.spans.filter(_.kind == "text").map(_.text) ==
      text.split("\\. ", -1).toVector)
  }

  test("htmlPageFor without planted image keeps offsets dense") {
    val ex = MainContent.extractHtml(graft.ops.Queries.htmlPageFor(7L, "one. two"))
    assert(ex.spans.map(s => (s.kind, s.offset)) ==
      Vector(("heading", 0), ("text", 1), ("text", 2)))
    assert(ex.mainText == "Doc 7 title\n\none\n\ntwo")
  }

  test("sloppy page wrap recovers to the identical extraction; strict rejects it") {
    for (docId <- Seq(7L, 8L)) { // with and without the planted figure
      val text = "a & b < c. second piece. third"
      val clean = MainContent.extractHtml(graft.ops.Queries.htmlPageFor(docId, text))
      val sloppy = MainContent.extractHtmlLenient(
        graft.ops.Queries.htmlPageSloppyFor(docId, text))
      assert(sloppy.containerTag == clean.containerTag)
      assert(sloppy.spans == clean.spans)
      intercept[IllegalArgumentException](
        MainContent.extractHtml(graft.ops.Queries.htmlPageSloppyFor(docId, text)))
    }
  }

  test("PageMeta: title/lang/description/canonical first-match, links in document order") {
    val m = graft.text.PageMeta.ofHtml(
      "<html lang=\"fr\"><head><title>One</title><title>Two</title>" +
        "<meta name=\"description\" content=\"d1\">" +
        "<meta name=\"description\" content=\"d2\">" +
        "<link rel=\"canonical\" href=\"https://c/1\">" +
        "<link rel=\"stylesheet\" href=\"/s.css\"></head>" +
        "<body><a href=\"/a\">first <b>bold</b></a>" +
        "<p>x <a href=\"/b\" rel=\"nofollow\">second</a></p>" +
        "<a name=\"no-href\">not a link</a></body></html>")
    assert(m.title == "One" && m.lang == "fr")
    assert(m.description == "d1" && m.canonical == "https://c/1")
    assert(m.links == Vector(
      graft.text.PageMeta.Link("/a", "first bold", ""),
      graft.text.PageMeta.Link("/b", "second", "nofollow")))
    // absent fields default to ""
    val e = graft.text.PageMeta.ofHtml("<body><p>plain</p></body>")
    assert(e.title == "" && e.lang == "" && e.description == "" &&
      e.canonical == "" && e.links.isEmpty)
  }

  // ---- lenient tree recovery (the crawl-ingest mode) -------------------------

  private def leaves(e: HtmlDom.Elem): Vector[String] = e.children.flatMap {
    case HtmlDom.Text(d) => Vector(d)
    case c: HtmlDom.Elem => leaves(c)
  }

  test("lenient: unclosed <p> chain — implied end tags before blocks and EOF") {
    // strict rejects it, lenient yields three sibling paragraphs
    intercept[IllegalArgumentException](HtmlDom.parse("<div><p>one<p>two<p>three</div>"))
    val root = HtmlDom.parse("<div><p>one<p>two<p>three</div>", lenient = true)
    val div = root.children.head.asInstanceOf[HtmlDom.Elem]
    assert(div.children.map { case e: HtmlDom.Elem => (e.tag, leaves(e).mkString) } ==
      Vector(("p", "one"), ("p", "two"), ("p", "three")))
    // EOF auto-close: no close tags at all
    val r2 = HtmlDom.parse("<article><p>alpha<p>beta", lenient = true)
    val art = r2.children.head.asInstanceOf[HtmlDom.Elem]
    assert(art.tag == "article" && art.children.length == 2)
  }

  test("lenient: sibling li/tr closes, void p-closer, mismatched and stray close tags") {
    val ul = HtmlDom.parse("<ul><li>a<li>b<li>c</ul>", lenient = true)
      .children.head.asInstanceOf[HtmlDom.Elem]
    assert(ul.children.map { case e: HtmlDom.Elem => leaves(e).mkString } ==
      Vector("a", "b", "c"))
    // <hr> (void) closes an open p
    val d = HtmlDom.parse("<div><p>x<hr></div>", lenient = true)
      .children.head.asInstanceOf[HtmlDom.Elem]
    assert(d.children.collect { case e: HtmlDom.Elem => e.tag } == Vector("p", "hr"))
    // mismatched </b> auto-closes the deeper <i>; the stray </i> is ignored
    val p = HtmlDom.parse("<p><b>one<i>two</b>three</i></p>", lenient = true)
      .children.head.asInstanceOf[HtmlDom.Elem]
    val b = p.children.head.asInstanceOf[HtmlDom.Elem]
    assert(b.tag == "b" && leaves(b).mkString == "onetwo")
    assert(p.children.collect { case HtmlDom.Text(t) => t } == Vector("three"))
    // close tag for a never-opened tag is ignored entirely
    assert(leaves(HtmlDom.parse("<div>a</span>b</div>", lenient = true)) == Vector("a", "b"))
  }

  test("lenient: lexical errors still throw; extraction works over recovered trees") {
    intercept[IllegalArgumentException](
      HtmlDom.parse("<div><!-- unterminated", lenient = true))
    intercept[IllegalArgumentException](
      HtmlDom.parse("<div><![CDATA[x]]></div>", lenient = true))
    // a real-web-shaped page: unclosed paragraphs inside the article
    val page = "<body><nav><a href=\"/\">home</a></nav>" +
      "<article><h1>Title</h1><p>first para<p>second para</article>" +
      "<footer><p>legal</footer></body>"
    val ex = MainContent.extractHtmlLenient(page)
    assert(ex.containerTag == "article")
    assert(ex.spans.map(s => (s.kind, s.text)) ==
      Vector(("heading", "Title"), ("text", "first para"), ("text", "second para")))
    // strict mode still refuses the same page
    intercept[IllegalArgumentException](MainContent.extractHtml(page))
  }

  test("lenient: bare '<' before a non-letter is literal text, not a dead page") {
    // HTML5 data state: unescaped comparisons are everywhere on the real
    // web — pre-fix the whole page quarantined as one error row
    val root = HtmlDom.parse("<div><p>if x < 10 and y <3 then</p></div>", lenient = true)
    val p = root.children.head.asInstanceOf[Elem].children.head.asInstanceOf[Elem]
    val text = p.children.collect { case graft.text.HtmlDom.Text(d) => d }.mkString
    assert(text == "if x < 10 and y <3 then")
    // '</' before a non-letter is a bogus comment: skipped to the next '>'
    val r2 = HtmlDom.parse("<div>a</3 junk>b</div>", lenient = true)
    val d2 = r2.children.head.asInstanceOf[Elem]
    assert(d2.children.collect { case graft.text.HtmlDom.Text(t) => t }.mkString == "ab")
    // a '<' before whitespace mid-div is text too
    val r3 = HtmlDom.parse("<div>a < b</div>", lenient = true)
    val d3 = r3.children.head.asInstanceOf[Elem]
    assert(d3.children.collect { case graft.text.HtmlDom.Text(t) => t }.mkString == "a < b")
    // strict mode still rejects all three shapes
    intercept[IllegalArgumentException](HtmlDom.parse("<p>x < 10</p>"))
    intercept[IllegalArgumentException](HtmlDom.parse("<div>a</3>b</div>"))
  }

  test("images nested inside block leaves, headings, and inline markup emit image spans") {
    // pre-fix the inlineText flatten silently dropped the media_ref
    val html =
      """<body><nav><a href="/">chrome</a></nav><article><h2>Title <img src="m://h" alt="hero"></h2>
        |<p>See <img src="m://f" alt="figure 1"> here</p>
        |<p>and <em>emphatic <img src="m://e" alt="inline"></em> tail</p></article></body>""".stripMargin
    val ex = MainContent.extractHtml(html)
    assert(ex.spans.map(s => (s.kind, s.text, s.media_ref)) == Vector(
      ("heading", "Title", ""),
      ("image", "hero", "m://h"),
      ("text", "See", ""),
      ("image", "figure 1", "m://f"),
      ("text", "here", ""),
      ("text", "and emphatic", ""),
      ("image", "inline", "m://e"),
      ("text", "tail", "")))
    assert(ex.spans.map(_.offset) == (0 until 8).toVector)
  }

  test("page meta: rel token lists and ASCII-case-insensitive meta names") {
    val meta = graft.text.PageMeta.ofHtml(
      """<html><head><meta name="Description" content="d-text">
        |<link rel="canonical alternate" href="https://h/c"></head>
        |<body><p>x</p></body></html>""".stripMargin)
    assert(meta.description == "d-text")
    assert(meta.canonical == "https://h/c")
  }

  test("rel nofollow is an ASCII-case-insensitive whitespace-separated token set") {
    import graft.text.PageMeta.Link
    // pre-fix a case-sensitive space-only split leaked these into the
    // frontier — the crawler fetched pages the site opted out of
    assert(Link("/a", "x", "NOFOLLOW").noFollow)
    assert(Link("/a", "x", "external\tnofollow").noFollow)
    assert(Link("/a", "x", "NoFollow noopener").noFollow)
    assert(!Link("/a", "x", "").noFollow)
    assert(!Link("/a", "x", "noopener").noFollow)
    assert(!Link("/a", "x", "nofollowed").noFollow) // token, not substring
  }
}
