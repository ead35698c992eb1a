package graft.text

import javax.xml.XMLConstants
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Element, Node}
import org.xml.sax.InputSource

/** Sitemap-protocol parsing (sitemaps.org 0.9) — the crawl's third seed
  * source besides outlinks and redirects: a `<urlset>` of page entries with
  * optional `<lastmod>`, or a `<sitemapindex>` naming child sitemaps (the
  * consumer follows ONE level of indirection — the protocol itself forbids
  * nested index files). Parsed with JAXP like [[XmlFlatten]], local-name
  * matched so the standard `xmlns="http://www.sitemaps.org/..."` namespace
  * (or none) both work; malformed XML or an unexpected root throws with
  * the supplied context.
  */
object Sitemaps {

  /** One `<url>` entry: the page and its optional last-modification stamp
    * (empty when the sitemap does not carry one).
    */
  final case class Entry(loc: String, lastmod: String)

  sealed trait Doc
  final case class UrlSet(entries: Vector[Entry]) extends Doc
  final case class Index(sitemaps: Vector[String]) extends Doc

  // same rationale as XmlFlatten: DocumentBuilderFactory.newInstance does a
  // classloader service lookup per call — one builder per executor thread
  private val threadBuilder =
    new ThreadLocal[javax.xml.parsers.DocumentBuilder] {
      override def initialValue(): javax.xml.parsers.DocumentBuilder = {
        val factory = DocumentBuilderFactory.newInstance()
        factory.setNamespaceAware(true)
        factory.setFeature(XMLConstants.FEATURE_SECURE_PROCESSING, true)
        factory.setFeature("http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
        // crawled XML is hostile input: a DOCTYPE with an internal-subset
        // SYSTEM entity still resolves under the two features above (they
        // only stop external-DTD fetches and bound expansion) — XXE reads
        // local files / SSRFs from the executor into extracted URLs.
        // Rejecting the DOCTYPE outright closes the class; real sitemaps
        // never carry one.
        factory.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
        factory.newDocumentBuilder()
      }
    }

  private def localName(n: Node): String = {
    val ln = n.getLocalName
    if (ln != null) ln
    else {
      val name = n.getNodeName
      val i = name.indexOf(':')
      if (i >= 0) name.substring(i + 1) else name
    }
  }

  private def childElems(e: Element, name: String): Vector[Element] = {
    val out = Vector.newBuilder[Element]
    var c = e.getFirstChild
    while (c != null) {
      if (c.getNodeType == Node.ELEMENT_NODE && localName(c) == name)
        out += c.asInstanceOf[Element]
      c = c.getNextSibling
    }
    out.result()
  }

  private def childText(e: Element, name: String): Option[String] =
    childElems(e, name).headOption.map(_.getTextContent.trim)

  def parse(xml: String, ctx: String): Doc = {
    val root =
      try {
        val b = threadBuilder.get()
        b.reset()
        b.parse(new InputSource(new java.io.StringReader(xml))).getDocumentElement
      } catch {
        case e: org.xml.sax.SAXException =>
          throw new IllegalArgumentException(s"$ctx: malformed sitemap XML: ${e.getMessage}")
      }
    localName(root) match {
      case "urlset" =>
        UrlSet(childElems(root, "url").flatMap { u =>
          childText(u, "loc").filter(_.nonEmpty)
            .map(loc => Entry(loc, childText(u, "lastmod").getOrElse("")))
        })
      case "sitemapindex" =>
        Index(childElems(root, "sitemap")
          .flatMap(s => childText(s, "loc").filter(_.nonEmpty)))
      case other =>
        throw new IllegalArgumentException(
          s"$ctx: unexpected sitemap root element <$other>")
    }
  }
}
