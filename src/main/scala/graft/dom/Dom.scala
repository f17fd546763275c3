package graft.dom

import scala.collection.mutable

/**
 * Minimal mutable DOM for per-row extraction work.
 *
 * One tree is built per page row inside `mapPartitions` (never a Spark
 * column), mirroring the reference's `ExtractionContext` whose parsed DOM
 * also never crosses documents (`/root/reference/src/core/context.ts:23-55`).
 * Semantics follow what the reference's cheerio/parse5 usage relies on:
 * `.text()` is the raw concatenation of descendant text nodes (no added
 * whitespace), attributes are lowercased, first duplicate attribute wins.
 */
sealed trait Node {
  var parent: Element = _
  /** Detach from parent. */
  def remove(): Unit = {
    if (parent != null) { parent.children -= this; parent = null }
  }
  /** Replace self with `n` in the parent's child list. */
  def replaceWith(n: Node): Unit = {
    val p = parent
    if (p != null) {
      val sibs = p.children
      var idx = -1
      var i = 0
      while (idx < 0 && i < sibs.length) { if (sibs(i) eq this) idx = i; i += 1 }
      if (idx >= 0) {
        n.remove()
        p.children(idx) = n
        n.parent = p
        parent = null
      }
    }
  }
  def deepClone(): Node
}

final class TextNode(var data: String) extends Node {
  def deepClone(): Node = new TextNode(data)
}

final class CommentNode(var data: String) extends Node {
  def deepClone(): Node = new CommentNode(data)
}

/** Insertion-ordered attribute list with LinkedHashMap semantics (update
  * keeps original position; remove shifts). Elements typically carry 0–2
  * attributes, so a compact pair array beats a hash table — the per-element
  * LinkedHashMap was a top allocation source in the extraction profile. */
final class AttrList {
  // single interleaved [k0, v0, k1, v1, …] array: one object (not two) per
  // attributed element, sized for the 1-attribute common case
  private var kv: Array[String] = AttrList.emptyArr
  private var n = 0
  private def indexOf(k: String): Int = {
    var i = 0
    while (i < n) { if (kv(2 * i) == k) return i; i += 1 }
    -1
  }
  def get(k: String): Option[String] = { val i = indexOf(k); if (i < 0) None else Some(kv(2 * i + 1)) }
  def contains(k: String): Boolean = indexOf(k) >= 0
  def update(k: String, v: String): Unit = {
    val i = indexOf(k)
    if (i >= 0) kv(2 * i + 1) = v
    else {
      if (2 * n == kv.length)
        kv = java.util.Arrays.copyOf(kv, if (n == 0) 2 else 4 * n)
      kv(2 * n) = k; kv(2 * n + 1) = v; n += 1
    }
  }
  def remove(k: String): Unit = {
    val i = indexOf(k)
    if (i >= 0) {
      System.arraycopy(kv, 2 * (i + 1), kv, 2 * i, 2 * (n - i - 1))
      n -= 1; kv(2 * n) = null; kv(2 * n + 1) = null
    }
  }
  def foreach(f: ((String, String)) => Unit): Unit = {
    var i = 0
    while (i < n) { f((kv(2 * i), kv(2 * i + 1))); i += 1 }
  }
  def values: Iterator[String] = (0 until n).iterator.map(i => kv(2 * i + 1))
  def size: Int = n
  def isEmpty: Boolean = n == 0
}
object AttrList { private val emptyArr = new Array[String](0) }

final class Element(val tag: String) extends Node {
  /** Insertion-ordered; names lowercased; first occurrence wins. */
  val attrs: AttrList = new AttrList
  // initial capacity 2, not ArrayBuffer's eager 16 — most elements hold ≤2
  // children and the per-element waste dominated DOM-build allocation
  val children: mutable.ArrayBuffer[Node] = new mutable.ArrayBuffer[Node](2)

  def attr(name: String): Option[String] = attrs.get(name)

  def setAttr(name: String, value: String): Unit =
    if (!attrs.contains(name)) attrs(name) = value

  def appendChild(n: Node): Unit = { n.remove(); n.parent = this; children += n }

  def insertBefore(n: Node, ref: Node): Unit = {
    var idx = -1
    var i = 0
    while (idx < 0 && i < children.length) { if (children(i) eq ref) idx = i; i += 1 }
    n.remove()
    n.parent = this
    if (idx < 0) children += n else children.insert(idx, n)
  }

  /** Index of this node in its parent's child list — manual scan (indexWhere
    * allocates an iterator + closure per call; these run per node in the
    * Readability sibling walks). */
  private def siblingIndex: Int = {
    val sibs = parent.children
    var i = 0
    while (i < sibs.length) {
      if (sibs(i) eq this) return i
      i += 1
    }
    -1
  }

  /** Next sibling node (any type), or null. */
  def nextSibling: Node = {
    if (parent == null) return null
    val sibs = parent.children
    val idx = siblingIndex
    if (idx >= 0 && idx + 1 < sibs.length) sibs(idx + 1) else null
  }

  /** Next sibling element, or null. */
  def nextElementSibling: Element = {
    if (parent == null) return null
    val sibs = parent.children
    var idx = siblingIndex + 1
    while (idx < sibs.length) {
      sibs(idx) match { case e: Element => return e; case _ => }
      idx += 1
    }
    null
  }

  def childElements: Iterator[Element] = new Iterator[Element] {
    private var i = 0
    private def advance(): Unit =
      while (i < children.length && !children(i).isInstanceOf[Element]) i += 1
    advance()
    def hasNext: Boolean = i < children.length
    def next(): Element = {
      val e = children(i).asInstanceOf[Element]
      i += 1
      advance()
      e
    }
  }

  /** All descendant elements in document order (self excluded) — cheerio
    * `find('*')`. Element-only manual array stack: this iterator runs for
    * every selector scan / allTags call, so no per-node Iterator allocs. */
  def descendants: Iterator[Element] = new Iterator[Element] {
    private var stack = new Array[Element](16)
    private var top = 0
    pushChildrenOf(Element.this)
    private def pushChildrenOf(e: Element): Unit = {
      val ch = e.children
      var i = ch.length - 1
      while (i >= 0) {
        ch(i) match {
          case el: Element =>
            if (top == stack.length) stack = java.util.Arrays.copyOf(stack, top * 2)
            stack(top) = el
            top += 1
          case _ =>
        }
        i -= 1
      }
    }
    def hasNext: Boolean = top > 0
    def next(): Element = {
      top -= 1
      val e = stack(top)
      stack(top) = null
      pushChildrenOf(e)
      e
    }
  }

  /** Ancestors from nearest parent to root — cheerio `parents()` order. */
  def ancestors: List[Element] = {
    var cur = parent
    val b = List.newBuilder[Element]
    while (cur != null) { b += cur; cur = cur.parent }
    b.result()
  }

  /** Concatenated descendant text — cheerio `.text()` (no added whitespace).
    * Two walks: an allocation-free length pass, then one exact-size builder —
    * cheaper than letting the builder double-and-copy (the copies cost ~2×
    * the final size in byte[] churn; this was a top allocation site). */
  def text(): String = {
    val len = textLength
    if (len == 0) return ""
    val sb = new java.lang.StringBuilder(len)
    appendText(sb)
    sb.toString
  }

  /** Total descendant text length, no allocation. */
  def textLength: Int = {
    var total = 0
    var i = 0
    while (i < children.length) {
      children(i) match {
        case t: TextNode => total += t.data.length
        case e: Element  => total += e.textLength
        case _           =>
      }
      i += 1
    }
    total
  }

  private def appendText(sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < children.length) {
      children(i) match {
        case t: TextNode => sb.append(t.data)
        case e: Element  => e.appendText(sb)
        case _           =>
      }
      i += 1
    }
  }

  /** Space-separated class tokens — maximal runs of non-whitespace, exactly
    * `split("\\s+").filter(_.nonEmpty)` with Java `\s` = [ \t\n\x0B\f\r]
    * (a regex Matcher per element was a measured allocation site). */
  def classList: Array[String] = attrs.get("class") match {
    case None => Element.emptyClassList
    case Some(c) =>
      def isWs(ch: Char) = ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000b' || ch == '\f' || ch == '\r'
      var count = 0
      var i = 0
      val n = c.length
      while (i < n) {
        if (!isWs(c.charAt(i)) && (i == 0 || isWs(c.charAt(i - 1)))) count += 1
        i += 1
      }
      if (count == 0) return Element.emptyClassList
      val out = new Array[String](count)
      var k = 0
      i = 0
      while (i < n) {
        if (isWs(c.charAt(i))) i += 1
        else {
          val s = i
          while (i < n && !isWs(c.charAt(i))) i += 1
          out(k) = c.substring(s, i)
          k += 1
        }
      }
      out
  }

  def deepClone(): Node = {
    val e = new Element(tag)
    attrs.foreach { case (k, v) => e.attrs(k) = v }
    children.foreach { c => e.appendChild(c.deepClone()) }
    e
  }

  def cloneElement(): Element = deepClone().asInstanceOf[Element]

  /** Serialized children — cheerio `.html()`. */
  def innerHtml: String = {
    val sb = new java.lang.StringBuilder
    children.foreach(HtmlSerializer.write(_, sb))
    sb.toString
  }

  /** Serialized element — cheerio `$.html(el)`. */
  def outerHtml: String = {
    val sb = new java.lang.StringBuilder
    HtmlSerializer.write(this, sb)
    sb.toString
  }
}

object HtmlSerializer {
  /** Raw-text elements whose children serialize verbatim (HTML5 §13.3). */
  val rawText: Set[String] =
    Set("script", "style", "xmp", "iframe", "noembed", "noframes", "plaintext", "noscript")

  def write(n: Node, sb: java.lang.StringBuilder): Unit = n match {
    case t: TextNode =>
      val p = t.parent
      if (p != null && rawText.contains(p.tag)) sb.append(t.data)
      else escapeText(t.data, sb)
    case c: CommentNode =>
      sb.append("<!--").append(c.data).append("-->")
    case e: Element =>
      sb.append('<').append(e.tag)
      e.attrs.foreach { case (k, v) =>
        sb.append(' ').append(k)
        sb.append("=\"")
        escapeAttr(v, sb)
        sb.append('"')
      }
      sb.append('>')
      if (!HtmlParser.voidElements.contains(e.tag)) {
        e.children.foreach(write(_, sb))
        sb.append("</").append(e.tag).append('>')
      }
  }

  def escapeText(s: String, sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&'      => sb.append("&amp;")
        case '<'      => sb.append("&lt;")
        case '>'      => sb.append("&gt;")
        case '\u00a0' => sb.append("&nbsp;")
        case c        => sb.append(c)
      }
      i += 1
    }
  }

  def escapeAttr(s: String, sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&'      => sb.append("&amp;")
        case '"'      => sb.append("&quot;")
        case '\u00a0' => sb.append("&nbsp;")
        case c        => sb.append(c)
      }
      i += 1
    }
  }
}

/** A parsed document: implied `<html><head/><body/></html>` skeleton. */
final class DomDoc(val html: Element, val head: Element, val body: Element) {
  /** All elements in document order (from the html root, inclusive of head+body). */
  def allElements: Iterator[Element] = Iterator.single(html) ++ html.descendants

  def select(selector: String): Vector[Element] = Selector(selector).findIn(html)

  def selectFirst(selector: String): Option[Element] = Selector(selector).firstIn(html)

  /** Full-document serialization — cheerio `$.root().html()`. */
  def outerHtml: String = html.outerHtml

  def deepClone(): DomDoc = {
    val h = html.cloneElement()
    // re-locate head/body in the clone by position
    val head2 = h.childElements.find(_.tag == "head").getOrElse(h)
    val body2 = h.childElements.find(_.tag == "body").getOrElse(h)
    new DomDoc(h, head2, body2)
  }
}

object Element {
  private[dom] val emptyClassList = new Array[String](0)
}
