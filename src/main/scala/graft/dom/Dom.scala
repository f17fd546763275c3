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
      val idx = p.children.indexWhere(_ eq this)
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
  private var ks: Array[String] = AttrList.emptyArr
  private var vs: Array[String] = AttrList.emptyArr
  private var n = 0
  private def indexOf(k: String): Int = {
    var i = 0
    while (i < n) { if (ks(i) == k) return i; i += 1 }
    -1
  }
  def get(k: String): Option[String] = { val i = indexOf(k); if (i < 0) None else Some(vs(i)) }
  def contains(k: String): Boolean = indexOf(k) >= 0
  def update(k: String, v: String): Unit = {
    val i = indexOf(k)
    if (i >= 0) vs(i) = v
    else {
      if (n == ks.length) {
        val cap = if (n == 0) 4 else n * 2
        ks = java.util.Arrays.copyOf(ks, cap)
        vs = java.util.Arrays.copyOf(vs, cap)
      }
      ks(n) = k; vs(n) = v; n += 1
    }
  }
  def remove(k: String): Unit = {
    val i = indexOf(k)
    if (i >= 0) {
      System.arraycopy(ks, i + 1, ks, i, n - i - 1)
      System.arraycopy(vs, i + 1, vs, i, n - i - 1)
      n -= 1; ks(n) = null; vs(n) = null
    }
  }
  def foreach(f: ((String, String)) => Unit): Unit = {
    var i = 0
    while (i < n) { f((ks(i), vs(i))); i += 1 }
  }
  def values: Iterator[String] = (0 until n).iterator.map(vs)
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
    val idx = children.indexWhere(_ eq ref)
    n.remove()
    n.parent = this
    if (idx < 0) children += n else children.insert(idx, n)
  }

  /** Next sibling node (any type), or null. */
  def nextSibling: Node = {
    if (parent == null) return null
    val sibs = parent.children
    val idx = sibs.indexWhere(_ eq this)
    if (idx >= 0 && idx + 1 < sibs.length) sibs(idx + 1) else null
  }

  /** Next sibling element, or null. */
  def nextElementSibling: Element = {
    if (parent == null) return null
    val sibs = parent.children
    var idx = sibs.indexWhere(_ eq this) + 1
    while (idx < sibs.length) {
      sibs(idx) match { case e: Element => return e; case _ => }
      idx += 1
    }
    null
  }

  def childElements: Iterator[Element] = children.iterator.collect { case e: Element => e }

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

  /** Concatenated descendant text — cheerio `.text()` (no added whitespace). */
  def text(): String = {
    val sb = new java.lang.StringBuilder
    appendText(sb)
    sb.toString
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

  /** Space-separated class tokens. */
  def classList: Array[String] =
    attrs.get("class").map(c => Element.javaWsRunRe.split(c).filter(_.nonEmpty)).getOrElse(Array.empty)

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
  private[dom] val javaWsRunRe = java.util.regex.Pattern.compile("\\s+")
}
