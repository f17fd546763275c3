package graft.content

import java.util.regex.Pattern
import graft.util.Js

/**
 * B2/B3 — default block classifier and AND-combinator, re-expressing
 * `/root/reference/src/content/classifier.ts:21-134`. Pure function over one
 * block — applied per row to the block array, never a Spark shuffle.
 */
object Classifier {

  type BlockClassifier = (ContentBlock, ClassifierContext) => ClassifierResult

  // classifier.ts:39-48 — generic boilerplate phrases (case-insensitive).
  // Detection is `exists(_.find())` over already-lowercased text, so the six
  // `\b(alt|...)\b` patterns reduce to word-boundary-checked literal search
  // (regex `\b` = transition of \w = [a-zA-Z0-9_]; `advertis(e|ement|ing)`
  // and `comments?` expanded to their literal alternatives). The regex
  // alternation was 18% of executor samples — Pattern retried every branch
  // at every position of the 1000-char window per block.
  private[content] final class BoundaryAlt(phrases: String*) {
    private val arr = phrases.toArray
    private def isWord(c: Char) =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'
    def findIn(s: String): Boolean = {
      var p = 0
      while (p < arr.length) {
        val ph = arr(p)
        var idx = s.indexOf(ph)
        while (idx >= 0) {
          val startOk =
            if (idx == 0) isWord(ph.charAt(0))
            else isWord(s.charAt(idx - 1)) != isWord(ph.charAt(0))
          val e = idx + ph.length
          val endOk = isWord(s.charAt(e - 1)) != (e < s.length && isWord(s.charAt(e)))
          if (startOk && endOk) return true
          idx = s.indexOf(ph, idx + 1)
        }
        p += 1
      }
      false
    }
  }

  private[content] val boilerplateAlt = new BoundaryAlt(
    "subscribe", "sign up", "newsletter", "notifications", "follow us",
    "sponsored", "advertise", "advertisement", "advertising", "promotion",
    "partner content",
    "read more", "keep reading", "continue reading", "see more",
    "cookie policy", "privacy policy", "terms of service", "all rights reserved",
    "share on", "share this", "tweet this", "pin it",
    "comment", "comments", "leave a reply", "join the discussion")

  private[content] val mediaCreditAlt = new BoundaryAlt(
    "photo by", "image:", "credit:", "source:")

  // original regexes retained as oracles for ClassifierFastPathSpec
  private[content] val boilerplateRe: Pattern = Pattern.compile(
    Array(
      "\\b(subscribe|sign up|newsletter|notifications|follow us)\\b",
      "\\b(sponsored|advertis(e|ement|ing)|promotion|partner content)\\b",
      "\\b(read more|keep reading|continue reading|see more)\\b",
      "\\b(cookie policy|privacy policy|terms of service|all rights reserved)\\b",
      "\\b(share on|share this|tweet this|pin it)\\b",
      "\\b(comments?|leave a reply|join the discussion)\\b"
    ).mkString("|"), Pattern.CASE_INSENSITIVE)

  private[content] val mediaCreditPattern =
    Pattern.compile("\\b(photo by|image:|credit:|source:)\\b", Pattern.CASE_INSENSITIVE)

  // JS /[.!?]\s*$/ — \s is the JS class; equivalent backwards scan: last
  // non-JS-whitespace char is '.', '!' or '?'
  private def endsWithPunct(text: String): Boolean = {
    var i = text.length - 1
    while (i >= 0 && Js.isJsWs(text.charAt(i))) i -= 1
    i >= 0 && { val c = text.charAt(i); c == '.' || c == '!' || c == '?' }
  }

  private val exemptTypes = Set("heading", "list", "quote", "code")

  /** classifier.ts:21-85 — exact reject labels and scores. */
  val default: BlockClassifier = (block: ContentBlock, _: ClassifierContext) => {
    val text = Js.trim(if (block.text == null) "" else block.text)
    val lowerText = text.toLowerCase(java.util.Locale.ROOT).take(1000) // limit regex input (classifier.ts:25)

    if (text.isEmpty) ClassifierResult(accept = false, label = Some("empty"))
    else if (block.blockType == "nav") ClassifierResult(accept = false, label = Some("nav"))
    else if (block.blockType == "footer") ClassifierResult(accept = false, label = Some("footer"))
    else if (block.blockType == "legal") ClassifierResult(accept = false, label = Some("legal"))
    else if (block.blockType == "promo") ClassifierResult(accept = false, label = Some("promo"))
    else if (boilerplateAlt.findIn(lowerText))
      ClassifierResult(accept = false, label = Some("boilerplate"))
    else if (mediaCreditAlt.findIn(lowerText) && text.length < 120)
      ClassifierResult(accept = false, label = Some("media-credit"))
    else {
      val isShort = text.length < 20
      if (isShort && !exemptTypes.contains(block.blockType) && !endsWithPunct(text))
        ClassifierResult(accept = false, label = Some("too-short"))
      else {
        var score = 0.5
        if (block.blockType == "heading")
          score = block.level match {
            case Some(1) => 0.9
            case Some(2) => 0.8
            case _       => 0.7
          }
        if (block.blockType == "paragraph")
          score = math.min(0.9, 0.5 + text.length / 1000.0)
        if (block.blockType == "quote" || block.blockType == "code")
          score = 0.7
        ClassifierResult(accept = true, score = Some(score), label = Some("content"))
      }
    }
  }

  /** classifier.ts:105-134 — AND semantics, first reject wins, scores averaged,
    * labels joined with '+'. */
  def combine(classifiers: BlockClassifier*): BlockClassifier =
    (block, context) => {
      val results = scala.collection.mutable.ArrayBuffer.empty[ClassifierResult]
      var rejected: ClassifierResult = null
      val it = classifiers.iterator
      while (it.hasNext && rejected == null) {
        val r = it.next()(block, context)
        if (!r.accept) rejected = r else results += r
      }
      if (rejected != null) rejected
      else {
        val scores = results.flatMap(_.score)
        val avg = if (scores.nonEmpty) Some(scores.sum / scores.length) else None
        val label = results.flatMap(_.label).filter(_.nonEmpty).mkString("+")
        ClassifierResult(accept = true, score = avg, label = Some(if (label.isEmpty) "content" else label))
      }
    }
}
