package graft.content

/** Data model for block parsing / classification / normalization —
  * re-expresses `/root/reference/src/content/types.ts`. Plain case classes:
  * they become Spark `StructType`s via product encoders when surfaced as
  * columns (blocks ride as an ordered `ArrayType(Struct)` so document order
  * survives any Spark-level reshuffle — SURVEY.md §1 ordering invariants). */
final case class ContentBlock(
    blockType: String,            // paragraph|heading|list|quote|table|code|media|nav|footer|promo|legal
    text: String,
    level: Option[Int],           // 1-6 for headings
    html: Option[String],         // only when includeHtml
    attrs: Map[String, String],   // media: alt/src/poster
    parentTags: Seq[String],      // root-first ancestor tag chain
    depth: Int
)

final case class ClassifiedBlock(
    block: ContentBlock,
    score: Option[Double],
    label: Option[String]
)

final case class ClassifierResult(
    accept: Boolean,
    score: Option[Double] = None,
    label: Option[String] = None
)

final case class ClassifierContext(
    index: Int,
    totalBlocks: Int,
    url: Option[String],
    parentTags: Seq[String],
    depth: Int
)

final case class NormalizationMeta(
    charCount: Int,
    tokenEstimate: Int,
    language: String,
    boilerplateRemoved: Boolean,
    classifierUsed: Boolean,
    hash: String,
    extractionTimeMs: Long,       // deterministic 0 in row data (SURVEY.md §7.3: timing excluded from byte-identity)
    blocksTotal: Int,
    blocksAccepted: Int,
    truncated: Boolean
)

final case class NormalizeResult(
    text: String,
    meta: NormalizationMeta,
    blocks: Option[Seq[ClassifiedBlock]]
)

final case class NormalizeOptions(
    mode: String = "full",                      // full | summary
    maxChars: Option[Int] = None,
    minChars: Option[Int] = None,
    maxBlocks: Option[Int] = None,
    truncate: String = "sentence",              // sentence | word | char
    dropSelectors: Seq[String] = Nil,
    removeBoilerplate: Boolean = true,
    decodeEntities: Boolean = true,
    normalizeUnicode: Boolean = true,
    preserveLineBreaks: Boolean = true,
    stripLinks: Boolean = true,
    includeHtml: Boolean = false,
    languageHint: Option[String] = None,
    blockClassifier: Option[(ContentBlock, ClassifierContext) => ClassifierResult] = None,
    debug: Boolean = false
)
