package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: one-pass whitespace-token count.
 *
 * `size(split(trim(s), '\\s+'))` allocates a regex matcher and an array per
 * row; at 10^12 documents that's pure GC pressure for a number we can compute
 * in one pass. `token_count(s)` stays inside whole-stage codegen (doGenCode
 * emits a direct static call — one String materialization, no regex, no
 * arrays) and returns the count of non-JS-whitespace runs — equal to
 * `size(split(trim(s),'\\s+'))` for non-empty trimmed input (0 for blank).
 *
 * Registered via [[GraftExtensions]] (`SparkSessionExtensions`), the
 * preference-order "(b) custom Catalyst Expression" path from the builder
 * prompt — used where built-ins genuinely can't express the cost profile.
 */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"token_count requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    TokenCount.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.TokenCount.countTokens($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)

  override def prettyName: String = "token_count"
}

object TokenCount {
  /** Count runs of non-JS-whitespace chars \u2014 delegates to the SAME
    * whitespace class the extraction path uses (`Js.countTokens` /
    * `Js.isJsWs`): a second ad-hoc class here made SQL `token_count`
    * disagree with `word_count` on u202F/u2007/uFEFF and u001C-u001F \u2014
    * two answers for one text across surfaces. */
  def countTokens(s: UTF8String): Int = {
    if (s == null) return 0
    graft.util.Js.countTokens(s.toString)
  }
}

/**
 * Native Catalyst expression: cosine similarity over two `array<float>`
 * columns, the hot scalar of every ANN / embedding-dedup scoring stage.
 *
 * The typed-Dataset route (`as[(… Array[Float] …)].map`) deserializes both
 * vectors into JVM arrays per row — at 10^9 candidate pairs that is the
 * dominant cost. `cosine_sim(a, b)` stays inside whole-stage codegen:
 * doGenCode emits a call on the two `ArrayData` values directly
 * (`getFloat(i)` reads from the unsafe row buffer — no array allocation, no
 * encoder). Semantics match [[graft.ops.VectorOps.cosine]] exactly: 0.0 on
 * a zero-norm side; mismatched dimensions raise the same error.
 */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  private def isFloatArray(t: DataType): Boolean = t match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosine(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = graft.plans.CosineSim.cosine($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim = copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object CosineSim {
  /** Straight loop over the two ArrayData buffers — no boxing, no arrays.
    * Exactly [[graft.ops.VectorOps.cosine]]'s order of checks: norms first
    * (a zero-norm side → 0.0 WITHOUT a length check — an empty/corrupt
    * vector scores 0.0 and filters out instead of killing the query), and
    * the dimension requirement only when both sides are non-zero. */
  def cosine(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val la = a.numElements()
    val lb = b.numElements()
    var na = 0.0
    var i = 0
    while (i < la) { val x = a.getFloat(i).toDouble; na += x * x; i += 1 }
    var nb = 0.0
    i = 0
    while (i < lb) { val y = b.getFloat(i).toDouble; nb += y * y; i += 1 }
    if (na == 0.0 || nb == 0.0) return 0.0
    require(la == lb, s"dimension mismatch: $la vs $lb")
    var dot = 0.0
    i = 0
    while (i < la) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** 5-decimal-rounded cosine with JDK `Math.round` semantics — NOT
    * `floor(x·1e5 + 0.5)`, which double-rounds across integer boundaries
    * (Math.round(0.49999999999999994) == 0 since Java 7, floor+0.5 gives
    * 1). Every scoring surface uses THIS, so the native column path and
    * the scalar `math.round(VectorOps.cosine(...)·1e5)/1e5` path are
    * byte-identical by construction. */
  def cosineRounded5(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double =
    Math.round(cosine(a, b) * 100000) / 100000.0
}

/** `cosine_sim5(a, b)` — the rounded scoring variant (see
  * [[CosineSim.cosineRounded5]]). */
case class CosineSim5(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    CosineSim(left, right).checkInputDataTypes()

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosineRounded5(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = graft.plans.CosineSim.cosineRounded5($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim5 = copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim5"
}

/**
 * Native Catalyst expression: byte-level BPE token count
 * (`bpe_token_count(str, merges_spec)`) — real subword budgeting for the
 * packing/census layer where `token_count`'s whitespace runs under-count
 * by the subword expansion factor. The algorithm is [[graft.ops.Bpe]]'s
 * published GPT-2 loop; the merge table arrives as a FOLDABLE string
 * literal (`Bpe.mergesSpec` form) so one parsed rank table per JVM serves
 * every row — codegen references the parsed object directly
 * (`addReferenceObj`), keeping the hot path inside whole-stage codegen
 * with zero per-row parsing.
 */
case class BpeTokenCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_token_count requires (string, string), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    else if (!right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "bpe_token_count's merges argument must be a constant")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  @transient private lazy val ranks: graft.ops.Bpe.Ranks = {
    val spec = right.eval(null)
    graft.ops.Bpe.ranksFor(if (spec == null) "" else spec.toString)
  }

  override def nullSafeEval(text: Any, merges: Any): Any =
    graft.ops.Bpe.countTokens(text.asInstanceOf[UTF8String].toString, ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
      classOf[graft.ops.Bpe.Ranks].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.ops.Bpe.countTokens($t.toString(), $ranksRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeTokenCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bpe_token_count"
}

/** `SparkSessionExtensions` hook — registers the native functions so SQL
  * users get them (`spark.sql.extensions=graft.plans.GraftExtensions`), and
  * `GraftExtensions.register(spark)` does the same on a live session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.tokenCountDescriptor)
    ext.injectFunction(GraftExtensions.bpeTokenCountDescriptor)
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
    ext.injectFunction(GraftExtensions.cosineSim5Descriptor)
    ext.injectFunction(GraftExtensions.bloomAggDescriptor)
    ext.injectFunction(GraftExtensions.bloomMightContainDescriptor)
  }
}

object GraftExtensions {
  private[plans] val tokenCountDescriptor = (
    FunctionIdentifier("token_count"),
    new ExpressionInfo("graft.plans.TokenCount", null, "token_count",
      "token_count(str) - count of whitespace-separated tokens", ""),
    (children: Seq[Expression]) => TokenCount(children.head))

  private[plans] val bpeTokenCountDescriptor = (
    FunctionIdentifier("bpe_token_count"),
    new ExpressionInfo("graft.plans.BpeTokenCount", null, "bpe_token_count",
      "bpe_token_count(str, merges) - byte-level BPE subword token count " +
        "(merges: newline-delimited 'left right\\nleft right\\n…' constant, " +
        "as produced by Bpe.mergesSpec — ';' is a legal symbol char, not a " +
        "delimiter)", ""),
    (children: Seq[Expression]) => BpeTokenCount(children(0), children(1)))

  private[plans] val cosineSimDescriptor = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo("graft.plans.CosineSim", null, "cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two float vectors", ""),
    (children: Seq[Expression]) => CosineSim(children(0), children(1)))

  private[plans] val cosineSim5Descriptor = (
    FunctionIdentifier("cosine_sim5"),
    new ExpressionInfo("graft.plans.CosineSim5", null, "cosine_sim5",
      "cosine_sim5(a, b) - cosine similarity rounded to 5 decimals (Math.round semantics)", ""),
    (children: Seq[Expression]) => CosineSim5(children(0), children(1)))

  /** Spark ships a distributed Bloom-filter build/probe pair
    * (`BloomFilterAggregate` / `BloomFilterMightContain`, the machinery
    * behind AQE's runtime row-group filters) but registers them only in the
    * INTERNAL function registry — SQL/`expr` can't reach them. These two
    * descriptors surface Spark's own expressions unchanged (no reimplemented
    * sketch): `bloom_filter_agg(xxhash64(key)[, est_items[, num_bits]])`
    * builds the filter as a map-side-combinable aggregate, and
    * `bloom_might_contain(bloom, xxhash64(key))` probes it. Used by
    * [[graft.pipeline.Frontier.unseenByBloom]] to keep definitely-unseen
    * URLs out of the seen-set anti-join shuffle. */
  private[plans] val bloomAggDescriptor = (
    FunctionIdentifier("bloom_filter_agg"),
    new ExpressionInfo(
      "org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate",
      null, "bloom_filter_agg",
      "bloom_filter_agg(xxhash64(col)[, est_items[, num_bits]]) - distributed Bloom filter build", ""),
    (children: Seq[Expression]) => children match {
      case Seq(c)       => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
      case Seq(c, n)    => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n)
      case Seq(c, n, b) => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n, b)
      case other => throw new IllegalArgumentException(
        s"bloom_filter_agg expects 1-3 arguments, got ${other.size}")
    })

  private[plans] val bloomMightContainDescriptor = (
    FunctionIdentifier("bloom_might_contain"),
    new ExpressionInfo(
      "org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain",
      null, "bloom_might_contain",
      "bloom_might_contain(bloom_binary, xxhash64(col)) - Bloom filter probe (no false negatives)", ""),
    (children: Seq[Expression]) =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        children(0), children(1)))

  /** Register ONLY the native Catalyst expressions — the right call from
    * library code that needs an expression (e.g. the ANN scoring tail):
    * no session-wide UDF names are touched, so a user's own extract_page /
    * normalize_url registrations are never clobbered as a side effect. */
  def registerNative(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(tokenCountDescriptor, bpeTokenCountDescriptor,
        cosineSimDescriptor, cosineSim5Descriptor,
        bloomAggDescriptor, bloomMightContainDescriptor).foreach {
      case (ident, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

  /** Register on an existing session (local/test convenience). Also registers
    * the SQL extraction surface: `extract_page(html, url)` — ONE
    * struct-returning UDF so SQL users pay one DOM parse per row instead of
    * per-field UDFs re-parsing per column (SURVEY.md §2.11) — plus the
    * text-analysis scalars, so the whole training-data toolkit is reachable
    * from plain `spark.sql`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    registerNative(spark)
    spark.udf.register("extract_page",
      (html: String, url: String) => graft.pipeline.ScrapePipeline.scrapeHtml(
        if (html == null) "" else html, if (url == null) "" else url))
    // binary-input variant over the input_hint's `html:binary` column:
    // magic-byte routing (HTML charset sniff / PDF incl. decryption) —
    // the same scrapeAny the fused batch job and streaming share
    spark.udf.register("extract_doc",
      (blob: Array[Byte], url: String) => graft.pipeline.ExtractJob.scrapeAny(
        if (url == null) "" else url, blob))
    spark.udf.register("detect_lang",
      (text: String) => graft.ops.TextOps.detectLanguage(text)._1)
    spark.udf.register("quality_score",
      (text: String) => graft.ops.TextOps.quality(text).score)
    spark.udf.register("simhash64",
      (text: String) => graft.ops.TextOps.simHash(text))
    spark.udf.register("content_hash32",
      (text: String) => graft.content.Normalizer.generateHash(if (text == null) "" else text))
    spark.udf.register("pii_redact",
      (text: String) => graft.embed.Embed.redactPii(if (text == null) "" else text).text)
    spark.udf.register("normalize_url",
      (url: String) => graft.urlx.UrlOps.normalizeUrl(if (url == null) "" else url))
    // Gopher/C4 corpus-filter verdict as ONE struct so SQL users pay one
    // profile pass for both fields: quality_verdict(text).keep /.reasons
    spark.udf.register("quality_verdict",
      (text: String) => {
        val v = graft.ops.RepetitionOps.gopherFilter(
          graft.ops.RepetitionOps.profile(if (text == null) "" else text))
        SqlQualityVerdict(v.keep, v.reasons.mkString("+"))
      })
  }
}

/** SQL-surface row shape for `quality_verdict` (struct<keep, reasons>). */
final case class SqlQualityVerdict(keep: Boolean, reasons: String)
