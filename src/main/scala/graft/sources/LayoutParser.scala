package graft.sources

/**
 * PDF / layout-parse stage (north-rule item). ZERO PDF libraries exist in
 * this sandbox (`/opt/spark/jars` has no pdfbox/tika — SURVEY.md §7.6);
 * round 5 replaced the declared stub with [[PdfParser]], a from-scratch
 * extractor for the simple-text-PDF subset (COS parser, FlateDecode via
 * the JDK Inflater, object streams, content-stream interpreter, ToUnicode
 * CMaps — see its scaladoc for the exact support matrix). The pluggable
 * trait remains the deployment seam: swap in a pdfbox-backed
 * implementation for full-fidelity coverage (encryption, non-Flate
 * filters, embedded-font glyph metrics) without touching the Spark
 * plumbing.
 */
trait LayoutParser extends Serializable {
  /** Parse a document blob into ordered layout blocks (page, kind, text, bbox). */
  def parse(bytes: Array[Byte], mime: String): Vector[LayoutBlock]
}

final case class LayoutBlock(
    page: Int,
    kind: String,          // text | heading | table | figure
    text: String,
    x0: Float, y0: Float, x1: Float, y1: Float)

/** Passthrough for text-like blobs, empty for non-PDF binaries; PDF bytes
  * are handled by [[PdfParser]], which falls back here on a missing magic
  * header. */
object StubLayoutParser extends LayoutParser {
  def parse(bytes: Array[Byte], mime: String): Vector[LayoutBlock] = {
    if (bytes == null || bytes.isEmpty) return Vector.empty
    if (mime != null && (mime.startsWith("text/") || mime == "application/xhtml+xml")) {
      // plain-text passthrough: one block per paragraph, synthetic geometry
      val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      text.split("\n\n+").toVector.zipWithIndex.collect {
        case (para, i) if para.trim.nonEmpty =>
          LayoutBlock(page = i / 40, kind = "text", text = para.trim,
            x0 = 0f, y0 = (i % 40) * 18f, x1 = 612f, y1 = (i % 40) * 18f + 16f)
      }
    } else Vector.empty // non-text binary with no codec: nothing to extract
  }
}
