package graft.sources

/**
 * PDF / layout-parse stage (north-rule item). ZERO PDF libraries exist in
 * this sandbox (`/opt/spark/jars` has no pdfbox/tika — SURVEY.md §7.6), so
 * the codec is a clearly-marked stub behind a pluggable trait; the pipeline
 * contract — binary in, ordered layout blocks out, per-partition batching —
 * is real. A deployment swaps `StubLayoutParser` for a pdfbox-backed
 * implementation without touching the Spark plumbing.
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

/** STUB: passthrough for text-like blobs, empty for true binaries. The block
  * shape and determinism contract match what a real parser must produce. */
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
    } else Vector.empty // ??? real codec required — no PDF libs in sandbox
  }
}
