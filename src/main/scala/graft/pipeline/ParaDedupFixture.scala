package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.ParaDedup

/**
 * Frozen corpus + driver oracle for cross-document paragraph dedup
 * ([[ParaDedup.dedupParagraphs]]). Planted structure: one boilerplate
 * paragraph recurs in 5 of 8 documents (df ≥ 3 → dropped everywhere,
 * including a doc that carries it twice), one paragraph is shared by
 * exactly 2 documents (df < 3 → kept), the rest are unique. Expected rows
 * are hand-derived from the planted document-frequency table (Python
 * cross-checked), never from running the operator.
 */
object ParaDedupFixture {

  private val B = "Subscribe to our newsletter for weekly updates."
  private val S = "Related articles from our archive."

  private val u = Map(
    "u1a" -> "Glass furnaces glow through the river fog at dawn.",
    "u1b" -> "Barges carry quarried stone toward the city locks.",
    "u2a" -> "Printers set lead type under swaying oil lamps.",
    "u3a" -> "Coopers hammer iron hoops onto seasoned oak staves.",
    "u4a" -> "Weavers thread crimson wool across cedar looms.",
    "u5a" -> "Falconers loose hooded birds above the stubble fields.",
    "u5b" -> "Millers sack ground rye beside the turning wheel.",
    "u6a" -> "Chandlers dip braided wicks in bubbling tallow vats.",
    "u7a" -> "Glaziers fit diamond panes into the chapel frames.")

  /** (doc id, paragraphs) — joined with a blank line for the input table. */
  def docs: Seq[(String, Seq[String])] = Seq(
    "d1" -> Seq(u("u1a"), B, u("u1b")),
    "d2" -> Seq(B, u("u2a")),
    "d3" -> Seq(u("u3a"), B),
    "d4" -> Seq(B, B, u("u4a")),
    "d5" -> Seq(u("u5a"), B, u("u5b")),
    "d6" -> Seq(S, u("u6a")),
    "d7" -> Seq(u("u7a"), S),
    "d8" -> Seq.empty)

  /** Expected `(id, kept paragraphs, paras_total, paras_removed,
    * chars_removed)` — df(B)=5 drops B's 6 occurrences (2 in d4);
    * df(S)=2 keeps S. */
  def expectedRows: Seq[(String, Seq[String], Long, Long, Long)] = Seq(
    ("d1", Seq(u("u1a"), u("u1b")), 3L, 1L, 47L),
    ("d2", Seq(u("u2a")), 2L, 1L, 47L),
    ("d3", Seq(u("u3a")), 2L, 1L, 47L),
    ("d4", Seq(u("u4a")), 3L, 2L, 94L),
    ("d5", Seq(u("u5a"), u("u5b")), 3L, 1L, 47L),
    ("d6", Seq(S, u("u6a")), 2L, 0L, 0L),
    ("d7", Seq(u("u7a"), S), 2L, 0L, 0L),
    ("d8", Seq.empty, 0L, 0L, 0L))

  def fixtureDf(s: SparkSession): DataFrame = {
    import s.implicits._
    val input = s.createDataset(docs.map { case (id, ps) => (id, ps.mkString("\n\n")) })
      .repartition(2)
      .toDF("doc", "text")
    ParaDedup.dedupParagraphs(input, "doc", "text", minDocFreq = 3)
      .orderBy("id")
  }

  def fixtureOracle: String = {
    val values = expectedRows.map { case (id, kept, total, removed, chars) =>
      val text =
        if (kept.isEmpty) "''"
        else kept.map(p => s"'${p.replace("'", "''")}'")
          .mkString(" || chr(10) || chr(10) || ")
      s"  ('$id', $text, $total, $removed, $chars)"
    }
    "SELECT id, text_deduped, CAST(paras_total AS BIGINT) AS paras_total, " +
      "CAST(paras_removed AS BIGINT) AS paras_removed, " +
      "CAST(chars_removed AS BIGINT) AS chars_removed " +
      s"FROM (VALUES\n${values.mkString(",\n")}\n) " +
      "AS t(id, text_deduped, paras_total, paras_removed, chars_removed) " +
      "ORDER BY id"
  }
}
