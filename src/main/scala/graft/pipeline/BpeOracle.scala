package graft.pipeline

import graft.ops.Bpe

/**
 * DuckDB replay of the byte-level BPE count — the cross-engine oracle for
 * `doc_tokens_bpe` / `bpe_fixture`. The replay is the textbook
 * "space-separated symbols + sequential replace" BPE formulation
 * (Sennrich et al.'s apply path), generated FROM the same frozen
 * [[Bpe.FixtureMerges]] the Spark expression ships:
 *
 *  1. pre-tokenize with the SAME RE2-safe pattern ([[Bpe.PretokenPattern]]
 *     — leftmost-first alternation behaves identically in java.util.regex
 *     and RE2);
 *  2. per pre-token, render GPT-2 byte-unicode symbols (ASCII fixture
 *     corpus: only 0x20→Ġ matters) wrapped in `chr(1)` separators —
 *     `|a||b||c|`-style, so a merge replace can only ever match WHOLE
 *     adjacent symbols, never substrings spanning a symbol boundary
 *     (chr(1) can never appear inside a symbol: GPT-2's table maps byte
 *     0x01 to U+0101);
 *  3. apply each merge IN RANK ORDER as one non-overlapping left-to-right
 *     `replace` — equivalent to the min-rank loop for a valid learned
 *     merge list with unique outputs (which [[Bpe.learn]] guarantees);
 *  4. count = separator-pairs remaining = (len − len-without-sep) / 2,
 *     summed over pre-tokens; token-less texts count 0 via the left join.
 */
object BpeOracle {

  private def q(s: String): String = s.replace("'", "''")

  private val Sep = "chr(1)"

  /** SQL expression: one pre-token string `tok` → separator-wrapped
    * symbol rendering. */
  private def repExpr(tok: String): String =
    // (?s): '.' must wrap EVERY char including \n (a \s+ pre-token can be
    // "\n\n"; without the flag those chars are silently left un-wrapped
    // and count 0). NOTE the per-CHAR rendering is exact only for ASCII
    // corpora: the Spark expression is per-UTF-8-BYTE ('café' = 5 byte
    // symbols vs 4 chars here) — the driver corpus is ASCII, and a
    // non-ASCII regeneration must extend this to a byte-level map.
    s"regexp_replace(replace($tok, ' ', chr(288)), '(?s)(.)', " +
      s"$Sep || '\\1' || $Sep, 'g')"

  /** SQL expression: chained rank-order merge replay over rendering `r`. */
  private def mergeExpr(r: String): String =
    Bpe.FixtureMerges.foldLeft(r) { case (acc, (a, b)) =>
      s"replace($acc, $Sep || '${q(a)}' || $Sep || $Sep || '${q(b)}' || $Sep, " +
        s"$Sep || '${q(a + b)}' || $Sep)"
    }

  /** Full replay query over `(idCol, textCol)` rows of `source` (a table
    * name or a parenthesized VALUES clause aliased to those columns). */
  def countSql(source: String, idCol: String, textCol: String,
               outCol: String): String = {
    val pat = q(Bpe.PretokenPattern)
    s"WITH base AS (SELECT $idCol, $textCol FROM $source), " +
      s"toks AS (SELECT $idCol, unnest(regexp_extract_all($textCol, '$pat')) AS tok FROM base), " +
      s"rep AS (SELECT $idCol, ${repExpr("tok")} AS r FROM toks), " +
      s"merged AS (SELECT $idCol, ${mergeExpr("r")} AS m FROM rep), " +
      s"cnt AS (SELECT $idCol, CAST(sum((length(m) - length(replace(m, $Sep, ''))) // 2) AS BIGINT) AS $outCol " +
      s"FROM merged GROUP BY $idCol) " +
      s"SELECT d.$idCol, coalesce(c.$outCol, 0) AS $outCol " +
      s"FROM base d LEFT JOIN cnt c USING ($idCol) ORDER BY d.$idCol"
  }

  /** Planted pre-tokenizer edge shapes: contractions, digit runs, punct
    * runs, multi-space, leading/trailing space, fully-unseen words (no
    * merge fires), empty text (count 0). */
  val FixtureRows: Seq[(Int, String)] = Seq(
    1 -> "the fast table scan",
    2 -> "it's we'll i'd can't",
    3 -> "batch  batch   batch",
    4 -> "123 456 !! ?? ,,",
    5 -> "unseen zebra qqq xylophone",
    6 -> " leading and trailing ",
    7 -> "",
    8 -> "the the the window window spark")

  def fixtureValuesClause: String =
    "(VALUES " + FixtureRows.map { case (i, t) => s"($i, '${q(t)}')" }
      .mkString(", ") + ") AS v(fid, txt)"
}
