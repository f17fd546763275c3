package graft.pipeline

import graft.ops.TextOps

/**
 * DERIVED-INPUT DuckDB oracles for the corpus queries whose input is the
 * extracted page corpus rather than a driver parquet table. The page
 * corpus never reaches DuckDB — but the extraction DUMP does: `Verify`
 * writes every query's result under its outDir, so the post-extraction
 * logic (aggregation, classifiers, paragraph dedup, quality scoring) can
 * be replayed cross-engine over a DuckDB read_parquet of that dump.
 * This verifies the OPERATOR layer independently in a second
 * engine; the extraction layer feeding it is separately gated by the
 * fixture twins (oracle-checked VALUES) and the 103 frozen goldens.
 * These oracles are only emitted when [[graft.SparkEntry.verifyOutDir]]
 * is set (Verify sets it); otherwise the queries stay rows-only exactly
 * as before.
 *
 * Floating-point replays (`quality_pages`, `langid_pages`) re-run the
 * identical double arithmetic in the same operation order; outputs are
 * 4-decimal-rounded with explicit `floor(x·1e4 + 0.5)` on both sides.
 */
object DerivedOracles {

  private def q(s: String): String = s.replace("'", "''")

  private def dump(outDir: String, name: String): String =
    s"read_parquet('${outDir}/$name/*.parquet')"

  /** Exact-dedup aggregate over the normalized-extraction dump: the
    * count + keeper selection is pure SQL. */
  def dedupExactPages(outDir: String): String =
    s"SELECT norm_hash, count(*) AS n, min(url) AS keeper_url " +
      s"FROM ${dump(outDir, "extract_normalized")} " +
      "GROUP BY norm_hash ORDER BY norm_hash"

  /** Cross-document paragraph dedup (minDocFreq = 5) replayed over the
    * normalized-extraction dump: split on \n{2,}, trim, doc-freq per
    * distinct paragraph, drop the boilerplate tail, rebuild in order. */
  def paraDedupPages(outDir: String): String =
    s"WITH base AS (SELECT url, normalized_text FROM ${dump(outDir, "extract_normalized")}), " +
      "ps AS (SELECT url, regexp_split_to_array(normalized_text, '\\n{2,}') AS parr FROM base), " +
      "ix AS (SELECT url, parr, unnest(generate_series(1, len(parr))) AS idx FROM ps), " +
      "segs AS (SELECT url, idx, trim(parr[idx]) AS para FROM ix WHERE trim(parr[idx]) <> ''), " +
      "boiler AS (SELECT para FROM segs GROUP BY para HAVING count(DISTINCT url) >= 5), " +
      "marked AS (SELECT s.url, s.idx, s.para, b.para IS NOT NULL AS dropped " +
      "FROM segs s LEFT JOIN boiler b USING (para)), " +
      "agg AS (SELECT url, " +
      "coalesce(string_agg(CASE WHEN NOT dropped THEN para END, chr(10) || chr(10) ORDER BY idx), '') AS txt, " +
      "count(*) AS paras_total, " +
      "sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS paras_removed, " +
      "sum(CASE WHEN dropped THEN length(para) ELSE 0 END) AS chars_removed " +
      "FROM marked GROUP BY url) " +
      "SELECT b.url, CAST(length(coalesce(a.txt, '')) AS INT) AS n_chars, " +
      "CAST(coalesce(a.paras_total, 0) AS BIGINT) AS paras_total, " +
      "CAST(coalesce(a.paras_removed, 0) AS BIGINT) AS paras_removed, " +
      "CAST(coalesce(a.chars_removed, 0) AS BIGINT) AS chars_removed " +
      "FROM base b LEFT JOIN agg a USING (url) ORDER BY url"

  private def sqlStringList(words: Iterable[String]): String =
    words.map(w => s"'${q(w)}'").mkString("[", ", ", "]")

  /** TextOps.quality replayed over the content dump: char-class counts,
    * stopword ratio (en profile, words stripped of non-letters), and the
    * composite score with the identical term order and Math.round(x·1e4)
    * semantics. */
  def qualityPages(outDir: String): String = {
    val en = sqlStringList(TextOps.profiles("en").toSeq.sorted)
    s"WITH base AS (SELECT url, text_content AS t FROM ${dump(outDir, "extract_content")}), " +
      "w AS (SELECT url, t, list_filter(regexp_split_to_array(lower(t), '\\s+'), x -> x <> '') AS ws FROM base), " +
      "m AS (SELECT url, t, ws, length(t) AS n, len(ws) AS n_words, " +
      "CASE WHEN len(ws) = 0 THEN 0.0 ELSE CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE) / len(ws) END AS mean_word_len, " +
      s"CASE WHEN len(ws) = 0 THEN 0.0 ELSE CAST(len(list_filter(ws, x -> list_contains($en, regexp_replace(x, '[^\\p{L}]', '', 'g')))) AS DOUBLE) / len(ws) END AS stop_ratio, " +
      "CAST(length(regexp_replace(t, '[^\\p{Lu}]', '', 'g')) AS DOUBLE) / length(t) AS upper_ratio, " +
      "CAST(length(regexp_replace(t, '[^\\p{Nd}]', '', 'g')) AS DOUBLE) / length(t) AS digit_ratio " +
      "FROM w WHERE length(t) > 0), " +
      "s AS (SELECT url, n, n_words, " +
      "least(1.0, n_words / 100.0) * 0.3 " +
      "+ (CASE WHEN n_words > 0 AND mean_word_len >= 3 AND mean_word_len <= 10 THEN 1.0 ELSE 0.3 END) * 0.2 " +
      "+ least(1.0, stop_ratio / 0.25) * 0.3 " +
      "+ 0.2 * (CASE WHEN upper_ratio > 0.3 THEN 0.3 ELSE 1.0 END) * (CASE WHEN digit_ratio > 0.3 THEN 0.3 ELSE 1.0 END) AS score " +
      "FROM m) " +
      "SELECT b.url, CAST(coalesce(s.n, 0) AS INT) AS n_chars, " +
      "CAST(coalesce(s.n_words, 0) AS INT) AS n_words, " +
      "coalesce(floor(s.score * 10000 + 0.5) / 10000, 0.0) AS quality_score " +
      "FROM base b LEFT JOIN s USING (url) ORDER BY url"
  }

  /** TextOps.detectLanguage tier 2 (Latin stopword profiles, declared
    * tie-break order, first-500-words cap) over the content dump. Tier 1
    * (non-Latin scripts) is structurally dead on this ASCII corpus — the
    * oracle-gated `langid_fixture` covers those branches. */
  def langidPages(outDir: String): String = {
    val hitExprs = TextOps.profileOrder.map { lang =>
      val stops = sqlStringList(TextOps.profiles(lang).toSeq.sorted)
      s"len(list_filter(ws, x -> list_contains($stops, x))) AS h_$lang"
    }.mkString(", ")
    // winner = FIRST lang in declared order whose hits equal the max
    // (the Scala loop keeps a lang only on strictly-greater hits)
    val mx = "greatest(" + TextOps.profileOrder.map("h_" + _).mkString(", ") + ")"
    val bestLang = "CASE WHEN mx = 0 THEN 'und' " +
      TextOps.profileOrder.map(l => s"WHEN h_$l = mx THEN '$l'").mkString(" ") +
      " END"
    s"WITH base AS (SELECT url, text_content AS t FROM ${dump(outDir, "extract_content")}), " +
      "w AS (SELECT url, list_filter(regexp_split_to_array(lower(t), '[^\\p{L}]+'), x -> x <> '')[1:500] AS ws FROM base), " +
      s"h0 AS (SELECT url, ws, $hitExprs FROM w), " +
      s"h AS (SELECT *, $mx AS mx FROM h0), " +
      s"r AS (SELECT url, CASE WHEN len(ws) = 0 THEN 'und' ELSE $bestLang END AS detected_lang, " +
      s"CASE WHEN len(ws) = 0 OR mx = 0 THEN 0.0 ELSE CAST(mx AS DOUBLE) / len(ws) END AS conf FROM h) " +
      "SELECT url, detected_lang, floor(conf * 10000 + 0.5) / 10000 AS confidence " +
      "FROM r ORDER BY url"
  }

  def all(outDir: String): Map[String, String] = Map(
    "dedup_exact_pages" -> dedupExactPages(outDir),
    "para_dedup_pages" -> paraDedupPages(outDir),
    "quality_pages" -> qualityPages(outDir),
    "langid_pages" -> langidPages(outDir))
}
