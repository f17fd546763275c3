package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Shared scaffold for the fixture-anchored driver queries: every fixture
 * query is a distributed map over a list of case names emitting
 * `(case, field, value)` string rows, and every oracle is a `VALUES` table
 * of the expected rows. One definition of each, so the row shape, ordering,
 * and SQL escaping cannot drift between the dozen fixture families.
 */
object FixtureSupport {

  /** Distributed `(case, field, value)` fixture: the case list becomes a
    * 2-partition Dataset and `f` runs per case inside `mapPartitions` —
    * the same executor-side shape every per-row operator runs at scale. */
  def fixtureDf(s: SparkSession, cases: Seq[String], caseCol: String = "test_case")(
      f: String => Seq[(String, String)]): DataFrame = {
    import s.implicits._
    s.createDataset(cases).repartition(2)
      .mapPartitions(_.flatMap(name => f(name).map { case (fld, v) => (name, fld, v) }))
      .toDF(caseCol, "field", "value").orderBy(caseCol, "field")
  }

  private def esc(v: String): String = v.replace("'", "''")

  /** `SELECT * FROM (VALUES ...)` oracle over expected
    * `(case, field, value)` rows; apostrophes SQL-escaped. */
  def valuesOracle(rows: Seq[(String, String, String)], caseCol: String = "test_case"): String = {
    val values = rows.map { case (c, f, v) => s"  ('${esc(c)}', '${esc(f)}', '${esc(v)}')" }
    s"SELECT * FROM (VALUES\n${values.mkString(",\n")}\n) AS t($caseCol, field, value) ORDER BY $caseCol, field"
  }

  /** Two-column variant for `(case, value)` fixtures. */
  def valuesOracle2(rows: Seq[(String, String)], caseCol: String = "test_case"): String = {
    val values = rows.map { case (c, v) => s"  ('${esc(c)}', '${esc(v)}')" }
    s"SELECT * FROM (VALUES\n${values.mkString(",\n")}\n) AS t($caseCol, value) ORDER BY $caseCol"
  }
}
