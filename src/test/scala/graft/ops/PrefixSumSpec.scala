package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** [[PrefixSum.rankAndRunningSum]] must be VALUE-identical to the window
  * forms it replaces (`row_number()` / exclusive `sum().over`) at every
  * group-size distribution — including the one the windows can't survive:
  * a single mega-group holding most of the data. */
class PrefixSumSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "7")
      .config("spark.ui.enabled", "false")
      .appName("graft-prefix-sum")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sampleDf(n: Int, groups: Int) = {
    val s = spark; import s.implicits._
    // deterministic pseudo-random values; group sizes deliberately uneven
    (0 until n).map { i =>
      val g = (i * i * 31 + i) % groups
      (s"g$g", i.toLong, ((i * 2654435761L) % 1000 + 1000) % 97)
    }.toDF("grp", "ord", "v")
  }

  private def windowRef(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("grp")).orderBy(col("ord"))
    df.withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum", coalesce(
        sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("grp", "ord", "v", "rank", "cum")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  private def prefixRes(df: org.apache.spark.sql.DataFrame, parts: Option[Int] = None) =
    PrefixSum.rankAndRunningSum(df, Seq("grp"), Seq("ord"), "rank",
        valueCol = Some("v"), sumName = "cum", numPartitions = parts)
      .select("grp", "ord", "v", "rank", "cum")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("rank and exclusive running sum match the window forms exactly") {
    val df = sampleDf(5000, 23)
    assert(prefixRes(df) == windowRef(df))
  }

  test("mega-group skew: values exact AND the group spans many partitions") {
    val s = spark; import s.implicits._
    // one group holds 95% of rows — the case a window serializes into one task
    val df = (0 until 20000).map { i =>
      val g = if (i % 20 == 0) s"small${i % 100}" else "mega"
      (g, i.toLong, (i % 13).toLong)
    }.toDF("grp", "ord", "v")
    assert(prefixRes(df, parts = Some(16)) == windowRef(df))
    val ranked = PrefixSum.rankAndRunningSum(df, Seq("grp"), Seq("ord"), "rank",
      valueCol = Some("v"), sumName = "cum", numPartitions = Some(16))
    val megaPerPart = ranked.filter(col("grp") === "mega").rdd
      .mapPartitions(it => Iterator(it.size)).collect().filter(_ > 0)
    assert(megaPerPart.length > 1,
      s"mega group landed in ${megaPerPart.length} partition(s) — not split")
    assert(megaPerPart.max < 19000,
      "one partition holds nearly the whole mega group")
  }

  test("identical output at different internal parallelism") {
    val df = sampleDf(3000, 11)
    assert(prefixRes(df, Some(2)) == prefixRes(df, Some(29)))
  }

  test("rank-only mode, null group keys, zero values, empty input") {
    val s = spark; import s.implicits._
    val df = Seq((null: String, 1L, 0L), (null, 2L, 0L), ("a", 3L, 0L))
      .toDF("grp", "ord", "v")
    val got = PrefixSum.rankAndRunningSum(df, Seq("grp"), Seq("ord"), "rank")
      .select("grp", "ord", "rank")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((None, 1L, 1L), (None, 2L, 2L), (Some("a"), 3L, 1L)))
    val empty = spark.emptyDataFrame
      .withColumn("grp", lit("x")).withColumn("ord", lit(1L))
      .filter(lit(false))
    assert(PrefixSum.rankAndRunningSum(empty, Seq("grp"), Seq("ord"), "r").count() == 0)
  }

  test("multi-column group keys rank independently per composite key") {
    val s = spark; import s.implicits._
    val df = (0 until 600).map(i => (i % 3, s"s${i % 5}", i.toLong, 1L))
      .toDF("g1", "g2", "ord", "v")
    val w = Window.partitionBy(col("g1"), col("g2")).orderBy(col("ord"))
    val ref = df.withColumn("rank", row_number().over(w).cast("long"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(4)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    val got = PrefixSum.rankAndRunningSum(df, Seq("g1", "g2"), Seq("ord"), "rank")
      .select("g1", "g2", "ord", "rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(got == ref)
  }
}
