package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{ExtractJob, PageRow}

/** Dev diagnostic (not part of the driver contract): throughput of the
  * OOXML office route through the SAME fused extraction job the HTML and
  * PDF headlines measure — `SPARK_GRAFT_DOCS` of each flavor (docx
  * report / pptx deck / xlsx workbook), median of 3 after 2 warm passes.
  * Numbers recorded in BASELINE.md. */
object OfficeBench {
  def main(args: Array[String]): Unit = {
    // JSON emitters use the f interpolator: pin the locale so a
    // comma-decimal default can never produce invalid JSON
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_DOCS", "20000").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark_local" else "/tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // one frozen blob per flavor: parse work is the constant here, so the
    // per-doc cost is honest even though the bytes repeat
    val flavors = Seq(
      "docx" -> graft.sources.DocxGen.report,
      "pptx" -> graft.sources.DocxGen.deck,
      "xlsx" -> graft.sources.DocxGen.workbook)
    val results = flavors.map { case (label, blob) =>
      val pages = spark.range(n).map { i =>
        PageRow(s"https://office.example.com/$label$i.$label", ts, blob, "", "en")
      }.repartition(128).persist()
      pages.count()
      ExtractJob.extract(pages, 128).toDF().count() // warm (JIT)
      ExtractJob.extract(pages, 128).toDF().count()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        ExtractJob.extract(pages, 128).toDF().count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val ok = ExtractJob.extract(pages, 128)
        .filter(r => r.status == "ok" && r.word_count > 0).count()
      pages.unpersist()
      (label, ok, times(1))
    }
    val per = results.map { case (l, ok, sec) =>
      f""""$l":{"ok":$ok,"sec":$sec%.3f,"docs_per_sec":${n / sec}%.1f}"""
    }.mkString(",")
    println(s"""{"metric":"office_extract","docs_per_flavor":$n,$per,"cpus":$cpus}""")
    spark.stop()
  }
}
