package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{ExtractJob, PageRow}

/** Dev diagnostic (not part of the driver contract): throughput of the
  * PDF route through the SAME fused extraction job the HTML headline
  * measures — `SPARK_GRAFT_DOCS` two-page Flate PDFs from
  * `PdfGen.syntheticDoc`, median of 3 after 2 warm passes. Round-5
  * measurement recorded in BASELINE.md. */
object PdfBench {
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
    def bench(label: String, gen: Long => Array[Byte], minWords: Int): (Long, Double) = {
      val pdfs = spark.range(n).map { i =>
        PageRow(s"https://pdfs.example.com/$label$i.pdf", ts, gen(i), "", "en")
      }.repartition(128).persist()
      pdfs.count()
      ExtractJob.extract(pdfs, 128).toDF().count() // warm (JIT)
      ExtractJob.extract(pdfs, 128).toDF().count()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        ExtractJob.extract(pdfs, 128).toDF().count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val ok = ExtractJob.extract(pdfs, 128)
        .filter(r => r.status == "ok" && r.word_count > minWords).count()
      pdfs.unpersist()
      (ok, times(1))
    }
    val (ok, sec) = bench("doc", graft.sources.PdfGen.syntheticDoc, 100)
    // decryption probe (round 6): same job, RC4-R3 empty-password corpus —
    // the per-doc cost is the handler auth (≈100 MD5 of ≤32 bytes) + one
    // RC4 pass over the content stream
    val (encOk, encSec) = bench("enc", graft.sources.PdfGen.syntheticEncryptedDoc, 100)
    println(f"""{"metric":"pdf_extract","docs":$n,"ok":$ok,"sec":$sec%.3f,"docs_per_sec":${n / sec}%.1f,"enc_ok":$encOk,"enc_sec":$encSec%.3f,"enc_docs_per_sec":${n / encSec}%.1f,"cpus":$cpus%s}""")
    spark.stop()
  }
}
