package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{ExtractJob, PageRow, PagesGen}

/**
 * Dev profiling main: runs the extraction job under a JFR recording and
 * prints the top execution / allocation frames attributed to graft code.
 * Usage: SPARK_GRAFT_CPUS=32 SPARK_GRAFT_DOCS=20000 sbt "runMain graft.Profile"
 * (events: jdk.ExecutionSample + jdk.ObjectAllocationSample).
 */
object Profile {
  def main(args: Array[String]): Unit = {
    // JSON emitters use the f interpolator: pin the locale so a
    // comma-decimal default can never produce invalid JSON
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_DOCS", "20000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpusDir = s"target/bench_corpus_$nDocs"
    if (!new java.io.File(corpusDir + "/_SUCCESS").exists()) {
      PagesGen.generate(spark, nDocs).repartition(64)
        .write.mode("overwrite").parquet(corpusDir)
    }
    val pages = spark.read.parquet(corpusDir).as[PageRow]
    val parts = cpus.toInt * 4

    // warm-up
    ExtractJob.extract(pages, parts).toDF().count()
    ExtractJob.extract(pages, parts).toDF().count()

    val rec = new jdk.jfr.Recording(jdk.jfr.Configuration.getConfiguration("profile"))
    rec.enable("jdk.ObjectAllocationSample").`with`("throttle", "300/s")
    rec.start()
    val t0 = System.nanoTime()
    ExtractJob.extract(pages, parts).toDF().count()
    ExtractJob.extract(pages, parts).toDF().count()
    val dt = (System.nanoTime() - t0) / 1e9
    rec.stop()
    val out = java.nio.file.Paths.get("target/profile.jfr")
    rec.dump(out)
    rec.close()
    System.err.println(f"[profile] 2 passes of $nDocs docs in $dt%.2f s -> ${out.toAbsolutePath}")
    spark.stop()
  }
}
