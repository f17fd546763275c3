package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.{ExtractJob, PagesGen}

/**
 * Benchmark main — one JSON line per run (driver contract).
 *
 * Headline metric: extraction throughput (docs/sec) over the deterministic
 * synthetic corpus at `SPARK_GRAFT_SF_DIR` scale, after a JIT warm-up run,
 * plus per-query wall seconds for every `SparkEntry.queries` entry.
 *
 * Scaling protocol (BASELINE.md): the same main is run at two parallelism
 * levels (`SPARK_GRAFT_CPUS=8` then `32`) on identical input; efficiency =
 * tput(4N) / (4 × tput(N)) — reported in BASELINE.md from the two JSON lines.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nDocs = PagesGen.pagesFor(sfDir)
    val parts = cpus.toInt

    // warm-up (JIT) — discarded
    ExtractJob.extract(PagesGen.generate(spark, math.min(500, nDocs)), parts).toDF().count()

    // headline: extraction throughput over the salted-host layout
    val t0 = System.nanoTime()
    val extractedCount = ExtractJob.extract(PagesGen.generate(spark, nDocs), parts).toDF().count()
    val extractSec = (System.nanoTime() - t0) / 1e9
    val docsPerSec = extractedCount / extractSec

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val q0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - q0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = extractSec + results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"sf":"$sfDir%s","cpus":$cpus%s,"extract_docs":$extractedCount%d,"extract_sec":$extractSec%.3f,"extract_docs_per_sec":$docsPerSec%.1f}""")
    spark.stop()
  }
}
