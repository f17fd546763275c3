package graft

import java.io.File

import org.apache.spark.sql.SparkSession

/** Dev diagnostic (not part of the driver contract): throughput of the
  * WARC ingest leg — `SPARK_GRAFT_DOCS` PagesGen pages written once as
  * sharded per-record-gzip WARC files (the Common-Crawl layout), then
  * (a) ingest-only (`format("warc")` scan → PageRow projection → count)
  * and (b) ingest + the fused extraction, median of 3 after 2 warm
  * passes. `SPARK_GRAFT_CPUS` sets parallelism, so running at 8 and 32
  * gives the north rule's two-level scaling evidence for the archive
  * path. Measurements recorded in BASELINE.md. */
object WarcBench {
  def main(args: Array[String]): Unit = {
    // JSON emitters use the f interpolator: pin the locale so a
    // comma-decimal default can never produce invalid JSON
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_DOCS", "40000").toInt
    val shards = sys.env.getOrElse("SPARK_GRAFT_SHARDS", "128").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark_local" else "/tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // corpus: written once per (n, shards); parallel writer — one task per
    // shard, each a pure function of (Seed, shard)
    val dir = new File(
      if (new File("/dev/shm").isDirectory) "/dev/shm" else "/tmp",
      s"graft_warcbench_${n}_$shards")
    if (!new File(dir, "_DONE").exists()) {
      val t0 = System.nanoTime()
      spark.range(shards.toLong).repartition(shards).foreachPartition {
        (it: Iterator[java.lang.Long]) =>
          it.foreach { s =>
            graft.sources.WarcGen.writeCorpusShard(dir, n, shards, s.toInt)
          }
      }
      new java.io.FileOutputStream(new File(dir, "_DONE")).close()
      System.err.println(f"[warcbench] corpus write: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val corpusBytes = dir.listFiles().map(_.length()).sum

    def median3(f: () => Long): (Long, Double) = {
      f(); f() // warm: JIT + page cache
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val c = f()
        (c, (System.nanoTime() - t0) / 1e9)
      }
      (runs.head._1, runs.map(_._2).sorted.apply(1))
    }

    val (scanCount, scanSec) = median3(() =>
      graft.pipeline.WarcIngest.pages(spark, dir.getAbsolutePath).toDF().count())
    val (exCount, exSec) = median3(() =>
      graft.pipeline.ExtractJob.extract(
        graft.pipeline.WarcIngest.pages(spark, dir.getAbsolutePath), 128)
        .filter(_.status == "ok").toDF().count())
    // pruned scan: record census without payload buffering
    val (prunedCount, prunedSec) = median3(() =>
      spark.read.format("warc").load(dir.getAbsolutePath)
        .where("warc_type = 'response'").select("url").count())

    println(f"""{"metric":"warc_ingest","docs":$n,"shards":$shards,"corpus_mb":${corpusBytes / 1e6}%.1f,"ingest_docs":$scanCount,"ingest_sec":$scanSec%.3f,"ingest_docs_per_sec":${scanCount / scanSec}%.1f,"extract_ok":$exCount,"extract_sec":$exSec%.3f,"extract_docs_per_sec":${n / exSec}%.1f,"pruned_records":$prunedCount,"pruned_sec":$prunedSec%.3f,"cpus":$cpus%s}""")
    spark.stop()
  }
}
