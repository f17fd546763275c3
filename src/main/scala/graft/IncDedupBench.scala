package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.IncrementalDedup

/** Dev diagnostic (not part of the driver contract): throughput of the
  * durable incremental-dedup ingest loop ([[graft.ops.IncrementalDedup
  * .dedupeAndCommit]]) at two parallelism levels — the two-cluster-size
  * scaling evidence for the ingest-time dedup path, recorded in
  * BASELINE.md.
  *
  * Corpus: the sf documents table amplified `SPARK_GRAFT_COPIES`× with a
  * production-ingest duplicate mix — copy 0 is the original, later copies
  * are exact duplicates (2/3) or near-duplicates with one appended
  * sentence (1/3, Jaccard ≈ 0.84 over 3-shingles). Rows are split into
  * `SPARK_GRAFT_BATCHES` ingest batches by id hash, so batch 1 is mostly
  * fresh and later batches are mostly duplicate-vs-history — the shape a
  * recrawl-heavy feed produces. Timing covers the FULL commit (dedup plan
  * + ledger materialization + parquet store append); input prep is
  * persisted and counted beforehand. One full warm pass on a throwaway
  * store first (JIT), then the measured pass on a fresh store.
  */
object IncDedupBench {
  def main(args: Array[String]): Unit = {
    // JSON emitters use the f interpolator: pin the locale so a
    // comma-decimal default can never produce invalid JSON
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "8").toInt
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "4").toInt
    // scaling-probe knob: pad every document to ~padWords with DETERMINISTIC
    // id-seeded pseudo-words (unique-ish shingles → real MinHash work). The
    // sf texts are ~45 words; at that size a batch is stage-dispatch-bound
    // and thread scaling is invisible — padding makes signature compute
    // dominate, the regime a real crawl batch is in. Dup relationships are
    // preserved: a copy pads identically to its original (same id tail).
    val padWords = sys.env.getOrElse("SPARK_GRAFT_PAD_WORDS", "0").toInt
    // fixed partition count across parallelism levels (the extract scaling
    // protocol's rule): otherwise the partition-count change masquerades as
    // thread scaling
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark_local" else "/tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
    val corpus = docs.as[(Long, String)].flatMap { case (id, t) =>
      val base = if (padWords <= 0) t else {
        val sb = new StringBuilder(t)
        var k = 0
        while (k < padWords) {
          // splitmix64 of (id, k): random-looking words, so distinct docs
          // share no 3-word runs (an arithmetic stream would plant long
          // common runs and near-dup the whole corpus together)
          var h = id * 0x9E3779B97F4A7C15L + k
          h ^= h >>> 30; h *= 0xBF58476D1CE4E5B9L
          h ^= h >>> 27; h *= 0x94D049BB133111EBL
          h ^= h >>> 31
          sb.append(" w").append(h & 0xFFFF)
          k += 1
        }
        sb.toString
      }
      (0 until copies).iterator.map { c =>
        val text =
          if (c == 0) base
          else if (c % 3 == 1) base + " One extra trailing sentence marks this copy as a near duplicate variant."
          else base
        (s"$c:$id", text)
      }
    }.toDF("doc", "body")
      .withColumn("batch", pmod(xxhash64(col("doc")), lit(nBatches)))
      .persist()
    val total = corpus.count()

    def runPass(storeDir: String): (Seq[Double], Map[String, Long]) = {
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      val stages = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      (0 until nBatches).foreach { b =>
        val batch = corpus.filter(col("batch") === b).select("doc", "body")
        val t0 = System.nanoTime()
        val ledger = IncrementalDedup.dedupeAndCommit(batch, "doc", "body", storeDir)
        ledger.groupBy("stage").count().collect()
          .foreach(r => stages(if (r.getString(0).isEmpty) "kept" else r.getString(0)) += r.getLong(1))
        times += (System.nanoTime() - t0) / 1e9
      }
      (times.toSeq, stages.toMap)
    }

    def tmp() = java.nio.file.Files.createTempDirectory("graft-incdedup-bench-")
      .toAbsolutePath.toString
    runPass(tmp()) // warm (JIT)
    val (times, stages) = runPass(tmp())
    val sec = times.sum
    val perBatch = times.map(t => f"$t%.3f").mkString("[", ",", "]")
    val stageStr = stages.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(f"""{"metric":"incdedup_ingest","docs":$total,"batches":$nBatches,"sec":$sec%.3f,"docs_per_sec":${total / sec}%.1f,"batch_sec":$perBatch%s,"stages":$stageStr%s,"cpus":$cpus%s}""")
    spark.stop()
  }
}
