package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The persistent IVF index must be pure storage layout: querying the
  * bucketed table returns byte-identical rows to the in-memory IVF path,
  * and the indexed side of the candidate join scans bucketed (no exchange
  * over the big relation). */
class AnnIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("graft-ann-index")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("index query == in-memory IVF path; bucketed scan carries the join") {
    val s = spark
    import s.implicits._
    val raw = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])]
    val n = raw.count()
    val k = Ann.adaptiveIvfK(n)
    val sampleN = Ann.ivfSampleSize(k)

    val centroids = AnnIndex.build(raw, "ann_index_spec", k, sampleN, numBuckets = 8)
    assert(centroids.length == k)
    assert(AnnIndex.loadCentroids(s, "ann_index_spec").map(_.toSeq).toSeq ==
      centroids.map(_.toSeq).toSeq)

    val queries = raw.filter(_._1 < 5)
    val viaIndex = AnnIndex.query(s, "ann_index_spec", queries, nProbe = 4, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    // reference: the in-memory assignment path with the SAME centroids
    val cB = s.sparkContext.broadcast(centroids)
    val indexed = raw.map { case (id, v) => (id, v, Ann.nearestCentroid(v, cB.value)) }
      .toDF("vec_id", "embedding", "cell")
    import org.apache.spark.sql.functions._
    val probes = queries
      .flatMap { case (qid, v) => Ann.probeCells(v, cB.value, 4).map(c => (qid, v, c)) }
      .toDF("query_id", "q_emb", "cell")
    val inMemory = AnnIndex.scoreProbes(probes, indexed, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    assert(viaIndex.nonEmpty)
    assert(viaIndex.toSeq == inMemory.toSeq,
      "persistent-index results must be byte-identical to the in-memory IVF path")

    // layout audit: the candidate join must scan the table bucketed
    val p = AnnIndex.query(s, "ann_index_spec", queries, nProbe = 4, topK = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("Bucketed: true"), s"indexed side must scan bucketed:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("append: new vectors join the frozen quantizer; query == one-shot assignment") {
    val s = spark
    import s.implicits._
    val raw = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])]
    val old = raw.filter(_._1 % 2 == 0)
    val fresh = raw.filter(_._1 % 2 == 1)
    val k = Ann.adaptiveIvfK(old.count())
    val centroids = AnnIndex.build(old, "ann_index_append", k,
      Ann.ivfSampleSize(k), numBuckets = 8)
    AnnIndex.append(fresh, "ann_index_append")

    val queries = raw.filter(_._1 < 5)
    val viaIndex = AnnIndex.query(s, "ann_index_append", queries, nProbe = 4, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    // reference: assign the WHOLE corpus to the same frozen centroids in one
    // shot — append must be pure ingest, never a different assignment
    val cB = s.sparkContext.broadcast(centroids)
    val indexed = raw.map { case (id, v) => (id, v, Ann.nearestCentroid(v, cB.value)) }
      .toDF("vec_id", "embedding", "cell")
    val probes = queries
      .flatMap { case (qid, v) => Ann.probeCells(v, cB.value, 4).map(c => (qid, v, c)) }
      .toDF("query_id", "q_emb", "cell")
    val oneShot = AnnIndex.scoreProbes(probes, indexed, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(viaIndex.toSeq == oneShot.toSeq)
    // neighbors actually span both halves (the append is visible)
    assert(viaIndex.exists(_._3 % 2 == 1) && viaIndex.exists(_._3 % 2 == 0))

    // the appended table still scans bucketed — the bucket spec survived
    val p = AnnIndex.query(s, "ann_index_append", queries, nProbe = 4, topK = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("Bucketed: true"), s"appended index must stay bucketed:\n${p.take(3000)}")
  }
}
