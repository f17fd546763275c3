package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** ANN scale paths: multi-probe LSH and the IVF coarse quantizer.
  * Recall measured against exact brute-force top-k on a deterministic
  * clustered corpus (everything seeded — the numbers are exact, the
  * assertions are floors with headroom). */
class AnnSpec extends AnyFunSuite {

  private val Dim = 32
  private val NClusters = 12
  private val PerCluster = 50

  /** Clustered corpus: NClusters deterministic centers, each with PerCluster
    * members = center + small deterministic noise (embedding-like geometry:
    * near-neighbors are meaningful, unlike uniform random vectors). */
  private def rnd(seed: Long, i: Int): Float = {
    val h = TextOps.mix64(seed ^ (i.toLong * 0x9e3779b97f4a7c15L))
    (((h >>> 11) * 1.1102230246251565e-16) * 2 - 1).toFloat
  }
  private val corpus: Array[Array[Float]] = {
    val centers = Array.tabulate(NClusters)(c => Array.tabulate(Dim)(d => rnd(1000 + c, d)))
    Array.tabulate(NClusters * PerCluster) { i =>
      val c = i % NClusters
      val v = Array.tabulate(Dim)(d => centers(c)(d) + 0.15f * rnd(2000 + i, d))
      VectorOps.normalize(v)
    }
  }
  private val queryIds = Array(0, 1, 2, 3, 4)
  private val K = 10

  private def trueTopK(q: Int): Set[Int] =
    corpus.indices.filter(_ != q)
      .sortBy(i => (-VectorOps.cosine(corpus(q), corpus(i)), i)).take(K).toSet

  private def recall(candidates: Int => Set[Int]): Double = {
    val r = queryIds.map { q =>
      val truth = trueTopK(q)
      // exact re-rank within candidates, exactly like the queries do
      val top = candidates(q).toSeq.filter(_ != q)
        .sortBy(i => (-VectorOps.cosine(corpus(q), corpus(i)), i)).take(K).toSet
      (top intersect truth).size.toDouble / K
    }
    r.sum / r.length
  }

  test("multi-probe LSH strictly expands the candidate set and recall vs single-probe") {
    val nBits = 8
    val buckets = corpus.map(v => VectorOps.cosineLshBucket(v, nBits))
    def singleCands(q: Int): Set[Int] =
      corpus.indices.filter(i => buckets(i) == buckets(q)).toSet
    def multiCands(q: Int): Set[Int] = {
      val probe = Ann.multiProbeBuckets(corpus(q), nBits, 0, 3).toSet
      corpus.indices.filter(i => probe.contains(buckets(i))).toSet
    }
    val single = recall(singleCands)
    val multi = recall(multiCands)
    assert(multi >= single, s"multi-probe recall $multi < single $single")
    assert(queryIds.forall(q => singleCands(q).subsetOf(multiCands(q))))
    assert(multi >= 0.5, s"multi-probe recall too low on clustered data: $multi")
  }

  test("multiProbeBuckets: first bucket is the query's own; flips are distinct single bits") {
    val v = corpus(7)
    val out = Ann.multiProbeBuckets(v, 8, 0, 3)
    assert(out.length == 4)
    assert(out(0) == VectorOps.cosineLshBucket(v, 8))
    out.drop(1).foreach { b =>
      assert(java.lang.Integer.bitCount(b ^ out(0)) == 1, "each probe flips exactly one bit")
    }
    assert(out.distinct.length == out.length)
    // deterministic
    assert(Ann.multiProbeBuckets(v, 8, 0, 3).sameElements(out))
  }

  test("IVF: k-means cells are deterministic; nProbe=4/16 recall beats a single cell") {
    val centroids = Ann.trainCentroids(corpus.take(256), k = 16)
    val centroids2 = Ann.trainCentroids(corpus.take(256), k = 16)
    assert(centroids.zip(centroids2).forall { case (a, b) => a.sameElements(b) })

    val cells = corpus.map(v => Ann.nearestCentroid(v, centroids))
    def cands(nProbe: Int)(q: Int): Set[Int] = {
      val probe = Ann.probeCells(corpus(q), centroids, nProbe).toSet
      corpus.indices.filter(i => probe.contains(cells(i))).toSet
    }
    val r1 = recall(cands(1))
    val r4 = recall(cands(4))
    assert(r4 >= r1, s"more probes must not lose recall: $r4 < $r1")
    assert(r4 >= 0.8, s"IVF nProbe=4 recall too low on clustered data: $r4")
  }

  test("adaptive nBits keeps bucket occupancy bounded as the corpus grows 16x") {
    // uniform-ish normalized vectors at n and 16n: with the static r2 width
    // the mean occupancy grows 16x; with adaptiveNBits it stays ~targetBucket
    val target = 64L
    val occupancies = Seq(1000, 16000).map { n =>
      val nBits = Ann.adaptiveNBits(n, target)
      val vecs = Array.tabulate(n)(i =>
        VectorOps.normalize(Array.tabulate(Dim)(d => rnd(3000L + i, d))))
      val occ = vecs.groupBy(v => VectorOps.cosineLshBucket(v, nBits)).values.map(_.length)
      val mean = n.toDouble / (1 << nBits)
      assert(mean <= 2 * target, s"n=$n nBits=$nBits expected occupancy $mean > 2x target")
      assert(occ.max <= 8 * target, s"n=$n max bucket ${occ.max} blew past 8x target")
      mean
    }
    // occupancy must NOT scale with n (the r2 bug): 16x corpus, ~same mean
    assert(occupancies(1) <= 2 * occupancies(0) + target,
      s"occupancy grew with the corpus: $occupancies")
    assert(Ann.adaptiveNBits(16000, target) == Ann.adaptiveNBits(1000, target) + 4)
  }

  test("adaptive sizing formulas: clamps, monotonicity, ivf k ~ sqrt(n)") {
    assert(Ann.adaptiveNBits(0, 64) == 4)                    // minBits floor
    assert(Ann.adaptiveNBits(Long.MaxValue, 1) == 24)        // maxBits ceiling
    assert(Ann.adaptiveNBits(1L << 40, 128) == 24)           // 1T vectors clamped
    // exact power-of-two ratios — where a float ceil(log/log) could flip by
    // one ulp: the integer form must give the mathematical ceil-log2
    for (b <- 4 to 20) {
      assert(Ann.adaptiveNBits(64L << b, 64) == b,
        s"n = 64·2^$b, target 64 must give exactly $b bits")
      assert(Ann.adaptiveNBits((64L << b) + 1, 64) == math.min(24, b + 1),
        s"one past 64·2^$b must round UP")
    }
    val ns = Seq(1000L, 16000L, 256000L, 4096000L)
    val bits = ns.map(Ann.adaptiveNBits(_, 64))
    assert(bits == bits.sorted, "nBits must be monotone in n")
    assert(Ann.adaptiveIvfK(2000) == 45)
    assert(Ann.adaptiveIvfK(1L << 40) == 4096)               // clamped
    assert(Ann.adaptiveIvfK(1) == 4)                         // floor
    assert(Ann.ivfSampleSize(45) == 2880)
    assert(Ann.ivfSampleSize(4096) == 65536)                 // collect bound
  }

  test("probeCells returns the nearest cells most-similar first") {
    val centroids = Ann.trainCentroids(corpus.take(100), k = 8)
    val q = corpus(3)
    val probes = Ann.probeCells(q, centroids, 3)
    assert(probes.length == 3)
    val sims = probes.map(c => VectorOps.cosine(q, centroids(c)))
    assert(sims.sliding(2).forall(p => p(0) >= p(1)))
    assert(probes(0) == Ann.nearestCentroid(q, centroids))
  }
}
