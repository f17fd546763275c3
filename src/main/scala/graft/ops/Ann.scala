package graft.ops

/**
 * Approximate-nearest-neighbor scale paths beyond the single-bucket LSH in
 * [[VectorOps.cosineLshBucket]]:
 *
 *  - **Multi-probe LSH** — the RECOMMENDED LSH tier (VERDICT r5 #7: 0.88
 *    recall vs single-probe's 0.60 at near-identical measured cost): probe
 *    the query's own bucket plus the buckets reached by flipping the
 *    least-confident hyperplane bits (smallest |projection|), the standard
 *    recall lever that avoids adding tables (Lv et al., VLDB'07 — public
 *    method). Candidates multiply by (1 + probes) instead of by table
 *    count. Single-probe [[VectorOps.cosineLshBucket]] remains the explicit
 *    cheap opt-in for latency-first callers.
 *  - **IVF (inverted-file) coarse quantizer**: deterministic k-means over a
 *    bounded sample → every vector is assigned to its nearest centroid cell;
 *    queries scan only the `nProbe` nearest cells. Centroids are tiny
 *    (k × dim floats) and broadcast; assignment is a narrow map; the
 *    candidate join is an equi-join on cell id.
 *
 * Everything is deterministic: fixed seeds, fixed iteration counts, ties by
 * lowest index — byte-stable across runs and parallelism levels.
 */
object Ann {

  // ---- corpus-adaptive index sizing ----
  // Static widths die at scale: a 4-bit hyperplane bucket holds n/16 vectors,
  // so at 1B vectors every bucket self-join is quadratic again. Derive the
  // index width from the corpus count so expected occupancy stays ~constant
  // as the corpus grows.

  /** Hyperplane bits so the EXPECTED bucket occupancy ≈ `targetBucket`:
    * `ceil(log2(n / targetBucket))`, clamped to [minBits, maxBits].
    * Occupancy stays in [targetBucket/2, targetBucket] as n grows (the ceil
    * rounds bucket count up), so candidate self-joins stay O(n·target) and
    * per-query candidate lists stay O(target) at any corpus size.
    *
    * Computed in INTEGER arithmetic (smallest b with 2^b ≥ ⌈n/target⌉ —
    * identical to the mathematical ceil-log2 for all inputs), not
    * `ceil(log(x)/log(2))`: libm `log` is not correctly rounded, so the
    * float form can flip by one at exact power-of-two ratios AND can
    * disagree between the JVM and the DuckDB oracle replaying it — an
    * off-by-one here rewrites every bucket. */
  def adaptiveNBits(n: Long, targetBucket: Long = 128L, minBits: Int = 4, maxBits: Int = 24): Int = {
    val t = math.max(1L, targetBucket)
    val m = math.max(1L, (n + t - 1) / t) // ⌈n/target⌉
    var b = 0
    while (b < maxBits && (1L << b) < m) b += 1
    math.min(maxBits, math.max(minBits, b))
  }

  /** IVF cell count k ≈ √n (the standard balance point: query cost
    * ~ k + nProbe·n/k is minimized at k = √(nProbe·n)), clamped. The maxK
    * clamp bounds the broadcast centroid table (maxK × dim floats) and the
    * driver-side Lloyd training cost; past it, training itself should move
    * to a distributed k-means — out of scope for this engine's query surface. */
  def adaptiveIvfK(n: Long, minK: Int = 4, maxK: Int = 4096): Int =
    math.min(maxK, math.max(minK, math.ceil(math.sqrt(n.toDouble)).toInt))

  /** Training sample size for `k` cells: ~`perCell` vectors per centroid,
    * capped so the driver-side collect stays bounded at any corpus size. */
  def ivfSampleSize(k: Int, perCell: Int = 64, max: Int = 65536): Int =
    math.min(max, math.max(k, k * perCell))

  // ---- multi-probe LSH ----

  /** Buckets to probe for query `v`: its own bucket first, then the buckets
    * at Hamming distance 1 obtained by flipping the `probes` least-confident
    * bits (ascending |projection| onto each hyperplane). */
  def multiProbeBuckets(v: Array[Float], nBits: Int, table: Int, probes: Int): Array[Int] = {
    // ONE projection pass: the base bucket is the sign bits of the same
    // projections whose magnitudes rank the flips (cosineLshBucket's
    // `proj >= 0 → bit set` convention) — recomputing them separately would
    // double the per-query hashing cost (nBits × dim mixes)
    val margins = new Array[(Double, Int)](nBits)
    var base = 0
    var bit = 0
    while (bit < nBits) {
      val proj = VectorOps.hyperplaneProjection(v, bit, table)
      if (proj >= 0) base |= (1 << bit)
      margins(bit) = (math.abs(proj), bit)
      bit += 1
    }
    if (probes <= 0) return Array(base)
    val flipOrder = margins.sortBy { case (m, i) => (m, i) }
    val out = new Array[Int](1 + math.min(probes, nBits))
    out(0) = base
    var p = 0
    while (p < out.length - 1) {
      out(p + 1) = base ^ (1 << flipOrder(p)._2)
      p += 1
    }
    out
  }

  // ---- IVF ----

  /** Deterministic k-means (Lloyd) over a bounded sample: seeds are the `k`
    * sample vectors with the lowest mixed-hash of their index (seeded,
    * order-independent), `iters` fixed iterations, empty cells keep their
    * previous centroid. Returns `k` centroids. */
  def trainCentroids(
      sample: Array[Array[Float]],
      k: Int,
      iters: Int = 10,
      seed: Long = 42L): Array[Array[Float]] = {
    require(sample.nonEmpty, "empty training sample")
    val kk = math.min(k, sample.length)
    val dim = sample.head.length
    // deterministic seed pick: order sample indices by mix64(seed ^ idx)
    val seedIdx = sample.indices.sortBy(i => TextOps.mix64(seed ^ i.toLong)).take(kk)
    var centroids = seedIdx.map(i => sample(i).clone()).toArray

    var iter = 0
    while (iter < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      var i = 0
      while (i < sample.length) {
        val c = nearestCentroid(sample(i), centroids)
        val s = sums(c)
        val v = sample(i)
        var d = 0
        while (d < dim) { s(d) += v(d); d += 1 }
        counts(c) += 1
        i += 1
      }
      centroids = Array.tabulate(kk) { c =>
        if (counts(c) == 0) centroids(c)
        else Array.tabulate(dim)(d => (sums(c)(d) / counts(c)).toFloat)
      }
      iter += 1
    }
    centroids
  }

  /** Index of the nearest centroid by cosine (ties → lowest index). */
  def nearestCentroid(v: Array[Float], centroids: Array[Array[Float]]): Int = {
    var best = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val sim = VectorOps.cosine(v, centroids(c))
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  /** The `nProbe` nearest cells for a query, most-similar first. */
  def probeCells(v: Array[Float], centroids: Array[Array[Float]], nProbe: Int): Array[Int] =
    centroids.indices
      .sortBy(c => (-VectorOps.cosine(v, centroids(c)), c))
      .take(math.min(nProbe, centroids.length))
      .toArray
}
