package graft.ops

/**
 * E5/E6 — vector kernels re-expressing
 * `/root/reference/src/embeddings/aggregation.ts:10-215`: aggregation
 * strategies (average / max-pool / first), L2 normalization, cosine /
 * euclidean / dot similarity. Plus the brute-force and LSH-bucketed
 * neighbor-search helpers used by the ANN queries.
 *
 * Float inputs, double accumulation (matches JS number math on re-read).
 */
object VectorOps {

  def dot(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length, s"dimension mismatch: ${a.length} vs ${b.length}")
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
    s
  }

  def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val na = norm(a); val nb = norm(b)
    if (na == 0 || nb == 0) 0.0 else dot(a, b) / (na * nb)
  }

  def euclidean(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length)
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  def normalize(a: Array[Float]): Array[Float] = {
    val n = norm(a)
    if (n == 0) a.clone() else a.map(x => (x / n).toFloat)
  }

  /** aggregation.ts strategies: average | max | first. */
  def aggregate(vectors: Seq[Array[Float]], strategy: String): Array[Float] = {
    require(vectors.nonEmpty, "no vectors to aggregate")
    val dim = vectors.head.length
    vectors.foreach(v => require(v.length == dim, "dimension mismatch"))
    strategy match {
      case "first" => vectors.head.clone()
      case "max" =>
        val out = Array.fill(dim)(Float.MinValue)
        vectors.foreach { v =>
          var i = 0
          while (i < dim) { if (v(i) > out(i)) out(i) = v(i); i += 1 }
        }
        out
      case _ => // average
        val acc = new Array[Double](dim)
        vectors.foreach { v =>
          var i = 0
          while (i < dim) { acc(i) += v(i); i += 1 }
        }
        acc.map(x => (x / vectors.size).toFloat)
    }
  }

  /** Random-hyperplane LSH bucket for cosine: sign bits of `nBits` fixed
    * pseudo-random hyperplanes (deterministic seeds). The scale path for ANN:
    * same-bucket candidates only, then exact re-rank within the bucket.
    * `table` selects an independent hyperplane family — multi-table LSH is
    * the standard recall lever (candidate iff same bucket in ANY table:
    * recall 1-(1-p^nBits)^nTables for per-bit agreement p = 1 - θ/π). */
  /** Signed projection of `v` onto hyperplane `bit` of `table` — exposed so
    * multi-probe LSH (Ann) can rank bits by flip confidence. */
  def hyperplaneProjection(v: Array[Float], bit: Int, table: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < v.length) {
      // deterministic pseudo-random hyperplane component in [-1,1)
      val h = TextOps.mix64(((table.toLong * 1024 + bit).toLong << 32) ^ i ^ 0x5deece66dL)
      s += v(i) * ((h >>> 11).toDouble * 1.1102230246251565e-16 * 2 - 1)
      i += 1
    }
    s
  }

  def cosineLshBucket(v: Array[Float], nBits: Int = 12, table: Int = 0): Int = {
    var bucket = 0
    var b = 0
    while (b < nBits) {
      if (hyperplaneProjection(v, b, table) >= 0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }
}
