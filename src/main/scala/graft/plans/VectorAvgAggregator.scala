package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * The one custom typed `Aggregator` the reference semantics call for
 * (SURVEY.md §2.11): element-wise vector average for exploded chunk
 * embeddings — `groupBy(url).agg(VectorAvgAggregator.toColumn)` replaces a
 * driver-side loop with a map-side-combinable distributed aggregate
 * (partial buffers merge associatively, so Catalyst plans a partial_avg →
 * final_avg two-phase agg: shuffle carries one buffer per group, not one
 * row per chunk).
 */
object VectorAvgAggregator extends Aggregator[Array[Float], (Array[Double], Long), Array[Float]] {

  def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    // skip empty vectors like nulls: counting one would halve the group's
    // average, and a partition holding ONLY empty vectors would otherwise
    // build a (0-dim, n>0) buffer that crashes the merge dimension check
    if (v == null || v.isEmpty) return b
    val (acc0, n) = b
    val acc = if (acc0.isEmpty) new Array[Double](v.length) else acc0
    require(acc.length == v.length, s"dimension mismatch: ${acc.length} vs ${v.length}")
    var i = 0
    while (i < v.length) { acc(i) += v(i); i += 1 }
    (acc, n + 1)
  }

  def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._2 == 0) return b
    if (b._2 == 0) return a
    require(a._1.length == b._1.length, "dimension mismatch in merge")
    val out = a._1.clone()
    var i = 0
    while (i < out.length) { out(i) += b._1(i); i += 1 }
    (out, a._2 + b._2)
  }

  def finish(r: (Array[Double], Long)): Array[Float] = {
    val (acc, n) = r
    if (n == 0) Array.empty[Float]
    else acc.map(x => (x / n).toFloat)
  }

  def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  def outputEncoder: Encoder[Array[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
