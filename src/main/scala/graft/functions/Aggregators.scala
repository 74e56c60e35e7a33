package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed custom aggregators (SURVEY.md §2.11 UDAF surface).
 *
 * TopKMean: mean of the k largest values in a group — the reference's
 * patch-SSIM top-k aggregation (top-4 patch mean,
 * /root/reference/duplicate_detector/core/similarity_engine.py:763-771)
 * as a reusable `Aggregator[Double, _, Double]`. The buffer is a fixed
 * k-slot min-heap-ish array, so partial aggregation (map-side combine)
 * stays O(k) per row and merge is O(k²) — shuffle payload bounded by k.
 */
case class TopKMean(k: Int) extends Aggregator[Double, Array[Double], Double] {
  override def zero: Array[Double] = Array.empty

  override def reduce(buf: Array[Double], v: Double): Array[Double] = insert(buf, v)

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    b.foldLeft(a)(insert)

  private def insert(buf: Array[Double], v: Double): Array[Double] = {
    if (buf.length < k) {
      val out = java.util.Arrays.copyOf(buf, buf.length + 1)
      out(buf.length) = v
      java.util.Arrays.sort(out) // ascending; out(0) is the eviction slot
      out
    } else if (v > buf(0)) {
      buf(0) = v
      java.util.Arrays.sort(buf)
      buf
    } else buf
  }

  override def finish(buf: Array[Double]): Double =
    if (buf.isEmpty) 0.0 else buf.sum / buf.length

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
