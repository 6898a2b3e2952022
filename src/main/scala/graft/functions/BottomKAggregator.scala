package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed, MERGEABLE KMV ("k minimum values" / bottom-k) distinct
  * sketch aggregator (§2.11 UDAF surface, the q100/q153 sketch-algebra
  * family): state is the k smallest DISTINCT 60-bit hashes seen, kept
  * sorted ascending. Unlike HLL the sketch contents are fully
  * deterministic — the same input set always yields the same k hashes
  * — so the estimate is oracle-EXACT, not a tolerance contract, and
  * the sketch doubles as a uniform sample of the key space.
  *
  * Mergeability (the 100 TB point): the k smallest distinct hashes of
  * a union are always contained in the union of the per-part bottom-k
  * sets, so per-batch/per-partition sketches union-merge losslessly —
  * partial aggregation map-side, cross-day rollups without re-reading
  * data. Estimator: with a full sketch, distinct ≈ (k−1)·2^60 / h_k
  * (the classic KMV estimator over the hash space [0, 2^60)); with
  * fewer than k distinct hashes the sketch IS the exact distinct set.
  * Duplicates dedup inside the capped buffer (set semantics), so the
  * input needs no pre-distinct shuffle. */
class BottomKAggregator(val k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, x)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = x
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) {
        // insert and drop the current largest
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = x
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    // merge two sorted distinct arrays, dedup, cap at k
    val out = new Array[Long](math.min(k, b1.length + b2.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < b1.length || j < b2.length)) {
      val take =
        if (i >= b1.length) { val v = b2(j); j += 1; v }
        else if (j >= b2.length) { val v = b1(i); i += 1; v }
        else if (b1(i) < b2(j)) { val v = b1(i); i += 1; v }
        else if (b2(j) < b1(i)) { val v = b2(j); j += 1; v }
        else { val v = b1(i); i += 1; j += 1; v }
      if (n == 0 || out(n - 1) != take) { out(n) = take; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
