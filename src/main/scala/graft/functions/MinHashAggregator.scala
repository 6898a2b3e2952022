package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed, MERGEABLE MinHash sketch aggregator (SURVEY.md §2.11/§4.3):
  * Aggregator[shingleHash, signature, signature] producing the same
  * 16-permutation signature as the q32 pipeline, but as first-class
  * aggregation state.
  *
  * Why it matters at 100 TB: signatures built this way are associative
  * and commutative (element-wise min), so partial sketches merge across
  * partitions, days, or clusters — you can sketch each ingest batch
  * independently, store the per-doc signatures, and union-merge later
  * without re-reading text. The groupBy-min formulation in q32 is the
  * plan Catalyst generates for the same math; this is the reusable
  * library form (`minHashAgg.toColumn` over a
  * KeyValueGroupedDataset).
  *
  * Input is the 60-bit shingle hash ([[Hashing.md5Hash60]]); permutation
  * constants match [[Hashing.minHashPerm]] exactly.
  */
object MinHashAggregator extends Aggregator[Long, Array[Long], Array[Long]] {

  val NumPerms = 16
  private val P = Hashing.MinHashP

  override def zero: Array[Long] = Array.fill(NumPerms)(Long.MaxValue)

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var j = 0
    while (j < NumPerms) {
      val a = (2654435761L * (j + 1)) % P
      val b = (123456789L * (j + 1) + 987654321L) % P
      val h = (a * (x % P) + b) % P
      if (h < buf(j)) buf(j) = h
      j += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < NumPerms) {
      if (b2(j) < b1(j)) b1(j) = b2(j)
      j += 1
    }
    b1
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Estimated Jaccard similarity from two signatures: fraction of
    * agreeing permutation minima. */
  def estimateJaccard(s1: Array[Long], s2: Array[Long]): Double = {
    var agree = 0
    var j = 0
    while (j < NumPerms) {
      if (s1(j) == s2(j)) agree += 1
      j += 1
    }
    agree.toDouble / NumPerms
  }
}
