package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Final SimHash signature: the two 30-bit halves plus the 6 x 10-bit
  * LSH band values (pigeonhole: hamming <= 5 implies a clean band). */
case class SimHashSig(sig_lo: Long, sig_hi: Long, bands: Array[Long])

/** One-pass SimHash signature aggregator over (wordHash60, count) pairs.
  *
  * Replaces the relational formulation that exploded 60 bit-rows per
  * (doc, word) and needed two extra shuffles (bit sums -> signature ->
  * bands): this Aggregator keeps the 60 signed counters as mergeable
  * state, so a document's signature is computed in ONE pass over its
  * word counts, and partial states merge associatively across
  * partitions — the shape that matters when the corpus is 100 TB and a
  * document's words may span input splits.
  *
  * Exposed untyped via `functions.udaf` so DataFrame pipelines (q33) use
  * it directly in `groupBy(...).agg(...)`.
  */
object SimHashAggregator
    extends Aggregator[(Long, Long), Array[Long], SimHashSig] {

  val Bits = 60
  val BandBits = 10
  val NumBands: Int = Bits / BandBits // 6

  override def zero: Array[Long] = Array.fill(Bits)(0L)

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    val (h, cnt) = in
    var b = 0
    while (b < Bits) {
      buf(b) += (if (((h >> b) & 1L) == 1L) cnt else -cnt)
      b += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var b = 0
    while (b < Bits) { b1(b) += b2(b); b += 1 }
    b1
  }

  override def finish(sums: Array[Long]): SimHashSig = {
    var lo = 0L
    var hi = 0L
    val bands = Array.fill(NumBands)(0L)
    var b = 0
    while (b < Bits) {
      if (sums(b) > 0) {
        if (b < 30) lo |= (1L << b) else hi |= (1L << (b - 30))
        bands(b / BandBits) |= (1L << (b % BandBits))
      }
      b += 1
    }
    SimHashSig(lo, hi, bands)
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[SimHashSig] = Encoders.product[SimHashSig]
}
