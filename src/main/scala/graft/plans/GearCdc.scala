package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gear rolling-hash content-defined chunking (the FastCDC family) —
  * the production boundary kernel docs/SCALE.md promises for q124,
  * whose oracle-portable md5 variant pays an O(W) window hash at EVERY
  * byte position. This kernel is O(1) per position: one table lookup,
  * one shift, one add.
  *
  * `graft_gear_ends(text)` returns the 1-based BYTE end positions of
  * each chunk (last element = byte length). The gear hash rolls
  * CONTINUOUSLY over the document (never reset at a cut): with
  * `h = (h << 1) + gear(b)` the value at any position is a pure
  * function of the trailing <= 64 bytes, so the boundary predicate —
  * TOP [[GearCdc.MaskBits]] bits of h all zero — is content-LOCAL,
  * which is exactly what makes chunking self-synchronize downstream of
  * an insertion. (Resetting h at each cut, as FastCDC describes, makes
  * every predicate depend on the chunk's start position; with chunks
  * shorter than the 64-byte gear window that dependence never decays
  * and an edit never re-aligns — measured 0/13 re-aligned chunks in
  * the spec before this was dropped.) The HIGH-bit mask also matters:
  * low bit k of h is a function of only the trailing k+1 bytes
  * (carries propagate upward only), so a low-bit mask would cut on ~5
  * trailing bytes and degenerate on short-period repetitive text; the
  * top bits mix the full 64-byte window. A cut is declared when the
  * predicate fires at least [[GearCdc.MinLen]] bytes after the
  * previous cut, with a force-cut at [[GearCdc.MaxLen]].
  *
  * The gear table is a fixed deterministic constant (seed-42 LCG), NOT
  * SQL-portable — so the registered q125 query carries a q37-style
  * contract oracle instead of a value oracle, and the value-level law
  * (kernel == independent Scala reference, insertion re-alignment) is
  * spec-checked. Byte-oriented like every production CDC — consumers
  * must slice with byte semantics (`encode(text, 'UTF-8')` +
  * binary substring), never char-based `substring(text, ...)`. */
object GearCdc {
  val MinLen = 8
  val MaskBits = 5 // boundary when top 5 bits of h are zero: ~1/32 rate
  val AvgLen = MinLen + (1 << MaskBits) // expected chunk length
  val MaxLen = 128

  /** Deterministic gear table: 256 odd-ish 64-bit constants from a
    * fixed-seed LCG (Knuth MMIX multiplier). */
  val gear: Array[Long] = {
    var x = 42L
    Array.fill(256) {
      x = x * 6364136223846793005L + 1442695040888963407L
      x
    }
  }

  /** Chunk end positions (1-based, ascending, last = bytes.length);
    * empty input yields an empty array. Public and static-forwarded so
    * generated code and the Scala reference spec share ONE body. */
  def ends(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[Int](n / AvgLen + 2)
    var last = 0
    var h = 0L
    var p = 0
    while (p < n) {
      h = (h << 1) + gear(bytes(p) & 0xff)
      p += 1
      val len = p - last
      if ((len >= MinLen && (h >>> (64 - MaskBits)) == 0L) || len >= MaxLen) {
        out += p
        last = p
      }
    }
    if (last < n) out += n
    new GenericArrayData(out.toArray)
  }
}

case class GearChunkEnds(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gear_ends requires STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_gear_ends"

  override def nullSafeEval(s: Any): Any =
    GearCdc.ends(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call per row into the JIT-compiled kernel — no boxing,
    // no per-element virtual dispatch, stays inside WholeStageCodegen
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.GearCdc.ends($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
