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
  * each chunk (last element = byte length). Per chunk, scanning starts
  * at the previous boundary with h = 0 (FastCDC semantics): a boundary
  * is declared at the first position >= [[GearCdc.MinLen]] bytes into
  * the chunk where `(h & (AvgLen - 1)) == 0`, or force-cut at
  * [[GearCdc.MaxLen]]. Boundaries therefore depend only on the bytes
  * since the previous boundary — the self-synchronizing property that
  * re-aligns chunking downstream of an insertion.
  *
  * The gear table is a fixed deterministic constant (seed-42 LCG), NOT
  * SQL-portable — so the registered q125 query carries a q37-style
  * contract oracle instead of a value oracle, and the value-level law
  * (kernel == independent Scala reference, insertion re-alignment) is
  * spec-checked. Byte-oriented like every production CDC; on the ASCII
  * corpus byte and char positions coincide, which is what lets the
  * q125 pipeline substring with these offsets. */
object GearCdc {
  val MinLen = 8
  val AvgLen = 32 // must be a power of two: boundary mask = AvgLen - 1
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
      if ((len >= MinLen && (h & (AvgLen - 1)) == 0L) || len >= MaxLen) {
        out += p
        last = p
        h = 0L
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
