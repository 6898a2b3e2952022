package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Codegen point-frequency probe over a serialized
  * `org.apache.spark.util.sketch.CountMinSketch` (VERDICT r09 #9):
  * `graft_cms_estimate(sketchBytes, key)` — the CMS twin of
  * `graft_bloom_contains`. The sketch rides the plan as a BINARY
  * LITERAL (KBs — the whole point of a sketch), is deserialized ONCE
  * per task via a transient lazy + codegen reference object, and the
  * per-row probe is a single virtual call inside WholeStageCodegen —
  * no boxed Scala-UDF closure, no per-row deserialization. Null keys
  * propagate null (a null can't live in the sketch; callers fold the
  * null group explicitly). */
case class CmsEstimateCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && left.foldable &&
        right.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (foldable BINARY sketch, STRING key), got " +
        s"(${left.dataType}, ${right.dataType})")

  /** The serialized sketch must be available at plan time (a literal or
    * foldable expression) — the same contract as Spark's own
    * bloom-probe expression. */
  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(
      left.eval().asInstanceOf[Array[Byte]]))

  override def nullSafeEval(bytesIgnored: Any, key: Any): Any =
    sketch.estimateCount(key.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsSketch", sketch,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, (_, key) =>
      s"${ev.value} = $ref.estimateCount($key.toString());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
