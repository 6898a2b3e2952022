package graft

import org.apache.spark.sql.functions._

import graft.plans.{RewriteDotProduct, VectorDot}

/** The optimizer rule rewrites the interpreted self-dot lambda into the
  * native kernel without changing results. */
class RewriteRuleSpec extends SparkTestBase {

  private val lambdaSelfDot =
    "aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  test("rule fires: self-dot lambda becomes VectorDot in the optimized plan") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteDotProduct
    try {
      val df = graft.sources.Tables.embeddings(spark, sf)
        .select(expr(lambdaSelfDot).as("d"))
      val optimized = df.queryExecution.optimizedPlan
      val fired = optimized.expressions.exists(_.exists(_.isInstanceOf[VectorDot]))
      assert(fired, s"expected VectorDot in:\n$optimized")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteDotProduct)
    }
  }

  test("rewrite preserves values exactly") {
    val base = graft.sources.Tables.embeddings(spark, sf).limit(50)
    val viaLambda = base.select(col("vec_id"), expr(lambdaSelfDot).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteDotProduct
    val viaRule =
      try base.select(col("vec_id"), expr(lambdaSelfDot).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      finally {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations.filterNot(_ == RewriteDotProduct)
      }
    assert(viaRule == viaLambda)
  }

  test("rule does NOT fire for two different arrays (ragged-null semantics)") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteDotProduct
    try {
      val df = spark.sql(
        """SELECT aggregate(zip_with(array(1.0D), array(2.0D, 3.0D),
          |                          (x, y) -> x * y),
          |                 CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d""".stripMargin)
      val optimized = df.queryExecution.optimizedPlan
      assert(!optimized.expressions.exists(_.exists(_.isInstanceOf[VectorDot])))
      // and the lambda's null-padding semantics survive
      assert(df.collect()(0).isNullAt(0))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteDotProduct)
    }
  }
}
