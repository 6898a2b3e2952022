package org.apache.spark.sql.execution.datasources

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.sources.Filter

/** Test-only shim: `DataSourceStrategy.translateFilter` is
  * `protected[sql]`, and the plan-contract spec needs exactly the
  * translator the planner uses (re-implementing it would let the two
  * drift). Lives in the spark package for access; exposes nothing
  * else. */
object GraftFilterTranslator {
  def translate(e: Expression): Option[Filter] =
    DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = true)
}
