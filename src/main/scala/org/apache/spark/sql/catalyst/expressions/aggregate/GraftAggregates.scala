package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-local accessor: [[CollectTopK]] — Spark's bounded-heap per-group
  * top-k aggregate (k rows retained per group through partial aggregation,
  * no full sort) — is `private[aggregate]`, so the graft function registry
  * reaches it through this shim. No behavior is added here.
  */
object GraftCollectTopK {
  def apply(child: Expression, num: Int, reverse: Boolean): AggregateFunction =
    CollectTopK(child, num, reverse)
}
