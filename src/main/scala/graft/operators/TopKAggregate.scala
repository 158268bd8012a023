package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ExprBridge, TopKIdsAgg, TopKPairsAgg}

object TopKAggregate {
  /** Column-level API: `df.groupBy("qid").agg(topkIds(100, $"dist", $"id"))`. */
  def topkIds(k: Int, dist: Column, id: Column): Column =
    ExprBridge.column(
      TopKIdsAgg(ExprBridge.expression(dist), ExprBridge.expression(id), k)
        .toAggregateExpression())

  /** Dist-carrying top-k: array of `struct<dist, id>` — the partial
    * form for two-level merges (each scope reduces to k pairs, an
    * outer [[topkIds]] over the exploded pairs merges scopes exactly). */
  def topkPairs(k: Int, dist: Column, id: Column): Column =
    ExprBridge.column(
      TopKPairsAgg(ExprBridge.expression(dist), ExprBridge.expression(id), k)
        .toAggregateExpression())
}
