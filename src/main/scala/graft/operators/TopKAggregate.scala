package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ExprBridge, TopKIdsAgg}

object TopKAggregate {
  /** Column-level API: `df.groupBy("qid").agg(topkIds(100, $"dist", $"id"))`. */
  def topkIds(k: Int, dist: Column, id: Column): Column =
    ExprBridge.column(
      TopKIdsAgg(ExprBridge.expression(dist), ExprBridge.expression(id), k)
        .toAggregateExpression())
}
