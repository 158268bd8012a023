package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ExprBridge, TopKIdsAgg, TopKPairsAgg, TopTermsAgg}

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

  /** tf-idf ranking top-k: array of the k best `struct<tf, df, token>`
    * under `(tf desc, df asc, token asc)`, best-first — the bounded
    * aggregate form of a `row_number()` rank filter over that order
    * (rank = array position + 1). */
  def topTerms(k: Int, tf: Column, df: Column, token: Column): Column =
    ExprBridge.column(
      TopTermsAgg(ExprBridge.expression(tf), ExprBridge.expression(df),
        ExprBridge.expression(token), k).toAggregateExpression())
}
