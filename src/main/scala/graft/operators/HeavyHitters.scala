package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ExprBridge, MgCandidatesAgg}

import graft.functions.{TextFunctions => TF}

/** Exact heavy hitters via a one-pass bounded-memory sketch.
  *
  * The scale problem: "which n-grams dominate the corpus" as a plain
  * `groupBy(gram).count()` shuffles the ENTIRE gram domain — at 100 TB
  * that is billions of distinct keys exchanged to answer a question
  * about a few hundred of them. The sketch route bounds the exchange by
  * `capacity`, not the domain:
  *
  *  1. one scan aggregating a Misra–Gries summary (map-side partial:
  *     each partition ships ≤ capacity counters) together with the
  *     exact gram total N — a single capacity-bounded reduction;
  *  2. exact recount of the ≤ capacity candidates via a broadcast
  *     semi-join (second scan, still no gram-domain shuffle);
  *  3. keep candidates with exact count > N/(capacity+1).
  *
  * The MG guarantee (undercount ≤ N/(capacity+1), preserved by the
  * mergeable-summaries merge) makes step 3 EXACT, not approximate:
  * every item above the threshold is provably in the candidate set, and
  * the recount discards sketch survivors below it. The output is
  * therefore deterministic — independent of partitioning and merge
  * order — and equal to the SQL `GROUP BY ... HAVING cnt*(capacity+1) > N`.
  */
object HeavyHitters {

  /** Column-level API: `df.agg(mgCandidates(256, $"item"))`. */
  def mgCandidates(capacity: Int, item: Column): Column =
    ExprBridge.column(
      MgCandidatesAgg(ExprBridge.expression(item), capacity)
        .toAggregateExpression())

  /** Exact heavy-hitter word n-grams of a document corpus:
    * (gram, cnt) for every n-gram with cnt·(capacity+1) > N.
    * `grams` is scanned twice (sketch, recount) and recomputed each
    * time — a stateless projection that trades a second scan for never
    * materializing or shuffling the gram domain. */
  def heavyNgrams(docs: DataFrame, textCol: String, n: Int,
      capacity: Int): DataFrame = {
    val grams = docs
      .select(explode(TF.shingles(TF.tokens(col(textCol)), n)).as("gram"))
    val sketch = grams
      .agg(count(lit(1L)).as("total"), mgCandidates(capacity, col("gram")).as("cands"))
      .collect()(0)
    val total = sketch.getLong(0)
    val cands = sketch.getSeq[String](1)
    val candDf = broadcast(
      docs.sparkSession.createDataFrame(
        java.util.Arrays.asList(cands.map(org.apache.spark.sql.Row(_)): _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("gram",
            org.apache.spark.sql.types.StringType, nullable = false)))))
    grams.join(candDf, "gram")
      .groupBy("gram")
      .agg(count(lit(1L)).as("cnt"))
      .filter(col("cnt") * (capacity + 1) > total)
  }
}
