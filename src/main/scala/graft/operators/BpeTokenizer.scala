package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.BpeUtil

/** Deterministic byte-pair-merge vocabulary training — the real-model
  * half of `token_count` (the gate's regex pre-token count approximates
  * a budget; pipeline budgets are subword tokens). A tiny, exact BPE:
  * the merge COUNT is a parameter, the machinery is the published
  * algorithm (Sennrich et al. 2016): start from per-character symbol
  * sequences over the corpus's frequency-weighted vocabulary, and
  * `nMerges` times fuse the globally most frequent adjacent symbol
  * pair (ties broken lexicographically — determinism over dict order).
  *
  * Engine-replayable end to end: pair counting, best-pair selection,
  * and the merge fold are each expressible as plain SQL over the same
  * corpus (the `token_count_bpe` oracle replays all `nMerges`
  * iterations as chained CTEs and scores by joining each word to its
  * trained final state), so the trained artifact stays under the
  * DuckDB hash gate like the quality classifier's weights.
  *
  * At 100 TB: the corpus-wide work is ONE tokenize + word-count scan
  * (map-side combinable, gram domain never shuffles raw text); the
  * merge loop runs driver-side over the `maxVocab` most frequent words
  * (count desc, word asc — deterministic cap), which is how production
  * subword trainers bound their input too (frequency-capped or sampled
  * word lists, not the raw corpus). */
object BpeTokenizer {

  val DefaultMerges = 16

  /** The scale bound on the driver-resident weighted vocabulary. The
    * gate corpus holds 31 distinct words, so the cap never binds there
    * and the uncapped oracle replay matches exactly; a corpus whose
    * vocabulary exceeds the cap trains on the deterministic top slice
    * (documented divergence from the uncapped replay — at that scale
    * the oracle contract is rows-only anyway). */
  val MaxVocab = 65536

  /** Train the merge table: `nMerges` (left, right) pairs in rank
    * order. Stops early only if no adjacent pair remains (every
    * vocabulary word fused to a single symbol). */
  def train(docs: DataFrame, nMerges: Int = DefaultMerges): Seq[(String, String)] = {
    import graft.functions.{TextFunctions => TF}
    val vocab = docs
      .select(explode(TF.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("w"))
      .limit(MaxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(vocab.forall(!_._1.contains('\u001f')),
      "BPE training: corpus words must not contain the U+001F join " +
        "separator (reserved by the oracle's symbol encoding)")
    var words = vocab.map { case (w, c) => (BpeUtil.symbolsOf(w), c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var m = 0
    while (m < nMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (sy, c) =>
        var i = 0
        while (i < sy.length - 1) {
          val k = (sy(i), sy(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) m = nMerges
      else {
        val (l, r) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += ((l, r))
        words = words.map { case (sy, c) => (BpeUtil.applyMerge(sy, l, r), c) }
        m += 1
      }
    }
    merges.toSeq
  }

  /** Train-once-and-persist (the [[QualityClassifier.trainAndPersist]]
    * derived-store contract): the merge table as a parquet artifact
    * (`rank`, `left`, `right`) gated by `_SUCCESS`; callers tag `path`
    * with the corpus fingerprint so a regenerated corpus can never
    * serve stale merges. */
  def trainAndPersist(docs: DataFrame, path: String,
      nMerges: Int = DefaultMerges): Seq[(String, String)] = {
    val spark = docs.sparkSession
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      import spark.implicits._
      val merges = train(docs, nMerges)
      merges.zipWithIndex.map { case ((l, r), i) => (i + 1L, l, r) }
        .toDF("rank", "left", "right")
        .coalesce(1).write.mode("overwrite").parquet(path)
      merges
    } else loadMerges(spark, path)
  }

  /** Load a persisted merge artifact back in rank order. */
  def loadMerges(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(path)
      .select(col("rank").cast("long"), col("left"), col("right"))
      .collect().sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2)))
      .toSeq

  /** Whole-document BPE token count under a trained table (one codegen
    * pass; the table rides the plan to every executor). */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graft.ExprBridge
    ExprBridge.column(org.apache.spark.sql.graft.BpeTokenCount(
      ExprBridge.expression(text), merges))
  }
}
