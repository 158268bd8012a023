package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Benchmark-contamination detection for training corpora: flag corpus
  * documents that share word n-grams with a held-out benchmark set —
  * the standard n-gram-overlap decontamination check run before
  * training on web-scale data.
  *
  * Scale shape: both sides explode to distinct (doc, n-gram) rows and
  * meet in an equi-join on the n-gram key — an inverted-index join,
  * never all-pairs. The benchmark side reduces to its distinct n-gram
  * set first (benchmarks are tiny next to the corpus), so Catalyst/AQE
  * broadcasts it in the common case and the corpus side is never
  * shuffled. Long n-grams (n >= 4) are near-unique, which bounds
  * posting-list skew by construction; `maxBenchDocFreq` additionally
  * drops n-grams present in more than that many benchmark docs —
  * boilerplate that would otherwise flag half the corpus.
  */
object Contamination {

  /** Per-corpus-doc count of distinct word `n`-grams shared with ANY
    * benchmark doc: (doc_id, shared_ngrams), docs with >= `minShared`
    * only. Tokenization is whitespace; n-grams are space-joined and
    * deduplicated per document before counting. */
  def ngramOverlap(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, minShared: Long = 1L,
      maxBenchDocFreq: Long = Long.MaxValue): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    // tokens are materialized in their own projection: inlining the
    // split into the shingle lambda would re-split the full text on
    // every element_at (4 splits per gram — a 10x+ slowdown)
    def grams(df: DataFrame): DataFrame =
      df.select(col(idCol).cast("long").as("doc_id"),
          TF.tokens(col(textCol)).as("toks"))
        .select(col("doc_id"),
          explode(array_distinct(TF.shingles(col("toks"), n))).as("ng"))
    val benchGrams =
      if (maxBenchDocFreq == Long.MaxValue) grams(bench).select("ng").distinct()
      else grams(bench).groupBy("ng").agg(count(lit(1)).as("bdf"))
        .filter(col("bdf") <= maxBenchDocFreq).select("ng")
    // each corpus (doc, ng) row is distinct, so after the inner join
    // count(*) per doc == distinct shared n-grams
    grams(corpus).join(benchGrams, "ng")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
  }
}
