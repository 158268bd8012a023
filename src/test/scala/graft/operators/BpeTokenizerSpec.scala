package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BpeUtil

class BpeTokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("applyMerge: the left-to-right fold's exact overlap rule") {
    def sym(s: String) = BpeUtil.symbolsOf(s)
    // "aaaa" under (a,a): pairs fuse left-to-right, a fused symbol does
    // not re-fuse as the RIGHT operand in the same pass
    assert(BpeUtil.applyMerge(sym("aaaa"), "a", "a").toSeq == Seq("aa", "aa"))
    assert(BpeUtil.applyMerge(sym("aaa"), "a", "a").toSeq == Seq("aa", "a"))
    // a fused symbol CAN immediately fuse again as the LEFT operand
    assert(BpeUtil.applyMerge(Array("a", "aa"), "a", "aa").toSeq == Seq("aaa"))
    // last-symbol equality is exact, not a suffix match ("xl" != "l")
    assert(BpeUtil.applyMerge(Array("xl", "r"), "l", "r").toSeq == Seq("xl", "r"))
    assert(BpeUtil.countWord("abab", Array("a", "ab"), Array("b", "ab")) == 1)
  }

  test("train is deterministic, persists, and the count expression stays codegen") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran to the hat"),
      (3L, "that cat and this cat sat")).toDF("doc_id", "text")
    val m1 = BpeTokenizer.train(docs, nMerges = 8)
    val m2 = BpeTokenizer.train(docs, nMerges = 8)
    assert(m1 == m2, "training must be deterministic run-over-run")
    assert(m1.length == 8)
    // artifact round-trip (train-once contract)
    val path = Files.createTempDirectory("graft-bpe").toString + "/merges"
    assert(BpeTokenizer.trainAndPersist(docs, path, 8) == m1)
    assert(BpeTokenizer.loadMerges(spark, path) == m1)
    assert(BpeTokenizer.trainAndPersist(docs, path, 8) == m1) // load path
    // scoring: same counts as applying the merges word by word
    val counted = docs
      .select(col("doc_id"), BpeTokenizer.tokenCount(col("text"), m1).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = docs.collect().map { r =>
      val l = m1.map(_._1).toArray
      val rr = m1.map(_._2).toArray
      (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)
        .map(w => BpeUtil.countWord(w, l, rr).toLong).sum)
    }.toMap
    assert(counted == expected)
    // merges shrink the count below the character count and never below
    // the word count
    val chars = docs.collect().map(r =>
      r.getString(1).count(_ != ' ').toLong).sum
    val words = docs.collect().map(r =>
      r.getString(1).split(" ").count(_.nonEmpty).toLong).sum
    assert(counted.values.sum < chars && counted.values.sum >= words)
    // the verdict's "one codegen pass" requirement: over a real file
    // scan (a local relation constant-folds to LocalTableScan) the
    // scoring projection plans inside WholeStageCodegen — no
    // interpreted-HOF fallback
    val pq = Files.createTempDirectory("graft-bpe").toString + "/docs"
    docs.write.parquet(pq)
    val plan = spark.read.parquet(pq)
      .select(BpeTokenizer.tokenCount(col("text"), m1).as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("bpe_token_count"),
      s"bpe_token_count must plan inside a WholeStageCodegen stage " +
        s"(the *(n) marker):\n$plan")
  }
}
