package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}

/** Trained model-based quality filtering: label-rule parity with the
  * Gopher gate query, integer-exact training determinism, artifact
  * round-trip, and the broadcast-weights kernel's equivalence to its
  * HOF lookup composition. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64 // small dim → guaranteed collisions exercised

  private def docs = Seq(
    // a passing doc: 50+ words, sane lengths, alpha, stopwords
    (1L, Seq.fill(60)("the quick brown fox of and to in").mkString(" ")),
    (2L, "short junk ###"),
    (3L, ""),
    (4L, Seq.tabulate(80)(i => s"word$i the of").mkString(" ")),
    (5L, "1 2 3 4 5 6 7 8 9 10 11 12")
  ).toDF("doc_id", "text")

  test("gopherPasses equals quality_gopher_rules' passes column") {
    import org.apache.spark.sql.graft.{GopherStatsUtil => G}
    // the gate query's inline predicate, rebuilt verbatim
    val st = TF.gopherStats(col("text"))
    def slot(i: Int) = element_at(st, i + 1)
    val n = slot(G.NWords)
    val meanLen = when(n > 0,
      slot(G.SumWlen).cast("double") / n.cast("double")).otherwise(lit(0.0))
    val alphaFrac = when(n > 0,
      slot(G.NAlphaWords).cast("double") / n.cast("double")).otherwise(lit(0.0))
    val gateRule = n.between(50, 100000) && meanLen.between(3.0, 10.0) &&
      alphaFrac > 0.8 && slot(G.NStop) >= 2
    val rows = docs.select(
      QualityClassifier.gopherPasses(col("text")).as("a"), gateRule.as("b"))
      .collect()
    assert(rows.forall(r => r.getBoolean(0) == r.getBoolean(1)),
      "training labels drifted from the quality_gopher_rules predicate")
    assert(rows.exists(_.getBoolean(0)) && rows.exists(!_.getBoolean(0)),
      "fixture must exercise both label classes")
  }

  test("training is deterministic, integer-bounded, and artifact round-trips") {
    val w1 = QualityClassifier.train(docs, dim)
    val w2 = QualityClassifier.train(docs, dim)
    assert(java.util.Arrays.equals(w1, w2), "training must be deterministic")
    assert(w1.forall(w => w >= -1000 && w <= 999),
      s"weights out of the milli range: ${w1.filterNot(w => w >= -1000 && w <= 999).take(3).toSeq}")
    assert(w1.exists(_ != 0L), "no feature learned a weight")
    val path = java.nio.file.Files.createTempDirectory("graft-clf").toString + "/w"
    val persisted = QualityClassifier.trainAndPersist(docs, path, dim)
    assert(java.util.Arrays.equals(persisted, w1))
    // reload path (artifact hit) must hand back the identical table
    assert(java.util.Arrays.equals(
      QualityClassifier.trainAndPersist(docs, path, dim), w1))
    assert(java.util.Arrays.equals(
      QualityClassifier.loadWeights(spark, path, dim), w1))
  }

  test("broadcast-weights kernel equals the HOF lookup composition") {
    val w = QualityClassifier.train(docs, dim)
    val wLit = typedLit(w.toSeq)
    val hof = aggregate(TF.tokens(col("text")), lit(0L), (acc, t) =>
      acc + element_at(wLit,
        (pmod(TF.hash60(t, 131), lit(dim.toLong)) + 1L).cast("int")))
    val rows = docs.select(
      QualityClassifier.scoreMilli(TF.tokens(col("text")), w).as("a"),
      hof.as("b")).collect()
    assert(rows.forall(r => r.getLong(0) == r.getLong(1)),
      rows.map(r => (r.getLong(0), r.getLong(1))).mkString(", "))
  }

  test("trained weights separate the training labels on a separable corpus") {
    val w = QualityClassifier.train(docs, dim)
    val sep = docs
      .withColumn("toks", TF.tokens(col("text")))
      .filter(size(col("toks")) > 0)
      .select(QualityClassifier.gopherPasses(col("text")).as("label"),
        (QualityClassifier.scoreMilli(col("toks"), w) /
          size(col("toks"))).as("m"))
      .groupBy("label").agg(avg("m").as("m"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1))).toMap
    assert(sep(true) > sep(false),
      s"pass-mean ${sep(true)} must exceed fail-mean ${sep(false)}")
  }
}
