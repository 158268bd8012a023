package graft.operators

import graft.SparkSpec

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    (100L, "alpha beta gamma delta epsilon"),
    (101L, "one two three four five six")
  ).toDF("id", "text")

  test("ngramOverlap counts distinct shared n-grams per corpus doc") {
    val corpus = Seq(
      (1L, "x alpha beta gamma delta y"),        // 1 shared 4-gram
      (2L, "one two three four five seven"),      // 2 shared 4-grams
      (3L, "nothing in common here at all"),
      (4L, "alpha beta gamma delta epsilon tail") // 2 shared 4-grams
    ).toDF("id", "text")
    val got = Contamination.ngramOverlap(corpus, bench, "id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 4L -> 2L))
  }

  test("per-doc duplicate n-grams count once; minShared filters") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta alpha beta gamma delta"), // dup 4-gram
      (2L, "one two three four x")
    ).toDF("id", "text")
    val got = Contamination.ngramOverlap(corpus, bench, "id", "text",
        n = 4, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc 1 shares {a b g d, b g d a?..} — only "alpha beta gamma delta"
    // exists in bench, deduped to 1 → filtered out; doc 2 has 1 → out
    assert(got.isEmpty)
  }

  test("maxBenchDocFreq drops boilerplate n-grams") {
    val boilBench = Seq(
      (100L, "same old header line one"),
      (101L, "same old header line two"),
      (102L, "unique benchmark phrase here")
    ).toDF("id", "text")
    val corpus = Seq(
      (1L, "same old header line three"),
      (2L, "unique benchmark phrase here too")
    ).toDF("id", "text")
    val capped = Contamination.ngramOverlap(corpus, boilBench, "id", "text",
        n = 4, maxBenchDocFreq = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // "same old header line" appears in 2 bench docs → dropped by the cap
    assert(capped == Map(2L -> 1L))
    val uncapped = Contamination.ngramOverlap(corpus, boilBench, "id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(uncapped == Map(1L -> 1L, 2L -> 1L))
  }
}
