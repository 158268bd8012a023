package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pins the native [[org.apache.spark.sql.graft.WordShingles]] kernel
  * to the HOF composition it replaced (round-14 optimization): same
  * values for every n, including the guard cases (short arrays, empty
  * arrays, null arrays, null elements) — the queries it feeds
  * (`heavy_ngrams`, `contamination_check`) are hash-gated, so the swap
  * must be value-invisible. */
class ShingleKernelSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-14 expression form, kept verbatim as the reference. */
  private def hofShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)), i =>
        concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*)))
      .otherwise(array().cast("array<string>"))

  private val rnd = new scala.util.Random(91)
  private val words = Seq("alpha", "b", "gamma", "dd", "e", "zeta")
  private def randToks(): Seq[String] =
    Seq.fill(rnd.nextInt(9))(words(rnd.nextInt(words.length)))

  test("WordShingles equals the HOF composition for n in 1..4") {
    val data = Seq.fill(150)(randToks()) ++
      Seq(Seq.empty[String], Seq("one"), Seq("one", "two"), Seq("a", "b", "c"))
    val df = data.toDF("toks")
    (1 to 4).foreach { n =>
      val rows = df.select(
        TextFunctions.shingles(col("toks"), n).as("native"),
        hofShingles(col("toks"), n).as("hof")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n row=$r")
      }
    }
  }

  test("WordShingles null handling matches the HOF guard") {
    // null array -> empty (the otherwise branch); null ELEMENTS are
    // skipped by concat_ws (a single null joins to "")
    val df = Seq(
      (1L, null.asInstanceOf[Seq[String]]),
      (2L, Seq("a", null, "c")),
      (3L, Seq(null.asInstanceOf[String]))
    ).toDF("id", "toks")
    (1 to 3).foreach { n =>
      val rows = df.select(col("id"),
        TextFunctions.shingles(col("toks"), n).as("native"),
        hofShingles(col("toks"), n).as("hof")).collect()
      rows.foreach { r =>
        val hof = if (r.isNullAt(2)) Seq.empty[String] else r.getSeq[String](2)
        assert(r.getSeq[String](1) == hof, s"n=$n id=${r.getLong(0)}")
      }
    }
  }

  test("WordShingles evaluates in both codegen and interpreted modes") {
    val df = Seq(Seq("x", "y", "z")).toDF("toks")
    // codegen path: filter + select both run through whole-stage codegen
    val viaFilter = df.filter(size(TextFunctions.shingles(col("toks"), 2)) === 2).count()
    assert(viaFilter == 1L)
    val got = df.select(TextFunctions.shingles(col("toks"), 2)).collect()(0).getSeq[String](0)
    assert(got == Seq("x y", "y z"))
    // INTERPRETED path (r14 advisory: the queries above never leave
    // whole-stage codegen, so eval() was untested): call eval directly
    // on literal rows — the path hit on codegen fallback and constant
    // folding. Covers the null-array and short-array eval branches too.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def lit3(xs: Seq[String]) = Literal(
      if (xs == null) null
      else new GenericArrayData(xs.map(x =>
        if (x == null) null else UTF8String.fromString(x)).toArray[Any]),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
    def evalShingles(xs: Seq[String], n: Int): Seq[String] =
      org.apache.spark.sql.graft.WordShingles(lit3(xs), n)
        .eval(InternalRow.empty).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(s => if (s == null) null else s.toString).toSeq
    assert(evalShingles(Seq("x", "y", "z"), 2) == Seq("x y", "y z"))
    assert(evalShingles(Seq("x"), 2) == Seq.empty)
    assert(evalShingles(null, 1) == Seq.empty)
    assert(evalShingles(Seq("a", null, "c"), 3) == Seq("a c"))
  }
}
