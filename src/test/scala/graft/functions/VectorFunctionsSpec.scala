package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private def randVec(n: Int): Array[Float] = Array.fill(n)(rnd.nextFloat() * 2 - 1)

  private def refL2(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum

  private def refDot(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum

  test("l2Sq / dot / cosine match scalar reference on random vectors") {
    val pairs = Seq.fill(50)((randVec(64), randVec(64)))
    val df = pairs.toDF("a", "b")
      .select(
        VectorFunctions.l2Sq($"a", $"b").as("l2"),
        VectorFunctions.dot($"a", $"b").as("dp"),
        VectorFunctions.cosineSim($"a", $"b").as("cs"),
        VectorFunctions.norm2($"a").as("na"))
    val rows = df.collect()
    pairs.zip(rows).foreach { case ((a, b), r) =>
      assert(math.abs(r.getDouble(0) - refL2(a, b)) < 1e-9)
      assert(math.abs(r.getDouble(1) - refDot(a, b)) < 1e-9)
      val cos = refDot(a, b) / (math.sqrt(refDot(a, a)) * math.sqrt(refDot(b, b)))
      assert(math.abs(r.getDouble(2) - cos) < 1e-9)
      assert(math.abs(r.getDouble(3) - math.sqrt(refDot(a, a))) < 1e-9)
    }
  }

  test("zero vector cosine is 0, empty arrays give 0 distance") {
    val df = Seq((Array.fill(4)(0f), randVec(4)), (Array.empty[Float], Array.empty[Float]))
      .toDF("a", "b")
      .select(VectorFunctions.cosineSim($"a", $"b").as("cs"),
        VectorFunctions.l2Sq($"a", $"b").as("l2"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 0.0)
    assert(rows(1).getDouble(1) == 0.0)
  }

  test("SQL registration works") {
    VectorFunctions.register(spark)
    val r = spark.sql("SELECT l2_sq(array(1.0F, 2.0F), array(1.0F, 4.0F)) d").head.getDouble(0)
    assert(r == 4.0)
  }

  test("pqAdcTable/pqAdcSum are bit-identical to the composed expression forms") {
    // The native kernels replaced an array() of m·ksub l2Sq-over-slice
    // subexpressions (which blows the 64 KB codegen limit at ksub=256)
    // and an element_at sum chain. Oracle hashes depend on EXACT double
    // equality with those forms, so assert ==, not tolerance.
    val m = 4; val ksub = 8; val dim = 64; val sub = dim / m
    val cents = Array.fill(ksub)(randVec(dim))
    val centsFlat = cents.flatten
    val df = Seq.fill(20)(randVec(dim)).toDF("qvec")
      .select(
        $"qvec",
        VectorFunctions.pqAdcTable($"qvec", typedLit(centsFlat), lit(m)).as("t"),
        array((for (j <- 0 until m; c <- 0 until ksub) yield
          VectorFunctions.l2Sq(slice($"qvec", j * sub + 1, sub),
            typedLit(cents(c).slice(j * sub, (j + 1) * sub))).cast("double")): _*)
          .as("t_composed"))
      .withColumn("codes", typedLit(Array(3, 0, 7, 5)))
      .withColumn("s", VectorFunctions.pqAdcSum($"codes", $"t", lit(ksub)))
      .withColumn("s_composed", (0 until m).map(j =>
        element_at($"t", (element_at($"codes", j + 1) + lit(j * ksub) + 1).cast("int")))
        .reduce(_ + _))
    df.collect().foreach { r =>
      assert(r.getSeq[Double](1) == r.getSeq[Double](2))
      assert(r.getDouble(4) == r.getDouble(5))
    }
  }

  test("null inputs propagate null") {
    val df = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]])).toDF("a", "b")
      .select(VectorFunctions.l2Sq($"a", $"b").as("d"))
    assert(df.head.isNullAt(0))
  }
}
