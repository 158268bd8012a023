package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LshCosineSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(31)

  // clustered corpus with genuine near-dups: 60 anchors, each with 2
  // noisy copies (cos >= ~0.99) plus 80 unrelated random vectors
  private lazy val data = {
    val anchors = Array.fill(60)(Array.fill(24)(rnd.nextFloat() * 2 - 1))
    val rows = anchors.zipWithIndex.flatMap { case (a, i) =>
      val copies = Array.tabulate(2) { c =>
        a.map(x => x + rnd.nextFloat().toFloat * 0.02f)
      }
      (a +: copies).zipWithIndex.map { case (v, j) => (i.toLong * 10 + j, v) }
    } ++ Array.fill(80)(
      (1000L + rnd.nextInt(100000), Array.fill(24)(rnd.nextFloat() * 2 - 1)))
    rows.toSeq.toDF("id", "vec").dropDuplicates("id")
  }

  test("lshCosineCandidates: every output pair passes the exact threshold") {
    val got = SimilaritySearch.lshCosineCandidates(data, "id", "vec", minCosine = 0.9)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.9)
    }
  }

  test("lshCosineCandidates: pair recall >= 0.9 vs the exact all-pairs path") {
    val exact = Dedup.cosineNearDupPairs(data, "id", "vec", minCosine = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilaritySearch.lshCosineCandidates(data, "id", "vec", minCosine = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"pair recall $recall (${lsh.size} lsh vs ${exact.size} exact)")
    // and no false positives relative to the exact set (cos verified)
    assert(lsh.subsetOf(exact))
  }

  test("cosineNearDupPairs switches to the banded path only when opted in") {
    val lshDirect = SimilaritySearch.lshCosineCandidates(data, "id", "vec", minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val switched = Dedup.cosineNearDupPairs(data, "id", "vec", minCosine = 0.9,
        lshAbove = 10, allowApprox = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(switched == lshDirect)
    // without the opt-in the same call stays exact regardless of size
    val exactAnyway = Dedup.cosineNearDupPairs(data, "id", "vec", minCosine = 0.9,
        lshAbove = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = Dedup.cosineNearDupPairs(data, "id", "vec", minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exactAnyway == exact)
  }

  test("native srp_bits expression == JVM srpBits reference, both codegen and eval") {
    val planes = SimilaritySearch.hashPlanes(16, 24)
    val vecs = Array.fill(200)(Array.fill(24)(rnd.nextFloat() * 2 - 1)) ++
      Array(Array.fill(24)(0f), Array.fill(24)(1e-30f), Array.fill(24)(-1f))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq.toDF("id", "vec")
    val expected = vecs.zipWithIndex
      .map { case (v, i) => i.toLong -> SimilaritySearch.srpBits(planes, v) }.toMap
    // codegen path (expression inside a projection)
    val got = df.select(col("id"),
        graft.functions.VectorFunctions.srpBits(col("vec"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // SQL-registered form and interpreted eval agree too
    graft.functions.VectorFunctions.register(spark)
    df.createOrReplaceTempView("srp_in")
    val viaSql = spark.sql("SELECT id, srp_bits(vec, 16) AS sig FROM srp_in")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == expected)
  }

  test("hash planes are deterministic and in [-1, 1)") {
    val p1 = SimilaritySearch.hashPlanes(4, 8)
    val p2 = SimilaritySearch.hashPlanes(4, 8)
    assert(p1.map(_.toSeq).toSeq == p2.map(_.toSeq).toSeq)
    assert(p1.flatten.forall(x => x >= -1.0 && x < 1.0))
    // spot value pinned to the md5 formula (mirrors the DuckDB oracle)
    val h = java.lang.Long.parseLong(
      graft.functions.TextFunctions.md5Hex("plane_0_0").substring(0, 15), 16)
    assert(p1(0)(0) == h.toDouble / 576460752303423488.0 - 1.0)
  }
}
