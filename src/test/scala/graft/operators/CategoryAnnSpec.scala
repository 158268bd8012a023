package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CategoryAnnSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(41)
  private def vec(): Array[Float] = Array.fill(12)(rnd.nextFloat())

  private lazy val base = Seq.tabulate(1500)(i =>
    (i.toLong, (i % 6).toLong, (i % 30) / 30.0, vec()))
    .toDF("id", "label", "ts", "vec")

  private lazy val t1queries = Seq.tabulate(12)(i =>
    (i.toLong, 1, (i % 6).toLong, -1.0, -1.0, vec()))
    .toDF("qid", "qtype", "v", "l", "r", "qvec")

  test("per-category HNSW: predicate holds by construction, recall >= 0.9") {
    val approx = AnnJoin.categoryHnswKnn(
      base, t1queries.select("qid", "v", "qvec"), k = 10, ef = 256)
    // every neighbor belongs to the query's category
    val joined = approx
      .join(t1queries.select("qid", "v"), "qid")
      .join(base.select(col("id").as("nid"), col("label")), "nid")
    assert(joined.filter(col("label") =!= col("v")).count() == 0)
    // recall vs the exact predicate join
    val exact = KnnJoin.exactFlat(base, t1queries, 10)
    val recall = AnnJoin.recallAtK(approx, exact)
    assert(recall >= 0.9, s"recall $recall")
  }

  private lazy val t3queries = Seq.tabulate(12)(i =>
    (100L + i, 3, (i % 6).toLong, (i % 3) / 10.0, (i % 3) / 10.0 + 0.5, vec()))
    .toDF("qid", "qtype", "v", "l", "r", "qvec")

  test("type-3 in-filter category walk: predicate exact, recall >= 0.9") {
    val approx = AnnJoin.categoryRangeHnswKnn(
      base, t3queries.select("qid", "v", "l", "r", "qvec"), k = 10, ef = 256)
    // every neighbor satisfies BOTH the label and the ts-range predicate
    val joined = approx
      .join(t3queries.select("qid", "v", "l", "r"), "qid")
      .join(base.select(col("id").as("nid"), col("label"), col("ts")), "nid")
    assert(joined.filter(col("label") =!= col("v") ||
      col("ts") < col("l") || col("ts") > col("r")).count() == 0)
    val exact = KnnJoin.exactFlat(base, t3queries, 10)
    val recall = AnnJoin.recallAtK(approx, exact)
    assert(recall >= 0.9, s"recall $recall")
  }

  test("ef autoscaling: sloped by sub-index size, capped; in-filter band widens") {
    val s = SearchParams.EfSlope(base = 150, slope = 0.02, capFactor = 8)
    assert(s.efFor(0) == 150)
    assert(s.efFor(10000) == 350)           // 150 + 0.02·10k
    assert(s.efFor(100000000L) == 1200)     // capped at 8×base
    assert(SearchParams.inFilterEf(100, 1.0) == 100)
    assert(SearchParams.inFilterEf(100, 0.5) == 200)
    assert(SearchParams.inFilterEf(100, 0.01) == 400)  // bounded 4×
  }

  test("GraftExtensions registers SQL functions (applied to the live session)") {
    org.apache.spark.sql.graft.ExprBridge
      .applyExtensionFunctions(spark, new graft.GraftExtensions)
    val r = spark.sql(
      "SELECT l2_sq(array(1.0F, 2.0F), array(1.0F, 4.0F)) d, " +
      "vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) p, " +
      "sq8_l2_sq(sq8_encode(array(1.0F, -2.0F), 2.0D), sq8_encode(array(-1.0F, 2.0F), 2.0D)) q").head
    assert(r.getDouble(0) == 4.0 && r.getDouble(1) == 11.0)
    // codes: [64, -127] vs [-64, 127] → 128² + 254² = 80900
    assert(r.getLong(2) == 80900L)
  }
}
