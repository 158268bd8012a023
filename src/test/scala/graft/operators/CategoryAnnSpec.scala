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
