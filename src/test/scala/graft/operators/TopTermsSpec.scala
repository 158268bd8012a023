package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins [[org.apache.spark.sql.graft.TopTermsAgg]] to the row_number
  * Window it replaced in `tfidf_terms` (round-15 optimization): same
  * (doc_id, rank, token, tf, df) rows for every k, including ties on
  * tf and df (broken by the token's binary string order) and the
  * under-k groups — the query is hash-gated, so the swap must be
  * value-invisible. The input is repartitioned to force real partial
  * buffers through serialize/merge. */
class TopTermsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(173)
  private val toks = Seq("a", "b", "zz", "Qq", "m1", "m2", "Ωμ", "n")

  private def sample(): DataFrame = {
    val rows = for {
      doc <- 0L until 40L
      t <- toks if rnd.nextDouble() < 0.8
    } yield (doc, t, (rnd.nextInt(4) + 1).toLong, (rnd.nextInt(3) + 1).toLong)
    rows.toDF("doc_id", "token", "tf", "df").repartition(7)
  }

  test("TopTermsAgg equals the row_number window for k in 1..6") {
    val df = sample()
    (1 to 6).foreach { k =>
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tf").desc, col("df").asc, col("token"))
      val windowed = df
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select("doc_id", "rank", "token", "tf", "df")
        .collect().map(_.toSeq).toSet
      val agged = df
        .groupBy("doc_id")
        .agg(TopKAggregate.topTerms(k, col("tf"), col("df"), col("token")).as("ts"))
        .select(col("doc_id"), posexplode(col("ts")).as(Seq("r0", "t")))
        .select(col("doc_id"), (col("r0") + 1).cast("long").as("rank"),
          col("t.token").as("token"), col("t.tf").as("tf"), col("t.df").as("df"))
        .collect().map(_.toSeq).toSet
      assert(agged == windowed, s"k=$k")
    }
  }

  test("TopTermsAgg orders exact ties by binary token order") {
    val df = Seq(
      (1L, "b", 2L, 1L), (1L, "a", 2L, 1L), (1L, "B", 2L, 1L),
      (1L, "c", 2L, 2L), (1L, "d", 3L, 9L)
    ).toDF("doc_id", "token", "tf", "df").repartition(3)
    val got = df.groupBy("doc_id")
      .agg(TopKAggregate.topTerms(3, col("tf"), col("df"), col("token")).as("ts"))
      .select(posexplode(col("ts")).as(Seq("r0", "t")))
      .select(col("t.token")).collect().map(_.getString(0)).toSeq
    // tf desc first (d), then tf=2/df=1 ties in binary order: "B" < "a"
    assert(got == Seq("d", "B", "a"))
  }
}
