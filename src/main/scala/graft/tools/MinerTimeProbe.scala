package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev diagnostic: per-stage wall breakdown of the exact-Jaccard pair
  * miner on a driver corpus, to attribute cold-run cost between the
  * shingle explosion, the partition+persist, the self-join, and the
  * pair aggregation. Not part of the query surface.
  */
object MinerTimeProbe {
  private def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    import graft.functions.{TextFunctions => TF}
    import spark.implicits._
    def exploded(): DataFrame =
      docs.select(col("doc_id").cast("long"), col("text").cast("string"))
        .as[(Long, String)]
        .flatMap { case (id, txt) =>
          val sh = TF.shinglesJvm(TF.tokenizeJvm(txt), 3).distinct
          sh.map(s => (id, s, sh.length.toLong))
        }
        .toDF("doc_id", "sh", "n")

    (1 to 3).foreach { rep =>
      println(s"--- rep $rep")
      t("explode only")(exploded().count())
      val ex = t("explode+repart+persist") {
        val e = exploded().repartition(col("sh"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        e.count(); e
      }
      t("join+agg") {
        ex.as("a").join(ex.as("b"),
            col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("inter"), max(col("a.n")).as("na"), max(col("b.n")).as("nb"))
          .withColumn("jac", col("inter") / (col("na") + col("nb") - col("inter")))
          .filter(col("jac") >= 0.2)
          .count()
      }
      t("full miner fresh") {
        graft.operators.Dedup.jaccardShinglePairs(docs, "doc_id", "text", 3, 0.2).count()
      }
      ex.unpersist(true)
      graft.operators.CacheRegistry.releaseAll(blocking = true)
    }
    spark.stop()
  }
}
