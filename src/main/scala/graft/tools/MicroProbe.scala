package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Ad-hoc stage-isolation micro-bench for the optimization round:
  * times named fragments of hot queries with the noop sink so the
  * expensive sub-expression is identified by measurement, not guess
  * (guide §1.4). Each fragment runs `reps` times, min reported.
  *
  * Usage: runMain graft.tools.MicroProbe <sfDir> <reps> [frag1,frag2]
  */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // join+agg stage of jaccardShinglePairs in isolation (cache pre-built
    // outside the timed region), with a pluggable join-strategy hint
    def jacJoin(d: org.apache.spark.sql.DataFrame, hint: Option[String]): Unit = {
      val ex = graft.operators.Dedup.explodedShinglesForProbe(d, "doc_id", "text", 3)
        .repartition(col("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ex.count() // cache built BEFORE t0: join_stage times the join+agg only
      val b0 = hint.fold(ex.as("b"))(h => ex.as("b").hint(h))
      val t0 = System.nanoTime()
      val out = ex.as("a").join(b0,
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"), max(col("a.n")).as("na"), max(col("b.n")).as("nb"))
        .withColumn("jac", col("inter") / (col("na") + col("nb") - col("inter")))
        .filter(col("jac") >= 0.5)
      noop(out)
      println(f"  join_stage=${(System.nanoTime() - t0) / 1e9}%.3f s")
      ex.unpersist(blocking = true)
      ()
    }

    val frags: Seq[(String, () => Unit)] = Seq(
      "docs_scan" -> (() => noop(docs)),
      "tokens_only" -> (() => noop(docs.select(TF.tokens(col("text")).as("t")))),
      "grams_explode" -> (() => noop(docs.select(
        explode(TF.shingles(TF.tokens(col("text")), 1)).as("gram")))),
      "grams_count" -> (() => {
        docs.select(explode(TF.shingles(TF.tokens(col("text")), 1)).as("gram"))
          .agg(count(lit(1L))).collect(); ()
      }),
      "grams_mg" -> (() => {
        docs.select(explode(TF.shingles(TF.tokens(col("text")), 1)).as("gram"))
          .agg(count(lit(1L)), graft.operators.HeavyHitters.mgCandidates(32, col("gram")))
          .collect(); ()
      }),
      "explode_tokens_direct" -> (() => noop(docs.select(
        explode(TF.tokens(col("text"))).as("gram")))),
      "jac_inverted" -> (() => {
        noop(graft.operators.Dedup.jaccardShinglePairs(docs, "doc_id", "text",
          shingleSize = 3, minJaccard = 0.5))
        graft.operators.CacheRegistry.releaseAll(blocking = true)
      }),
      "jac_prefix" -> (() => {
        noop(graft.operators.Dedup.jaccardPrefixPairs(docs, "doc_id", "text",
          shingleSize = 3, minJaccard = 0.5))
        graft.operators.CacheRegistry.releaseAll(blocking = true)
      }),
      "jac_join_bhj" -> (() => jacJoin(docs, hint = None)),
      "jac_join_shj" -> (() => jacJoin(docs, hint = Some("shuffle_hash"))),
      "jac_join_smj" -> (() => jacJoin(docs, hint = Some("merge"))),
      "shingle_explode_rows" -> (() => {
        docs.sparkSession.range(1).collect() // spacer
        println("  postings: " + graft.operators.Dedup
          .jaccardPostingsProfile(docs, "doc_id", "text", 3).mkString(" "))
      })
    )

    frags.filter(f => only.forall(_.contains(f._1))).foreach { case (name, f) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println(f"MICRO $name%-24s min=${times.min}%7.3f s  all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
