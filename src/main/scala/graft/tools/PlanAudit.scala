package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the physical plans of representative queries so the shapes
  * that matter at scale can be audited (and recorded in PLANS.md):
  * broadcast sides, exchange counts/reuse, parquet pushdown, partition
  * pruning, whole-stage codegen spans, and the injected ANN route. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.GraftConf.tuned(SparkSession.builder())
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting =
      if (args.length > 1) args.drop(1).toSeq
      else Seq(
        "knn_hybrid", "knn_pruned", "q1_pricing_summary", "sort_limit_lineitem",
        "ann_sql_topk", "dedup_jaccard_pairs", "event_pairs_range", "salted_join_revenue")
    interesting.foreach { name =>
      println(s"\n===== $name =====")
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        println(df.queryExecution.executedPlan.toString)
      } catch { case scala.util.control.NonFatal(e) => println(s"(failed: ${e.getMessage})") }
    }
    spark.stop()
  }
}
