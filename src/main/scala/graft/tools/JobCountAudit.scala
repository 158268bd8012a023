package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Counts Spark jobs per named query (build + materialize) — the audit
  * for gating-job eliminations like the dedup size hints: a count() or
  * probe that runs at plan-build time shows up here even though it never
  * appears in the final plan.
  *
  * Usage: runMain graft.tools.JobCountAudit [sfDir] [query...]
  */
object JobCountAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("corpus_pipeline", "dedup_survivors", "dedup_clusters")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    })
    names.foreach { name =>
      jobs.set(0)
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      graft.operators.Dedup.releaseCaches()
      Thread.sleep(300) // async listener drain
      println(s"JOBS $name: ${jobs.get()} jobs, $n rows")
    }
    spark.stop()
  }
}
