package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-JOB attribution for one query: prints every Spark job's call
  * site and wall — the drill-down QueryProbe's counts point at (which
  * collect/write/agg owns each of a query's N jobs). Probe-only.
  *
  * Usage: runMain graft.tools.JobTraceProbe <sfDir> <query> [reps]
  */
object JobTraceProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "ann_delta_stream"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()

    case class J(id: Int, site: String, t0: Long, var ms: Long = -1L)
    val trace = mutable.LinkedHashMap.empty[Int, J]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = trace.synchronized {
        val site = Option(s.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        trace(s.jobId) = J(s.jobId, site, System.nanoTime())
      }
      override def onJobEnd(s: SparkListenerJobEnd): Unit = trace.synchronized {
        trace.get(s.jobId).foreach(j => j.ms = (System.nanoTime() - j.t0) / 1000000)
      }
    })
    (1 to reps).foreach { r =>
      trace.synchronized(trace.clear())
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.operators.CacheRegistry.releaseAll(blocking = true)
      Thread.sleep(500)
      println(f"TRACE $name rep$r wall=$wall%.3f s rows=$n jobs=${trace.size}")
      trace.synchronized(trace.values.foreach(j =>
        println(f"  j${j.id}%-4d ${j.ms}%6d ms  ${j.site}")))
    }
    spark.stop()
  }
}
