package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-query execution-shape probe for the optimization rounds: runs
  * each named query `reps` times under the bench's session shape and
  * reports wall, Spark job count, stage count, task count, and
  * cumulative task time — the measure-first numbers that tell overhead
  * (many tiny jobs / stages) apart from compute (task seconds).
  *
  * Usage: runMain graft.tools.QueryProbe <sfDir> <reps> [q1,q2,...]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names =
      if (args.length > 2) args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Seq("heavy_ngrams", "dedup_survivors", "ann_nprobe_tune")
    val spark = graft.GraftConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobWall = mutable.ArrayBuffer.empty[(Int, Long)]
    val jobStartNs = mutable.HashMap.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        jobStartNs.synchronized { jobStartNs(s.jobId) = System.nanoTime() }
      }
      override def onJobEnd(s: SparkListenerJobEnd): Unit = {
        jobStartNs.synchronized {
          jobStartNs.remove(s.jobId).foreach { t0 =>
            jobWall.synchronized {
              jobWall += ((s.jobId, (System.nanoTime() - t0) / 1000000))
            }
          }
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
        ()
      }
    })

    names.foreach { name =>
      (1 to reps).foreach { rep =>
        jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L)
        jobWall.synchronized(jobWall.clear())
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        graft.operators.CacheRegistry.releaseAll(blocking = true)
        Thread.sleep(400) // async listener drain
        val jw = jobWall.synchronized(jobWall.toSeq)
        val slow = jw.sortBy(-_._2).take(8)
          .map { case (id, ms) => s"j$id=${ms}ms" }.mkString(" ")
        println(f"PROBE $name%-24s rep$rep wall=$wall%7.3f s  " +
          f"jobs=${jobs.get()}%3d stages=${stages.get()}%3d " +
          f"tasks=${tasks.get()}%4d taskSum=${taskMs.get()}%6d ms rows=$n  slowest: $slow")
      }
      System.gc()
    }
    spark.stop()
  }
}
