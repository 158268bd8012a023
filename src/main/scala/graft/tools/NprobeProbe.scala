package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Print the full measured nprobe routing-recall ladder for an IVF
  * store — the receipts behind the `_nprobe` sidecar's choice
  * ([[graft.index.EfTuner.tuneNprobe]] early-stops at the target; this
  * measures EVERY rung so BASELINE.md can record the whole curve).
  *
  * Usage: runMain graft.tools.NprobeProbe [sfDir|storePath] [k] [ef]
  *  - an sf testdata dir: probes the seeded 16-list gate store
  *    (building it if missing)
  *  - an IVF store root (has centroids/ + lists/): probes it directly,
  *    sampling 32 query vectors from the store's own lists
  */
object NprobeProbe {
  def main(args: Array[String]): Unit = {
    val target = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 10
    val ef = if (args.length > 2) args(2).toInt else 400
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val isStore = new java.io.File(s"$target/centroids").exists() ||
      new java.io.File(
        s"${graft.index.AnnIndexStore.resolveStore(target)}/centroids").exists()
    val (storePath, sample) =
      if (isStore) {
        // sample from the store's own base rows: qid-strided over the
        // lists table's ids, vectors recovered from the graphs' row sets
        // is overkill — the contest stores keep base/ beside by_ivf/, so
        // prefer a sibling base when present, else the first list rows
        val sib = new java.io.File(target).getParentFile
        val basePath = new java.io.File(sib, "base")
        val src =
          if (new java.io.File(basePath, "_SUCCESS").exists())
            spark.read.parquet(basePath.getPath)
              .select(col("id").cast("long").as("id"), col("vec"))
          else sys.error(s"NprobeProbe: no sibling base/ beside $target — " +
            "pass an sf dir or a contest root's by_ivf")
        val n = src.count()
        val stride = math.max(1L, n / 32)
        val qs = src.filter(pmod(col("id"), lit(stride)) === 0)
          .orderBy("id").limit(32)
          .collect().map(_.getSeq[Float](1).toArray)
        (target, qs)
      } else {
        val p = graft.queries.StorePaths.ensureIvfStore(spark, target)
        // THE gate's sample definition (shared), not a re-implementation
        val qs = graft.queries.ApproxQueries.stridedSample(spark, target,
          maxSample = 32L)
        (p, qs)
      }
    // targetRecall > 1 defeats the early stop: every rung is measured
    val res = graft.index.EfTuner.tuneNprobe(spark, storePath, sample,
      k, targetRecall = 2.0, ef = ef)
    println("NPROBE_LADDER " + res.rungs.map(r =>
      f"${r.nprobe}:${r.recall}%.5f").mkString(" "))
    Seq(0.95, 0.99, 0.995, 0.998, 0.999).foreach { t =>
      val c = res.rungs.find(_.recall >= t).map(_.nprobe)
        .getOrElse(res.rungs.last.nprobe)
      println(s"NPROBE_AT target=$t chosen=$c")
    }
    spark.stop()
  }
}
