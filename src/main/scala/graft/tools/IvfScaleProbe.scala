package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.AnnIndexStore
import graft.operators.{AnnJoin, KnnJoin}

/** IVF-vs-hash routing comparison at the contest operating point,
  * reusing [[ContestScaleProbe]]'s cached base/queries: builds a
  * centroid-routed store ([[AnnIndexStore.buildIvf]]) over the same 10M
  * corpus and runs the UNFILTERED (type-0) query batch through
  * `searchIvf` — the all-bucket hash store walks every bucket per query
  * (32× amplification), centroid routing walks `nprobe` lists. Reports
  * build + search wall times and recall@k on the same deterministic
  * sample as the main probe, for a side-by-side with its
  * search_type0_hash stage.
  *
  * Usage: runMain graft.tools.IvfScaleProbe [N] [NQ] [k] [ef] [nlist] [nprobe] [chunkRows]
  * (N, NQ address the ContestScaleProbe cache dir — run it first.
  * chunkRows < |queries| makes the search multi-job, which is the A/B
  * surface for the executor-resident graph cache: with the cache each
  * touched list deserializes once per JVM, without it once per chunk.)
  */
object IvfScaleProbe {

  private def heapMb(): Long = {
    System.gc()
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.1f s (driver heap ${heapMb()} MB)")
    r
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val nq = if (args.length > 1) args(1).toLong else 1000000L
    val k = if (args.length > 2) args(2).toInt else 100
    val ef = if (args.length > 3) args(3).toInt else 400
    val nlist = if (args.length > 4) args(4).toInt else 128
    val nprobe = if (args.length > 5) args(5).toInt else 8
    val chunkRows = if (args.length > 6) args(6).toInt else 50000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val root = s"/tmp/graft_contest_scale_c_${n}_$nq"

    val spark = graft.GraftConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def exists(p: String) = new java.io.File(s"$p/_SUCCESS").exists()
    val base = spark.read.parquet(s"$root/base")
    val queries0 = spark.read.parquet(s"$root/queries")
      .filter(col("qtype") === 0)

    // params-stamped resumes (ProbeHarness): a cached store or result
    // set is valid ONLY under the args that produced it — an unstamped
    // exists() check let an nlist/nprobe/k/ef sweep print the previous
    // parameters' numbers under the new labels. The store keeps its
    // path (SqlServingProbe points at it); a changed nlist rebuilds it
    // in place.
    import ProbeHarness.{freshFor, stamp}
    if (!freshFor(s"$root/by_ivf/lists", s"nlist=$nlist")) timed(s"build_ivf_nlist$nlist") {
      graft.sources.ParquetMeta.deleteRecursively(new java.io.File(s"$root/by_ivf"))
      AnnIndexStore.buildIvf(base.select(col("id"), col("vec")),
        s"$root/by_ivf", nlist = nlist)
      stamp(s"$root/by_ivf/lists", s"nlist=$nlist")
    }
    val searchParams = s"nlist=$nlist nprobe=$nprobe chunk=$chunkRows k=$k ef=$ef"
    if (!freshFor(s"$root/results_ivf/t0", searchParams))
      timed(s"search_type0_ivf_nprobe${nprobe}_chunk$chunkRows") {
        // chunked: driver-side centroid routing per slice, flat heap
        AnnIndexStore.searchIvfChunked(spark, s"$root/by_ivf",
            queries0.select(col("qid"), col("qvec")), k, ef, nprobe,
            chunkRows = chunkRows)
          .write.mode("overwrite").parquet(s"$root/results_ivf/t0")
        stamp(s"$root/results_ivf/t0", searchParams)
      }

    timed("recall_sample_type0") {
      val sample = queries0.filter(col("qid") % 1009 === 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nSample = sample.count()
      val exact = KnnJoin.exactFlat(base, sample, k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ivf = spark.read.parquet(s"$root/results_ivf/t0")
        .join(broadcast(sample.select("qid")), "qid")
      val rIvf = AnnJoin.recallAtK(ivf, exact)
      // side-by-side: the hash store's answers for the same sample
      val hashRes = s"$root/results/t0"
      val rHash =
        if (exists(hashRes)) {
          val h = spark.read.parquet(hashRes)
            .join(broadcast(sample.select("qid")), "qid")
          f"${AnnJoin.recallAtK(h, exact)}%.4f"
        } else "n/a"
      println(f"RECALL@$k type0 over $nSample queries: ivf(nlist=$nlist,nprobe=$nprobe)=$rIvf%.4f hash(all-32)=$rHash")
      sample.unpersist(); exact.unpersist()
    }
    println(s"FINAL driver heap: ${heapMb()} MB")
    spark.stop()
  }
}
