package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.AnnIndexStore
import graft.operators.{AnnJoin, KnnJoin}

/** Focused A/B of the type-2 (timestamp-range) serving arm — the r9
  * lifecycle's slowest stage (1326 s for 250k queries at the 10M binary
  * point vs type-1's 80 s). Arms:
  *
  *   decile — the reference-shaped store (hybrid_graph.cpp:338-459):
  *     floor(ts·10) buckets, hash-salted into ~200k-row sub-graphs.
  *     Hash salting spreads every query's range over EVERY sub-graph of
  *     each overlapped decile, so a partial range pays salt× walks.
  *   range  — ts-contiguous fine buckets (floor(ts·scale), scale sized
  *     so each bucket is ONE unsalted ~200k graph): a range walks only
  *     the buckets it overlaps; fully-covered buckets use banded ef
  *     (SearchParams.unionWalkEf) and SMALL slices the quantized
  *     exactOverQ scan.
  *
  * Reports per-width wall (the contest's four type-2 widths 0.01 / 0.05
  * / 0.1 / 0.3, ContestCorpus.queryRow) and recall@k vs the exact
  * oracle on a sample, per arm.
  *
  * Usage: runMain graft.tools.T2Probe [N] [NQ2] [k] [ef]
  */
object T2Probe {

  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 6000000L
    val nq = if (args.length > 1) args(1).toLong else 40000L
    val k = if (args.length > 2) args(2).toInt else 100
    val ef = if (args.length > 3) args(3).toInt else 400
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val root = s"/tmp/graft_t2probe_${n}"
    val spark = graft.GraftConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def exists(p: String) = new java.io.File(s"$p/_SUCCESS").exists()

    if (!exists(s"$root/base")) timed("synthesize_base") {
      spark.range(0, n, 1, cpus.toInt * 4)
        .mapPartitions(_.map { id =>
          val (label, ts, vec) = ContestCorpus.baseRow(id)
          (id, label, ts, vec)
        })
        .toDF("id", "label", "ts", "vec")
        .write.mode("overwrite").parquet(s"$root/base")
    }
    // type-2 statements only: walk query ordinals, keep qtype==2 so the
    // width classes cycle exactly as in the contest feed
    // params-stamped: the q2 batch size is a CLI arg and the root is
    // keyed only by N — an unstamped resume ran every width arm over
    // the previous run's batch (ProbeHarness)
    if (!ProbeHarness.freshFor(s"$root/q2", s"nq=$nq")) timed("synthesize_queries") {
      spark.range(0, nq * 4, 1, cpus.toInt)
        .mapPartitions(_.flatMap { i =>
          val (qtype, _, l, rr, qvec) = ContestCorpus.queryRow(i)
          if (qtype == 2) Some((1000000000L + i, (i % 16 / 4).toInt, l, rr, qvec))
          else None
        })
        .toDF("qid", "wclass", "l", "r", "qvec")
        .write.mode("overwrite").parquet(s"$root/q2")
      ProbeHarness.stamp(s"$root/q2", s"nq=$nq")
    }
    val base = spark.read.parquet(s"$root/base")
    val q2 = spark.read.parquet(s"$root/q2")
    println(s"BASE: ${base.count()}  Q2: ${q2.count()}")

    val scale = math.max(10, math.ceil(n / 200000.0).toInt)
    if (!exists(s"$root/by_decile")) timed("build_by_decile") {
      AnnIndexStore.buildBy(
        base.withColumn("decile", floor(col("ts") * 10).cast("long")),
        s"$root/by_decile", "decile", attrCol = Some("ts"))
    }
    if (!exists(s"$root/by_range$scale")) timed("build_by_range") {
      AnnIndexStore.buildBy(
        base.withColumn("bucket", floor(col("ts") * scale).cast("long")),
        s"$root/by_range$scale", "bucket", attrCol = Some("ts"))
    }

    def arm(name: String)(search: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Unit = {
      // per-width walls (run each width class separately)
      (0 to 3).foreach { w =>
        val qs = q2.filter(col("wclass") === w).select("qid", "l", "r", "qvec")
        val nql = qs.count()
        timed(f"${name}_w${ContestCorpus.widthOf(w)}%.2f (${nql} q)") {
          search(qs).write.mode("overwrite").parquet(s"$root/res_${name}_$w")
        }
      }
      val res = (0 to 3).map(w => spark.read.parquet(s"$root/res_${name}_$w"))
        .reduce(_ unionByName _)
      // recall on a deterministic sample
      val sample = q2.filter(col("qid") % 211 === 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val exact = KnnJoin.exactFlat(
        base,
        sample.withColumn("qtype", lit(2)).withColumn("v", lit(0L)),
        k, types = Seq(2))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val approx = res.join(broadcast(sample.select("qid")), "qid")
      val recall = AnnJoin.recallAtK(approx, exact)
      println(f"RECALL[$name]@$k over ${sample.count()} queries: $recall%.4f")
      sample.unpersist(); exact.unpersist()
    }

    if (sys.env.getOrElse("GRAFT_T2_ARMS", "both").contains("dec") ||
        sys.env.getOrElse("GRAFT_T2_ARMS", "both") == "both")
      arm("decile")(qs =>
        AnnIndexStore.searchDecileRange(spark, s"$root/by_decile", qs, k, ef))
    if (sys.env.getOrElse("GRAFT_T2_ARMS", "both").contains("range") ||
        sys.env.getOrElse("GRAFT_T2_ARMS", "both") == "both")
      arm("range")(qs =>
        AnnIndexStore.searchDecileRange(spark, s"$root/by_range$scale", qs, k, ef,
          scale = scale, efBands = true))
    spark.stop()
  }
}
