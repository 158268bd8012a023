package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.{AnnCatalog, AnnTopKStrategy}

/** Serving-path A/B for the SQL ANN auto-route: the SAME type-0
  * statement batch answered per registration config —
  *   hash: every bucket of the [[graft.index.AnnIndexStore.build]] store
  *         walks per statement (B× amplification),
  *   ivf:  only the statement's `nprobe` centroid-nearest lists walk
  *         ([[AnnCatalog.register]] `ivfIndex`).
  * Reuses [[ContestScaleProbe]]'s cached base + by_hash + by_ivf stores
  * (run it first). Statements go through the full planner path
  * (strategy match → AnnTopKExec → collect) in trusted mode, so the
  * number is end-to-end SQL serving latency, not just walk time.
  * Reports per-statement wall + ivf-vs-hash top-k agreement.
  *
  * Usage: runMain graft.tools.SqlServingProbe [N] [NQ] [statements] [k] [ef] [nprobe]
  */
object SqlServingProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val nq = if (args.length > 1) args(1).toLong else 100000L
    val nStmts = if (args.length > 2) args(2).toInt else 30
    val k = if (args.length > 3) args(3).toInt else 100
    val ef = if (args.length > 4) args(4).toInt else 400
    val nprobe = if (args.length > 5) args(5).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val root = s"/tmp/graft_contest_scale_c_${n}_$nq"
    require(new java.io.File(s"$root/by_hash/_SUCCESS").exists(),
      s"run ContestScaleProbe/IvfScaleProbe first to populate $root")

    val spark = graft.GraftConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.ui.enabled", "false")
      .withExtensions(e => e.injectPlannerStrategy(AnnTopKStrategy))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)

    val basePath = s"$root/base"
    // deterministic type-0 statement sample
    val qvs = spark.read.parquet(s"$root/queries")
      .filter(col("qtype") === 0)
      .orderBy("qid").limit(nStmts)
      .select("qid", "qvec").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(qvs.nonEmpty, "no type-0 queries in the cached batch")

    def stmt(qv: Array[Float]): Array[Long] =
      spark.read.parquet(basePath)
        .orderBy(graft.functions.VectorFunctions.l2Sq(col("vec"), typedLit(qv)), col("id"))
        .select("id").limit(k)
        .collect().map(_.getLong(0))

    def drive(tag: String): (Double, Array[Array[Long]]) = {
      // one warm statement primes the executor graph cache (both routes
      // serve from cached deserialized graphs in steady state)
      stmt(qvs.head._2)
      val t0 = System.nanoTime()
      val res = qvs.map { case (_, qv) => stmt(qv) }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STAGE serve_$tag: $nStmts statements in $dt%.2f s = ${dt / nStmts * 1000}%.0f ms/stmt")
      (dt, res)
    }

    AnnCatalog.register(basePath, s"$root/by_hash", idCol = "id", vecCol = "vec",
      ef = ef, trusted = true)
    val (hashDt, hashRes) = drive("hash")

    AnnCatalog.register(basePath, s"$root/by_hash", idCol = "id", vecCol = "vec",
      ef = ef, trusted = true, ivfIndex = Some(s"$root/by_ivf"), nprobe = nprobe)
    val (ivfDt, ivfRes) = drive(s"ivf_nprobe$nprobe")

    val agree = hashRes.zip(ivfRes).map { case (h, i) =>
      h.toSet.intersect(i.toSet).size.toDouble / k
    }
    println(f"RESULT speedup=${hashDt / ivfDt}%.2fx  ivf_vs_hash_overlap@${k}=${agree.sum / agree.length}%.4f")
    AnnCatalog.unregister(basePath)
    spark.stop()
  }
}
