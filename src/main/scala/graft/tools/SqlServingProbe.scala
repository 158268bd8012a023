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
      val perStmt = qvs.map { case (_, qv) =>
        val s0 = System.nanoTime()
        val r = stmt(qv)
        (r, (System.nanoTime() - s0) / 1e6)
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val ms = perStmt.map(_._2).sorted
      println(f"STAGE serve_$tag: $nStmts statements in $dt%.2f s = ${dt / nStmts * 1000}%.0f ms/stmt " +
        f"(min ${ms.head}%.0f / p50 ${ms(ms.length / 2)}%.0f / max ${ms.last}%.0f; " +
        f"last5 ${perStmt.takeRight(5).map(p => f"${p._2}%.0f").mkString(",")})")
      (dt, perStmt.map(_._1))
    }

    // legacy-path A/B: hide a store's version stamp so the SAME
    // statements must take the fingerprint path (full blob scan per
    // statement) instead of the version-keyed warm pass
    def withHiddenStamp[T](storePath: String)(body: => T): T = {
      val name = graft.index.AnnIndexStore.versionFileName
      // resolve like storeVersion does: a compacted store's stamp lives
      // in its current generation dir, not the root (resolved once —
      // the probe is the only writer while the A/B runs)
      val dataDir = graft.index.AnnIndexStore.resolveStore(storePath)
      val f = new java.io.File(dataDir, name)
      val bak = new java.io.File(dataDir, name + ".hidden")
      require(f.exists() && f.renameTo(bak), s"no stamp to hide at $dataDir")
      try body finally require(bak.renameTo(f), s"cannot restore stamp at $dataDir")
    }
    def cacheDelta[T](body: => T): (T, Long, Long) = {
      val h0 = graft.index.ServingCache.hits.get()
      val m0 = graft.index.ServingCache.misses.get()
      val r = body
      (r, graft.index.ServingCache.hits.get() - h0,
        graft.index.ServingCache.misses.get() - m0)
    }

    AnnCatalog.register(basePath, s"$root/by_hash", idCol = "id", vecCol = "vec",
      ef = ef, trusted = true)
    // two passes per arm: pass 1 includes the one-time cache fill, pass
    // 2 over the SAME statements is the steady-state serving number the
    // A/B compares (misses there must be 0 on the versioned path)
    drive("hash_fill")
    val ((hashDt, hashRes), hHits, hMisses) = cacheDelta(drive("hash"))
    println(s"CACHE hash: hits=$hHits misses=$hMisses (misses = blob reads; warm steady state is 0)")
    // the fingerprint path on the same store: every statement re-reads
    // every bucket's blob to compute the cache key — the r10 tax
    val (hashLegacyDt, hashLegacyRes) =
      if (AnnIndexStoreHasStamp(s"$root/by_hash"))
        withHiddenStamp(s"$root/by_hash") {
          drive("hash_fingerprint_fill"); drive("hash_fingerprint")
        }
      else { println("STAGE hash_fingerprint: skipped (store predates version stamps)"); (0.0, hashRes) }
    if (hashLegacyDt > 0) {
      require(hashLegacyRes.zip(hashRes).forall { case (a, b) => a.sameElements(b) },
        "fingerprint path must serve identical results")
      println(f"AB hash: versioned=${hashDt / nStmts * 1000}%.0f ms/stmt vs fingerprint=${hashLegacyDt / nStmts * 1000}%.0f ms/stmt = ${hashLegacyDt / hashDt}%.2fx")
    }

    AnnCatalog.register(basePath, s"$root/by_hash", idCol = "id", vecCol = "vec",
      ef = ef, trusted = true, ivfIndex = Some(s"$root/by_ivf"), nprobe = nprobe)
    drive(s"ivf_fill")
    val ((ivfDt, ivfRes), iHits, iMisses) = cacheDelta(drive(s"ivf_nprobe$nprobe"))
    println(s"CACHE ivf: hits=$iHits misses=$iMisses")
    val (ivfLegacyDt, ivfLegacyRes) =
      if (AnnIndexStoreHasStamp(s"$root/by_ivf/lists"))
        withHiddenStamp(s"$root/by_ivf/lists") {
          drive("ivf_fingerprint_fill"); drive(s"ivf_fingerprint")
        }
      else { println("STAGE ivf_fingerprint: skipped (store predates version stamps)"); (0.0, ivfRes) }
    if (ivfLegacyDt > 0) {
      require(ivfLegacyRes.zip(ivfRes).forall { case (a, b) => a.sameElements(b) },
        "fingerprint path must serve identical results")
      println(f"AB ivf: versioned=${ivfDt / nStmts * 1000}%.0f ms/stmt vs fingerprint=${ivfLegacyDt / nStmts * 1000}%.0f ms/stmt = ${ivfLegacyDt / ivfDt}%.2fx")
    }

    val agree = hashRes.zip(ivfRes).map { case (h, i) =>
      h.toSet.intersect(i.toSet).size.toDouble / k
    }
    println(f"RESULT speedup=${hashDt / ivfDt}%.2fx  ivf_vs_hash_overlap@${k}=${agree.sum / agree.length}%.4f")
    AnnCatalog.unregister(basePath)
    spark.stop()
  }

  private def AnnIndexStoreHasStamp(path: String): Boolean =
    graft.index.AnnIndexStore.storeVersion(path).isDefined
}
