package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.AnnIndexStore

/** LSM delta-ingest at serving scale: quantifies the amortized-O(1)
  * maintenance claim of the AnnIndexStore delta lifecycle with real
  * numbers instead of toy-spec sizes. A base corpus is indexed once,
  * then micro-batches stream in through [[AnnIndexStore.appendDeltaBatch]]
  * (the same epoch-keyed path the streaming writer drives); after each
  * batch the probe measures what a SERVING system cares about:
  *
  *   - append wall (should be a plain parquet write, independent of
  *     base size — the whole point of the delta),
  *   - searchWithDelta wall for a query batch as the delta grows (the
  *     brute-force delta tax: the delta side scans exactly, so latency
  *     should rise linearly with delta rows and snap back after a fold),
  *   - the compaction wall when the threshold crosses (the amortized
  *     graph rebuild), and
  *   - self-recall on streamed rows (a streamed vector queried back must
  *     surface itself — exactness of the delta side at scale, not just
  *     in specs).
  *
  * Usage: runMain graft.tools.DeltaIngestProbe [baseN] [batchRows]
  *        [batches] [dim] [compactAt]
  * Defaults: 2,000,000 base x 64-dim, 10 batches of 50,000, fold at 0.2
  * (crosses on batch 8 - appends 1-7 measure pre-fold serving, batch 8
  * the fold, 9-10 the post-fold regime).
  */
object DeltaIngestProbe {

  // ONE splitmix64 finalizer (byte-identical delegation, so cached
  // corpora synthesized under the old private copy stay valid)
  private def mix(z0: Long): Long =
    org.apache.spark.sql.graft.TextHashUtil.mix64(z0)

  /** Deterministic unit-ish vector for id. */
  private def vecOf(id: Long, dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      v(i) = ((mix(id * 131 + i) & 0xffffff).toFloat / 0x1000000 - 0.5f)
      i += 1
    }
    v
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val baseN = if (args.length > 0) args(0).toLong else 2000000L
    val batchRows = if (args.length > 1) args(1).toInt else 50000
    val batches = if (args.length > 2) args(2).toInt else 10
    val dim = if (args.length > 3) args(3).toInt else 64
    val compactAt = if (args.length > 4) args(4).toDouble else 0.2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = graft.GraftConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = s"/tmp/graft_delta_ingest_${baseN}_$dim"
    graft.sources.ParquetMeta.deleteRecursively(new java.io.File(root))
    val idxPath = s"$root/index"
    val d = dim

    val base = spark.range(0, baseN, 1, cpus.toInt * 2)
      .map(id => (id, vecOf(id, d)))
      .toDF("id", "vec")
    val (_, buildWall) = timed {
      AnnIndexStore.build(base, idxPath, numBuckets = cpus.toInt)
    }
    println(f"BUILD base=$baseN dim=$dim buckets=$cpus: $buildWall%.1f s")

    // fixed serving workload: 1000 queries drawn from the base domain
    val qBatch = (0 until 1000).map(i => (i.toLong, vecOf(mix(i), d)))
      .toDF("qid", "qvec")
    def serveWall(): Double = {
      val (n, w) = timed {
        AnnIndexStore.searchWithDelta(spark, idxPath, qBatch, k = 10, ef = 128).count()
      }
      require(n == 10000L, s"expected 10000 result rows, got $n")
      w
    }
    println(f"SERVE delta=0: ${serveWall()}%.2f s (1000 q, k=10, ef=128)")

    var folded = false
    (1 to batches).foreach { b =>
      val lo = baseN + (b - 1).toLong * batchRows
      val rows = spark.range(lo, lo + batchRows, 1, cpus.toInt)
        .map(id => (id, vecOf(id, d))).toDF("id", "vec")
      val (_, appendWall) = timed {
        AnnIndexStore.appendDeltaBatch(rows, idxPath, batchId = b.toLong,
          epoch = Some("probe-epoch"))
      }
      val frac = AnnIndexStore.deltaFraction(spark, idxPath)
      val compactWall =
        if (frac >= compactAt) {
          val (_, w) = timed {
            AnnIndexStore.compactDelta(spark, idxPath, numBuckets = cpus.toInt)
          }
          folded = true
          Some(w)
        } else None
      val serve = serveWall()
      println(f"BATCH $b%2d append=$appendWall%5.1f s frac=$frac%.4f " +
        f"serve=$serve%5.2f s" +
        compactWall.map(w => f" FOLD=$w%.1f s").getOrElse(""))
    }
    require(folded, s"probe never crossed compactAt=$compactAt - resize the run")

    // integrity: every base + streamed row is indexed-or-live exactly once
    val indexed = spark.read.parquet(AnnIndexStore.resolveStore(idxPath))
      .agg(sum(size(col("ids")))).head().getLong(0)
    val live = AnnIndexStore.liveDeltaRows(spark, idxPath)
    val expect = baseN + batches.toLong * batchRows
    println(s"ROWS indexed=$indexed + delta=$live (expect $expect total)")
    require(indexed + live == expect, "row-count mismatch across the lifecycle")

    // exactness teeth: streamed vectors queried back must surface
    // themselves at rank 1 (the delta side is brute force; post-fold the
    // graphs carry them - either way self-recall at this ef should hold)
    val probeIds = (0 until 200).map(i => baseN + (mix(i).abs % (batches.toLong * batchRows)))
    val selfQ = probeIds.map(id => (id, vecOf(id, d))).toDF("qid", "qvec")
    val self = AnnIndexStore.searchWithDelta(spark, idxPath, selfQ, k = 10, ef = 256)
      .filter(col("rank") === 1 && col("qid") === col("nid")).count()
    println(f"SELF-RECALL@1 on streamed rows: ${self.toDouble / probeIds.size}%.4f (200 probes)")
    require(self >= 198, s"self-recall broke: $self/200")
    spark.stop()
  }
}
