package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.{HnswIndex, TsIndex}

/** Ground-truth unit costs for the type-2 arm's building blocks, on ONE
  * stored sub-graph (no Spark in the timed loops): full walk at several
  * ef, in-filter walk, quantized exact slice scan. Feeds the ef-band /
  * brute-threshold constants in [[graft.operators.SearchParams]] with
  * measured numbers instead of a cost model.
  *
  * Usage: runMain graft.tools.WalkMicro <storePath> [nQueries]
  */
object WalkMicro {

  def main(args: Array[String]): Unit = {
    val path = if (args.length > 0) args(0) else "/tmp/graft_t2probe_6000000/by_range30"
    val nq = if (args.length > 1) args(1).toInt else 200
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // resolveStore: a compacted store's data lives in a generation dir
    // a whole-directory read of the root would miss (stale or empty)
    val row = spark.read.parquet(graft.index.AnnIndexStore.resolveStore(path))
      .select(col("bucket"), col("ids"), col("attrs"), col("graph"))
      .filter(col("bucket") === 3).limit(1).collect()(0)
    val ts = row.getSeq[Double](2).toArray
    val graph = row.getAs[Array[Byte]](3)
    spark.stop()
    val index = HnswIndex.fromBytes(graph)
    val tsIdx = new TsIndex(ts)
    val n = ts.length
    println(s"graph: n=$n bucket=${row.getLong(0)}")
    val rnd = new java.util.Random(7)
    val queries = Array.fill(nq)(Array.fill(100)(rnd.nextFloat()))
    // mixture queries like the corpus (kept simple: random is fine for
    // COST; recall is measured elsewhere)
    def timed(name: String)(f: => Unit): Unit = {
      f // warm
      val reps = 3
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { f; i += 1 }
      val per = (System.nanoTime() - t0) / 1e6 / reps / nq
      println(f"$name%-28s ${per}%8.3f ms/query-unit")
    }
    val k = 100
    timed("walk ef=400")(queries.foreach(q => index.search(q, k, 400)))
    timed("walk ef=200")(queries.foreach(q => index.search(q, k, 200)))
    timed("walk ef=140")(queries.foreach(q => index.search(q, k, 140)))
    val lo = ts.min; val span = ts.max - lo
    timed("filtered walk cover=0.3 ef=1333") {
      queries.foreach { q =>
        val l = lo + 0.2 * span; val r = lo + 0.5 * span
        val allowed: Int => Boolean = i => ts(i) >= l && ts(i) <= r
        index.search(q, k, 1333, allowed, seeds = tsIdx.seeds(l, r, 10))
      }
    }
    timed("exactOverQ cover=0.3") {
      queries.foreach { q =>
        val l = lo + 0.2 * span; val r = lo + 0.5 * span
        index.exactOverQ(q, tsIdx.inRange(l, r), k)
      }
    }
    timed("exactOverQ full") {
      queries.foreach(q => index.exactOverQ(q, tsIdx.inRange(lo, lo + span), k))
    }
    timed("exactOver fp32 cover=0.3") {
      queries.foreach { q =>
        val l = lo + 0.2 * span; val r = lo + 0.5 * span
        index.exactOver(q, tsIdx.inRange(l, r), k)
      }
    }

    // ---- per-eval cost ratio (feeds EfTuner.ScanPerEvalAdvantage) ----
    // Both sides evaluate the same qdistTo int8 unit; the scan walks a
    // contiguous slice (sequential prefetch) while the walk's evals are
    // random-access + heap bookkeeping. ratio = (walk ns/eval) /
    // (scan ns/eval) — the constant that converts the tuner's
    // deterministic eval-count crossover into a wall-clock crossover.
    println("\nside          cover   ms/query   evals/query   ns/eval")
    Seq(0.1, 0.2, 0.3, 0.45, 0.6, 0.75).foreach { cover =>
      val l = lo + (0.5 - cover / 2) * span
      val r = lo + (0.5 + cover / 2) * span
      val allowed: Int => Boolean = i => ts(i) >= l && ts(i) <= r
      val efW = graft.operators.SearchParams.inFilterEf(400, cover)
      def wall(f: => Unit): Double = {
        f // warm
        val reps = 3
        val t0 = System.nanoTime()
        var i = 0
        while (i < reps) { f; i += 1 }
        (System.nanoTime() - t0).toDouble / reps / nq
      }
      var walkEvals = 0L
      val walkNs = wall {
        walkEvals = 0L
        queries.foreach { q =>
          index.search(q, k, efW, allowed, seeds = tsIdx.seeds(l, r, 10))
          walkEvals += index.lastFilteredWalkVisits
        }
      }
      val slice = tsIdx.inRange(l, r)
      val scanEvals = slice.length.toLong
      val scanNs = wall(queries.foreach(q => index.exactOverQ(q, slice, k)))
      val walkPer = walkNs / math.max(1L, walkEvals / nq)
      val scanPer = scanNs / math.max(1L, scanEvals)
      println(f"walk ef=$efW%-6d $cover%.2f ${walkNs / 1e6}%10.3f ${walkEvals / nq}%13d $walkPer%9.1f")
      println(f"scanQ         $cover%.2f ${scanNs / 1e6}%10.3f $scanEvals%13d $scanPer%9.1f  ratio=${walkPer / scanPer}%.2f")
    }
  }
}
