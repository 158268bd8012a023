package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.AnnIndexStore
import graft.operators.{AnnJoin, KnnJoin}

/** Ad-hoc single-node throughput probe at a contest-like shape
  * (dim 100, k 100): synthesizes N base rows + NQ queries, then times
  *   (a) the exact broadcast kNN join,
  *   (b) the batch HNSW index build (AnnIndexStore), and
  *   (c) ANN search over the persisted index,
  * reporting rows/s, build s, queries/s, and ANN recall vs exact.
  *
  * Usage: runMain graft.tools.ScaleProbe [N] [NQ] [buckets] [ef]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 300000
    val nq = if (args.length > 1) args(1).toInt else 1000
    val buckets = if (args.length > 2) args(2).toInt else 16
    val ef = if (args.length > 3) args(3).toInt else 150
    val dim = 100
    val k = 100

    val spark = graft.GraftConf.tuned(SparkSession.builder())
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def mkVec = udf { (id: Long) =>
      val r = new java.util.Random(id * 2654435761L)
      Array.fill(dim)(r.nextFloat())
    }
    val base = spark.range(n)
      .select(col("id"), (col("id") % 100).as("label"),
        (col("id") % 1000 / lit(1000.0)).as("ts"), mkVec(col("id")).as("vec"))
      .cache()
    base.count()
    val queries = spark.range(nq)
      .select((col("id") + 1000000000L).as("qid"), lit(0).as("qtype"),
        lit(-1L).as("v"), lit(-1.0).as("l"), lit(-1.0).as("r"),
        mkVec(col("id") + 7777777L).as("qvec"))
      .cache()
    queries.count()

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // (a) exact kNN join on a query subsample
    val exactQ = queries.limit(100).cache(); exactQ.count()
    val (exact, tExact) = time {
      KnnJoin.exactFlat(base, exactQ, k).cache().count()
    }
    println(f"EXACT: 100 q x $n%d rows in $tExact%.1f s = ${100 * n / tExact / 1e6}%.1f M dist/s")

    // (b) index build
    val path = s"/tmp/graft_scaleprobe_$n"
    val (_, tBuild) = time {
      AnnIndexStore.build(base.select(col("id"), col("vec")), path, buckets)
    }
    println(f"BUILD: $n%d rows, $buckets buckets in $tBuild%.1f s = ${n / tBuild}%.0f rows/s")

    // (c) ANN search
    val (annCount, tSearch) = time {
      AnnIndexStore.search(spark, path, queries.select(col("qid"), col("qvec")), k, ef)
        .cache().count()
    }
    println(f"SEARCH: $nq%d queries in $tSearch%.1f s = ${nq / tSearch}%.0f q/s ($annCount rows)")

    // recall of the ANN path on the exact subsample
    val approxSub = AnnIndexStore.search(spark, path,
      exactQ.select(col("qid"), col("qvec")), k, ef)
    val exactFlat = KnnJoin.exactFlat(base, exactQ, k)
    val recall = AnnJoin.recallAtK(approxSub, exactFlat)
    println(f"RECALL@$k%d: $recall%.4f (ef=$ef)")
    spark.stop()
  }
}
