package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.HnswIndex

/** Recall@k vs ef ladder over ONE persisted sub-index bucket of an
  * [[graft.index.AnnIndexStore]] table — the cheap calibration that
  * sizes ef for a recall target at the contest operating point without
  * re-running the full search stages. Loads the first bucket row's
  * graph blob, takes every `stride`-th stored vector as a query, exact
  * top-k over the bucket as oracle, then walks the ladder.
  *
  * Usage: runMain graft.tools.RecallLadderProbe <storePath> [k] [nq]
  */
object RecallLadderProbe {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val k = if (args.length > 1) args(1).toInt else 100
    val nq = if (args.length > 2) args(2).toInt else 50

    val spark = graft.GraftConf.tuned(SparkSession.builder())
      .master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val row = spark.read.parquet(graft.index.AnnIndexStore.resolveStore(path))
      .select("graph").head()
    val idx = HnswIndex.fromBytes(row.getAs[Array[Byte]](0))
    println(s"bucket index: ${idx.size} rows, dim ${idx.dim}")
    spark.stop()

    val all = Array.tabulate(idx.size)(identity)
    // clamp: a bucket smaller than nq would stride past the last row
    val nqC = math.min(nq, idx.size)
    val stride = math.max(1, idx.size / nqC)
    val queries = Array.tabulate(nqC)(i => idx.vectorOf(math.min(i * stride, idx.size - 1)))
    val exact = queries.map(q => idx.exactOver(q, all, k).map(_._1).toSet)

    for (ef <- Seq(200, 400, 800, 1600, 3200)) {
      val t0 = System.nanoTime()
      var hits = 0L
      var qi = 0
      while (qi < queries.length) {
        val got = idx.search(queries(qi), k, ef)
        hits += got.count(t => exact(qi).contains(t._1))
        qi += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"ef=$ef%5d  recall@$k=${hits.toDouble / (queries.length.toLong * k)}%.4f  ${queries.length / dt}%7.1f q/s (1 thread)")
    }
  }
}
