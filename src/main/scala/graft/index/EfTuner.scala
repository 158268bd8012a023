package graft.index

/** Measured-recall ef auto-tuning.
  *
  * The reference ships hand-tuned ef tables per query type and dataset
  * (hybrid_graph.cpp: type-specific ef bands found by offline recall
  * sweeps via getquery.cpp/plot.py). This utility automates that sweep:
  * given a built sub-index and a query sample, it measures recall@k
  * against the index's own exact top-k at each rung of an ef ladder and
  * returns the smallest ef meeting the target — the offline analysis
  * workflow as a deterministic function.
  *
  * Cost model: exact ground truth is one O(sample·n) scan (the sample
  * is small — this is an offline calibration, not a per-query step);
  * each rung is sample·search. Rungs are measured lazily, stopping at
  * the first that meets the target.
  */
object EfTuner {

  /** Tune against a REAL stored sub-index (the reference sweeps the
    * actual index it will serve from, getquery.cpp — a sub-sampled
    * rebuild's recall-vs-ef curve can differ). Deterministically picks
    * the LARGEST bucket of the store (worst-case walk depth; ties by
    * bucket id), loads it through the serving cache, and runs the
    * ladder on it. The blob collect is one sub-index — the same
    * bounded unit every serving task holds in memory. */
  def tuneStored(spark: org.apache.spark.sql.SparkSession, indexPath: String,
      sample: Array[Array[Float]], k: Int, targetRecall: Double,
      ladder: Seq[Int] = DefaultLadder): Result = {
    import org.apache.spark.sql.functions._
    val row = spark.read.parquet(indexPath)
      .select(col("bucket"), size(col("ids")).as("n"), col("graph"))
      .orderBy(desc("n"), col("bucket"))
      .limit(1).collect()
    require(row.nonEmpty, s"tuneStored: empty index store at $indexPath")
    val idx = HnswIndex.fromBytesCached(row(0).getAs[Array[Byte]]("graph"))
    tune(idx, sample, k, targetRecall, ladder)
  }

  /** One measured rung: achieved mean recall@k at `ef`. */
  final case class Rung(ef: Int, recall: Double)

  /** `chosenEf` = smallest ladder rung with recall >= target (ladder
    * max if none); `rungs` = every measured rung in ladder order. */
  final case class Result(chosenEf: Int, target: Double, rungs: Seq[Rung]) {
    def achieved: Double = rungs.last.recall
  }

  val DefaultLadder: Seq[Int] = Seq(50, 75, 100, 150, 200, 300, 425, 600)

  /** Tune ef for `idx` on a query sample against the index's own exact
    * top-k. Ladder must be ascending; measurement stops at the first
    * rung meeting `targetRecall`. Deterministic for a deterministic
    * index build (seeded level RNG + id-ordered ties). */
  def tune(idx: HnswIndex, sample: Array[Array[Float]], k: Int,
      targetRecall: Double, ladder: Seq[Int] = DefaultLadder): Result = {
    require(sample.nonEmpty, "empty tuning sample")
    require(ladder.nonEmpty && ladder == ladder.sorted, "ladder must be ascending")
    val all = Array.tabulate(idx.size)(identity)
    val truth: Array[Array[Int]] =
      sample.map(q => idx.exactOver(q, all, k).map(_._1))
    val rungs = scala.collection.mutable.ArrayBuffer.empty[Rung]
    var chosen = -1
    val it = ladder.iterator
    while (chosen < 0 && it.hasNext) {
      val ef = it.next()
      var hit = 0L
      var total = 0L
      var i = 0
      while (i < sample.length) {
        val exact = truth(i)
        val got = idx.search(sample(i), k, ef).map(_._1).toSet
        var j = 0
        while (j < exact.length) {
          if (got.contains(exact(j))) hit += 1
          j += 1
        }
        total += exact.length
        i += 1
      }
      val recall = if (total == 0) 1.0 else hit.toDouble / total
      rungs += Rung(ef, recall)
      if (recall >= targetRecall) chosen = ef
    }
    Result(if (chosen < 0) ladder.last else chosen, targetRecall, rungs.toSeq)
  }
}
