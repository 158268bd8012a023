package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Semantic dedup (SemDeDup) at corpus scale, with PLANTED ground
  * truth: N embeddings in groups of 10 — offset 0 draws a fresh
  * mixture vector ([[ContestCorpus.mixtureVec]] shape: hashed Gaussian
  * centers, the separation of real embedding corpora), offsets 1-2 are
  * exact copies, 3-4 are tiny-jitter near-dups (cos ≥ 0.999 by
  * construction), 5-9 draw independently. Every planted dup shares its
  * source's nearest centroid (the jitter is orders below the
  * inter-centroid gap), so `semanticDedup` must drop offsets 1-4 of
  * every group; independent draws that happen to share a mixture
  * center and cross the threshold are CORRECT drops (that is what
  * semantic dedup is for), reported separately as same-center
  * collateral, not errors.
  *
  * Measures, resumable off parquet caches:
  *   - exact path wall: cluster-keyed pair join, quadratic bounded by
  *     interiors (`nClusters` scales with N — the probe sizes it to
  *     ~N/250 so interiors sit at the SemDeDup paper's operating
  *     shape);
  *   - SRP path wall at the same N (`allowApprox`, in-cluster banded
  *     mining) + its planted recall and exact-agreement (approx drops
  *     are a subset by construction: same verify, mined candidates);
  *   - planted recall for both (offsets 1-4 dropped).
  *
  * Usage: runMain graft.tools.SemDedupScaleProbe [N] [nClusters] [minCos]
  * Caches under /tmp/graft_semdedup_scale_<N>.
  */
object SemDedupScaleProbe {

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
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val nClusters = if (args.length > 1) args(1).toInt else math.max(16, (n / 250).toInt)
    val minCos = if (args.length > 2) args(2).toDouble else 0.99
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val root = s"/tmp/graft_semdedup_scale_$n"

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 4).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def exists(p: String) = new java.io.File(s"$p/_SUCCESS").exists()

    // ---- synthesize (deterministic in id) ----
    val embPath = s"$root/emb"
    if (!exists(embPath)) timed("synthesize_emb") {
      spark.range(0, n, 1, cpus.toInt * 4)
        .map { id =>
          val group = id / 10
          val offset = (id % 10).toInt
          // source RNG keyed on the group, unique RNG on the id — the
          // disjoint-domain lesson from DedupScaleProbe's planting bug
          val src = new java.util.Random(group * 6364136223846793005L + 1442695040888963407L)
          val v =
            if (offset <= 2) ContestCorpus.mixtureVec(src)
            else if (offset <= 4) {
              val s = ContestCorpus.mixtureVec(src)
              val j = new java.util.Random(id * -7046029254386353131L + 7L)
              s.map(x => x + 0.002f * j.nextGaussian().toFloat)
            } else {
              val u = new java.util.Random(id * 0x9E3779B97F4A7C15L + 13L)
              ContestCorpus.mixtureVec(u)
            }
          (id, v)
        }
        .toDF("id", "vec")
        .write.mode("overwrite").parquet(embPath)
    }
    val emb = spark.read.parquet(embPath)

    def plantedMetrics(tag: String, path: String): Unit = {
      val res = spark.read.parquet(path)
      val off = pmod(col("id"), lit(10L))
      val row = res.agg(
        avg(when(off.between(1, 4), lit(1.0) - col("kept"))).as("planted_drop"),
        avg(when(off === 0 || off >= 5, lit(1.0) - col("kept"))).as("other_drop"))
        .collect()(0)
      println(f"$tag PLANTED drop-recall=${row.getDouble(0)}%.4f same-center-collateral=${row.getDouble(1)}%.4f")
    }

    // ---- exact path (params-stamped: minCos is a documented CLI arg
    // and changes the drop set — an unstamped resume reported the OLD
    // threshold's drops under the new run's labels; ProbeHarness) ----
    import ProbeHarness.{freshFor, stamp}
    val ddParams = s"minCos=$minCos"
    val exactPath = s"$root/exact_$nClusters"
    if (!freshFor(exactPath, ddParams)) timed(s"semdedup_exact_nc$nClusters") {
      Dedup.semanticDedup(emb, "id", "vec", nClusters = nClusters, minCosine = minCos)
        .write.mode("overwrite").parquet(exactPath)
      Dedup.releaseCaches(blocking = true)
      stamp(exactPath, ddParams)
    }
    plantedMetrics("EXACT", exactPath)

    // ---- SRP path (in-cluster banded mining, same verify) ----
    val approxPath = s"$root/approx_$nClusters"
    if (!freshFor(approxPath, ddParams)) timed(s"semdedup_srp_nc$nClusters") {
      Dedup.semanticDedup(emb, "id", "vec", nClusters = nClusters, minCosine = minCos,
          lshAbove = 1, allowApprox = true, sizeHint = Some(n))
        .write.mode("overwrite").parquet(approxPath)
      Dedup.releaseCaches(blocking = true)
      stamp(approxPath, ddParams)
    }
    plantedMetrics("SRP", approxPath)

    // approx drops ⊆ exact drops (mined candidates, identical verify)
    timed("agreement") {
      val de = spark.read.parquet(exactPath).filter(col("kept") === 0).select("id")
      val da = spark.read.parquet(approxPath).filter(col("kept") === 0).select("id")
      val extra = da.join(de, Seq("id"), "left_anti").count()
      val missed = de.join(da, Seq("id"), "left_anti").count()
      println(s"AGREEMENT: approx-extra=$extra (must be 0) approx-missed=$missed")
    }
    println(s"FINAL driver heap: ${heapMb()} MB")
    spark.stop()
  }
}
