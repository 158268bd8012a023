package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multi-executor measurement of the band-group knob's CLUSTER claim.
  *
  * `Dedup.minhashLshCandidates(bandGroups = g)` runs the banding
  * exchange as g sequential passes, each shuffling 1/g of the band
  * keys and releasing its shuffle files + banded cache before the next
  * pass allocates. On one node that fits a mine whose one-shot shuffle
  * exceeds local scratch (measured at 100M docs, BASELINE.md); the
  * CLUSTER form of the claim — per-EXECUTOR scratch is capped at 1/g
  * of the one-shot footprint — was, until this probe, arithmetic. Here
  * it runs under `local-cluster[2,8,…]` (real separate executor JVMs
  * writing real shuffle files to their own block-manager dirs) with a
  * disk high-water sampler over every spark scratch dir, so the
  * reported number IS peak transient disk, not a model of it.
  *
  * Also asserts the semantic invariant the knob promises: the pair set
  * is IDENTICAL across g (same count, same set hash).
  *
  * Usage: runMain graft.tools.BandClusterProbe [nDocs] [g]
  * (needs SPARK_SCALA_VERSION=2.13 for the executor launcher)
  */
object BandClusterProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val g = if (args.length > 1) args(1).toInt else 4
    val root = s"/tmp/graft_bandprobe_$n"

    val spark = graft.GraftConf.tuned(SparkSession.builder())
      .master("local-cluster[2,8,4096]")
      .config("spark.executor.memory", "2g")
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      .config("spark.executor.extraJavaOptions", "--add-modules=jdk.incubator.vector")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- deterministic grouped corpus (DedupScaleProbe's shape,
    // uniform law): groups of 20, offsets 0-5 near-identical ----
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val docsPath = s"$root/docs"
    if (!new java.io.File(s"$docsPath/_SUCCESS").exists()) {
      spark.range(0, n, 1, 64).mapPartitions { it =>
        it.map { id =>
          val group = id / 20
          val offset = (id % 20).toInt
          val len = 30 + (mix(group * 31 + 7) & 0x7fffffff).toInt % 60
          val sb = new java.lang.StringBuilder(len * 7)
          var pos = 0
          while (pos < len) {
            if (pos > 0) sb.append(' ')
            val tok =
              if (offset > 5) "w" + ((mix(mix(id ^ 0x55AAL) + pos) & 0x7fffffffL) % 50000)
              else "w" + ((mix(mix(group ^ 0x0F0FL) + pos) & 0x7fffffffL) % 50000)
            sb.append(tok)
            pos += 1
          }
          (id, sb.toString)
        }
      }.toDF("doc_id", "text").write.mode("overwrite").parquet(docsPath)
    }
    val docs = spark.read.parquet(docsPath)

    // ---- disk high-water sampler over every spark scratch dir the
    // driver AND both executor JVMs write (blockmgr-* shuffle/cache
    // files, spark-* temp) ----
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir", "/tmp"))
    def scratchBytes(): Long = {
      def du(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(du).sum).getOrElse(0L)
      Option(tmp.listFiles()).map(_.toSeq).getOrElse(Nil)
        .filter(f => f.isDirectory &&
          (f.getName.startsWith("blockmgr-") || f.getName.startsWith("spark-")))
        .map(du).sum
    }
    @volatile var sampling = false
    @volatile var peak = 0L

    def measure(tag: String, bandGroups: Int): (Long, Long, Long, Double) = {
      val base = scratchBytes() // corpus-independent floor
      peak = 0L; sampling = true
      val t = new Thread(() => {
        while (sampling) {
          val b = scratchBytes(); if (b > peak) peak = b; Thread.sleep(250)
        }
      })
      t.start()
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup.minhashLshCandidates(
        docs, "doc_id", "text", numHashes = 16, bands = 4, shingleSize = 3,
        bandGroups = bandGroups)
      // one deterministic digest of the whole pair set — count alone
      // could mask a wrong-pairs bug that preserves cardinality
      val agg = pairs
        .agg(count(lit(1)).cast("long"),
          sum(hash(col("doc_a"), col("doc_b")).cast("long")).cast("long"))
        .head
      val wall = (System.nanoTime() - t0) / 1e9
      sampling = false
      t.join()
      graft.operators.CacheRegistry.releaseAll(blocking = true)
      System.gc(); Thread.sleep(500)
      val p = math.max(0L, peak - base)
      println(f"PROBE band_g$bandGroups%d ($tag): pairs=${agg.getLong(0)} " +
        f"setHash=${agg.getLong(1)} peakScratchMB=${p / 1048576}%d wall=$wall%.1f s")
      (agg.getLong(0), agg.getLong(1), p, wall)
    }

    val one = measure("one-shot", 1)
    val grp = measure(s"$g-pass", g)
    require(one._1 == grp._1 && one._2 == grp._2,
      s"band-sequential pair set diverged: ${one._1}/${one._2} vs ${grp._1}/${grp._2}")
    val ratio = one._3.toDouble / math.max(1L, grp._3)
    println(f"PROBE band groups: identical pair sets; peak scratch " +
      f"${one._3 / 1048576}%d MB -> ${grp._3 / 1048576}%d MB ($ratio%.2fx reduction at g=$g)")
    spark.stop()
  }
}
