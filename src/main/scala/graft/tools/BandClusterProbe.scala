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
    // uniform law): groups of 20, offsets 0-5 near-identical. ONE
    // splitmix64 finalizer (byte-identical delegation, same rule as
    // DedupScaleProbe — a drifted copy would silently diverge this
    // probe's cached corpus from the others') ----
    def mix(z0: Long): Long = org.apache.spark.sql.graft.TextHashUtil.mix64(z0)
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

    // ---- disk high-water sampler, PER scratch dir: blockmgr-*/spark-*
    // dirs are per-JVM (driver + one per executor), so the per-dir
    // peak is the per-executor scratch the claim is actually about — a
    // fleet-total sum would mask a skewed executor individually
    // exceeding the cap ----
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir", "/tmp"))
    def scratchByDir(): Map[String, Long] = {
      def du(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).map(_.map(du).sum).getOrElse(0L)
      // standalone/local-cluster nests every JVM's scratch under ONE
      // /tmp/spark-<app>/ dir — per-JVM attribution needs the
      // blockmgr-<uuid> dirs inside it (one per block manager = one
      // per JVM; shuffle files and disk-cached blocks both live
      // there). Residue outside any blockmgr (broadcast staging,
      // userFiles) is lumped per top dir as "<top>/other".
      def blockMgrs(d: java.io.File, depth: Int): Seq[java.io.File] =
        if (d.getName.startsWith("blockmgr-")) Seq(d)
        else if (depth >= 3 || !d.isDirectory) Nil
        else Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
          .filter(_.isDirectory).flatMap(blockMgrs(_, depth + 1))
      val tops = Option(tmp.listFiles()).map(_.toSeq).getOrElse(Nil)
        .filter(f => f.isDirectory &&
          (f.getName.startsWith("blockmgr-") || f.getName.startsWith("spark-")))
      tops.flatMap { top =>
        val bms = blockMgrs(top, 0)
        val bmSizes = bms.map(b => b.getName -> du(b))
        val rest = du(top) - bmSizes.map(_._2).sum
        bmSizes :+ (s"${top.getName}/other" -> math.max(0L, rest))
      }.toMap
    }
    def totalOf(m: Map[String, Long]): Long = m.values.sum
    @volatile var sampling = false

    // ContextCleaner unlinks a finished mode's shuffle files
    // asynchronously (GC-driven) — measuring the next mode against a
    // baseline that still CONTAINS them would understate its peak by
    // whatever the cleaner removes mid-run. Settle until the scratch
    // total is stable across consecutive samples before baselining.
    def settle(): Unit = {
      graft.operators.CacheRegistry.releaseAll(blocking = true)
      var last = -1L
      var stable = 0
      var i = 0
      while (stable < 4 && i < 60) {
        System.gc()
        Thread.sleep(250)
        val b = totalOf(scratchByDir())
        if (b == last) stable += 1 else { stable = 0; last = b }
        i += 1
      }
    }

    case class Meas(pairs: Long, setHash: Long, peakTotal: Long,
      peakPerJvm: Long, wall: Double)

    def measure(tag: String, bandGroups: Int): Meas = {
      settle()
      val base = scratchByDir()
      val peaks = scala.collection.concurrent.TrieMap.empty[String, Long]
      sampling = true
      val t = new Thread(() => {
        while (sampling) {
          scratchByDir().foreach { case (d, b) =>
            val delta = math.max(0L, b - base.getOrElse(d, 0L))
            if (delta > peaks.getOrElse(d, 0L)) peaks(d) = delta
          }
          Thread.sleep(250)
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
      val perJvm = peaks.toMap
      val m = Meas(agg.getLong(0), agg.getLong(1),
        perJvm.values.sum, perJvm.values.foldLeft(0L)(math.max), wall)
      println(f"PROBE band_g$bandGroups%d ($tag): pairs=${m.pairs} " +
        f"setHash=${m.setHash} peakTotalMB=${m.peakTotal / 1048576}%d " +
        f"peakPerJvmMB=${m.peakPerJvm / 1048576}%d wall=$wall%.1f s")
      println("PROBE   per-dir peaks: " + perJvm.toSeq.sortBy(-_._2)
        .take(5).map { case (d, b) => s"$d=${b / 1048576}MB" }.mkString("  "))
      m
    }

    // discarded warm-up: the first job pays executor launch, codegen,
    // and cold parquet reads — letting the one-shot arm absorb that
    // would bias the wall comparison in the sequential arm's favor
    graft.operators.Dedup.minhashLshCandidates(
      docs.limit(50000), "doc_id", "text", numHashes = 16, bands = 4,
      shingleSize = 3).count()
    graft.operators.CacheRegistry.releaseAll(blocking = true)

    val one = measure("one-shot", 1)
    val grp = measure(s"$g-pass", g)
    require(one.pairs == grp.pairs && one.setHash == grp.setHash,
      s"band-sequential pair set diverged: ${one.pairs}/${one.setHash} " +
        s"vs ${grp.pairs}/${grp.setHash}")
    val rTotal = one.peakTotal.toDouble / math.max(1L, grp.peakTotal)
    val rJvm = one.peakPerJvm.toDouble / math.max(1L, grp.peakPerJvm)
    println(f"PROBE band groups: identical pair sets; peak scratch " +
      f"total ${one.peakTotal / 1048576}%d -> ${grp.peakTotal / 1048576}%d MB " +
      f"($rTotal%.2fx), worst single JVM ${one.peakPerJvm / 1048576}%d -> " +
      f"${grp.peakPerJvm / 1048576}%d MB ($rJvm%.2fx) at g=$g")
    spark.stop()
  }
}
