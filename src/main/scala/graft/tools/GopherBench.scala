package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B of the Gopher quality-rule scan: interpreted HOF composition vs
  * the native gopher_stats codegen kernel, over a synthesized corpus
  * (default 10M docs) that exercises every rule — stopwords, symbols,
  * ellipses, newline-separated bullet lines. Both arms compute the same
  * four per-word statistics and must agree on checksum aggregates
  * (value parity at scale, on top of GopherStatsSpec's property check);
  * the native arm additionally emits the full widened bundle to show
  * the extra rules ride the same single pass.
  *
  * Usage: runMain graft.tools.GopherBench [nDocs]
  */
object GopherBench {

  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = s"/tmp/graft_gopher_bench_$n"
    def exists(p: String) = new java.io.File(s"$p/_SUCCESS").exists()
    val docsPath = s"$root/docs"
    if (!exists(docsPath)) timed("synthesize_docs") {
      spark.range(0, n, 1, cpus.toInt * 4)
        .mapPartitions { it =>
          val stop = Array("the", "of", "and", "to", "in", "a", "is", "that")
          def mix(z: Long): Long = org.apache.spark.sql.graft.TextHashUtil.mix64(z)
          it.map { id =>
            val len = 40 + (mix(id * 31 + 7) & 0x7fffffff).toInt % 80
            val sb = new java.lang.StringBuilder(len * 7)
            var pos = 0
            while (pos < len) {
              val h = mix(id * 1000003L + pos)
              val sel = (h & 0x7fffffff) % 100
              if (pos > 0) sb.append(if (sel < 7) '\n' else ' ')
              if (sel < 4 && pos > 0) sb.append("- ") // bullet line starts
              if (sel < 20) sb.append(stop(((h >>> 33) % 8).toInt))
              else if (sel < 23) sb.append("#tag" + (h & 0xff))
              else if (sel < 26) sb.append("w" + (h & 0xffff) + "...")
              else sb.append("w" + ((h >>> 16) & 0x3ffff))
              pos += 1
            }
            (id, sb.toString)
          }
        }
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(docsPath)
    }
    val docs = spark.read.parquet(docsPath)
    println(s"CORPUS: ${docs.count()} docs")

    // checksum aggregates force full evaluation of every statistic and
    // double as the at-scale parity check between the two arms
    def checksum(df: org.apache.spark.sql.DataFrame): Seq[Any] = df.agg(
      sum(col("n_words")), sum(col("n_stop")),
      sum(round(col("mean_wlen"), 4)), sum(round(col("alpha_frac"), 4)))
      .head().toSeq

    def hofArm() = {
      val stopW = Seq("the", "of", "and", "to", "in", "a", "is", "that")
      val toks = col("toks")
      val nW = size(toks).cast("long")
      docs.select(col("doc_id"),
          filter(split(col("text"), " "), x => x =!= lit("")).as("toks"))
        .select(col("doc_id"), nW.as("n_words"),
          when(nW > 0, aggregate(transform(toks, t => length(t).cast("long")), lit(0L), _ + _)
            .cast("double") / nW.cast("double")).otherwise(lit(0.0)).as("mean_wlen"),
          when(nW > 0, size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("double")
            / nW.cast("double")).otherwise(lit(0.0)).as("alpha_frac"),
          size(filter(toks, t => lower(t).isin(stopW.map(x => x: Any): _*)))
            .cast("long").as("n_stop"))
    }

    def nativeArm(full: Boolean) = {
      import org.apache.spark.sql.graft.{GopherStatsUtil => G}
      val st = col("st")
      def slot(i: Int) = element_at(st, i + 1)
      val nW = slot(G.NWords)
      def overWords(c: org.apache.spark.sql.Column) =
        when(nW > 0, c.cast("double") / nW.cast("double")).otherwise(lit(0.0))
      val base = docs.select(col("doc_id"),
          graft.functions.TextFunctions.gopherStats(col("text")).as("st"))
        .select(col("doc_id"), nW.as("n_words"),
          overWords(slot(G.SumWlen)).as("mean_wlen"),
          overWords(slot(G.NAlphaWords)).as("alpha_frac"),
          slot(G.NStop).as("n_stop"),
          (if (full) overWords(slot(G.NHash) + slot(G.NEllipsis)) else lit(0.0)).as("sym_ratio"),
          (if (full) slot(G.NBulletLines).cast("double") / slot(G.NLines).cast("double")
           else lit(0.0)).as("bullet_frac"))
      base
    }

    // warm both paths once (JIT/codegen), then time
    hofArm().limit(1000).agg(sum(col("n_words"))).collect()
    nativeArm(full = true).limit(1000).agg(sum(col("n_words"))).collect()

    var csHof: Seq[Any] = null
    var csNat: Seq[Any] = null
    timed("hof_interpreted") { csHof = checksum(hofArm()) }
    timed("native_kernel") { csNat = checksum(nativeArm(full = false)) }
    timed("native_kernel_full_bundle") {
      val df = nativeArm(full = true)
      println("  full-bundle checksum: " + df.agg(
        sum(col("n_words")), sum(round(col("sym_ratio"), 4)),
        sum(round(col("bullet_frac"), 4))).head().toSeq)
    }
    println(s"HOF    checksum: $csHof")
    println(s"NATIVE checksum: $csNat")
    // Long components compare exactly; the two Double components are
    // sums of rounded per-row values aggregated by two INDEPENDENT
    // jobs, and double addition is non-associative — the shuffle's
    // partial-merge order can move the last ulp, so exact == here was
    // a false-positive abort waiting to happen at scale. 1e-9 relative
    // still catches any real semantic divergence (per-row parity is
    // additionally spec-asserted exactly).
    def close(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Double, y: Double) =>
        math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
      case (x, y) => x == y
    }
    require(csHof.length == csNat.length && csHof.lazyZip(csNat).forall(close),
      "arms disagree at scale")
    println("PARITY: ok")
    spark.stop()
  }
}
