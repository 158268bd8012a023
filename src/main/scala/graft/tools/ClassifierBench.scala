package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B of hashed-linear classifier inference: interpreted HOF
  * composition (two lambda evals per TOKEN through Catalyst's HOF
  * evaluator) vs the native `classifier_milli_sum` codegen kernel (one
  * call per document, precomputed weight table, one md5 + one array
  * read per token). Both arms compute the identical exact long sum and
  * must agree on checksum aggregates — value parity at scale on top of
  * TextFunctionsSpec's per-row check.
  *
  * Usage: runMain graft.tools.ClassifierBench [nDocs]
  */
object ClassifierBench {

  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val dim = 4096
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = s"/tmp/graft_classifier_bench_$n"
    val docsPath = s"$root/docs"
    if (!new java.io.File(s"$docsPath/_SUCCESS").exists()) timed("synthesize_docs") {
      spark.range(0, n, 1, cpus.toInt * 4)
        .mapPartitions { it =>
          def mix(z: Long): Long = org.apache.spark.sql.graft.TextHashUtil.mix64(z)
          it.map { id =>
            val len = 30 + (mix(id * 31 + 7) & 0x7fffffff).toInt % 90
            val sb = new java.lang.StringBuilder(len * 7)
            var pos = 0
            while (pos < len) {
              if (pos > 0) sb.append(' ')
              sb.append("w").append((mix(mix(id) + pos) & 0x7fffffffL) % 50000)
              pos += 1
            }
            (id, sb.toString)
          }
        }.toDF("doc_id", "text").write.mode("overwrite").parquet(docsPath)
    }
    val docs = spark.read.parquet(docsPath)
      .withColumn("toks", graft.functions.TextFunctions.tokens(col("text")))

    def wm(t: org.apache.spark.sql.Column) = {
      val idx = pmod(graft.functions.TextFunctions.hash60(t, 131), lit(dim.toLong))
      pmod(graft.functions.TextFunctions.hash60(idx.cast("string"), 137),
        lit(2001L)) - lit(1000L)
    }
    def checksum(scoreCol: org.apache.spark.sql.Column): (Long, Long) = {
      val r = docs.select(scoreCol.as("s"))
        .agg(sum(col("s")).cast("long"), sum(abs(col("s"))).cast("long")).head
      (r.getLong(0), r.getLong(1))
    }

    // warm BOTH arms untimed (each pays its own one-time Catalyst
    // analysis / codegen compile; parquet page cache shared)
    checksum(graft.functions.TextFunctions.classifierScoreMilli(col("toks"), dim))
    checksum(aggregate(col("toks"), lit(0L), (acc, t) => acc + wm(t)))

    val native = timed("native_kernel") {
      checksum(graft.functions.TextFunctions.classifierScoreMilli(col("toks"), dim))
    }
    val hof = timed("hof_composition") {
      checksum(aggregate(col("toks"), lit(0L), (acc, t) => acc + wm(t)))
    }
    require(native == hof, s"value divergence: native $native vs hof $hof")
    println(s"CHECKSUMS agree: $native over $n docs")

    // broadcast-weights arm: the REAL trained model's serving shape
    // (ClassifierMilliSumWeights — plan-resident long[dim] reference
    // object instead of the hash-derived table; the per-row work is
    // one md5 + one array read per token EITHER way, so this measures
    // the shape's cost, not a different algorithm). Train cost is
    // timed separately — it's the one-time pass a real pipeline pays
    // per model version, not per scoring run.
    val weights = timed("train_gopher_labels") {
      graft.operators.QualityClassifier.train(
        spark.read.parquet(docsPath), dim)
    }
    // warm untimed, then measure
    checksum(graft.functions.TextFunctions.classifierScoreMilliTrained(col("toks"), weights))
    val trained = timed("broadcast_weights_kernel") {
      checksum(graft.functions.TextFunctions.classifierScoreMilliTrained(col("toks"), weights))
    }
    println(s"TRAINED checksum: $trained over $n docs " +
      s"(nonzero weights: ${weights.count(_ != 0L)}/$dim)")
    spark.stop()
  }
}
