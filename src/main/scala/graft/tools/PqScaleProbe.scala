package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AnnJoin, KnnJoin, SimilaritySearch}

/** PQ-ADC vs full-vector brute force at embedding-corpus scale: N
  * mixture vectors (dim 64 — the testdata embeddings shape), NQ
  * queries, k=10. Measures the stage walls (encode, ADC scan + refine,
  * exact scan) and recall@k of the ADC path vs the exact — the
  * evidence for when the m-int code scan beats the dim-float scan.
  *
  * Round-9 extension: IVF-PQ arms (seeded + residual-trained) at the
  * same operating point — the composition the flat-PQ findings call
  * for. Measures whether (a) routing turns the never-wins brute ADC
  * scan into a sub-exact-wall scan (it touches nprobe/nlist of the
  * corpus), and (b) residual encoding moves the bits/dim recall
  * threshold down (the codebook only resolves one list's spread).
  *
  * Usage: runMain graft.tools.PqScaleProbe [N] [NQ] [m] [ksub] [refineK] [nlist] [nprobe]
  * (nlist = 0 skips the IVF-PQ arms.)
  */
object PqScaleProbe {

  private val dim = 64

  private def timed[T](name: String)(f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"STAGE $name: $s%.1f s")
    (r, s)
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val nq = if (args.length > 1) args(1).toLong else 100L
    val m = if (args.length > 2) args(2).toInt else 4
    val ksub = if (args.length > 3) args(3).toInt else 256
    val refineK = if (args.length > 4) args(4).toInt else 100
    val nlist = if (args.length > 5) args(5).toInt else 256
    val nprobe = if (args.length > 6) args(6).toInt else 8
    val k = 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // mixture corpus (1024 hashed centers, σ=0.08) — same regime as
    // ContestCorpus, at the embeddings dim
    val nClusters = 1024
    val dimV = dim
    val base = spark.range(0, n, 1, cpus.toInt * 2)
      .mapPartitions(_.map { id =>
        val r = new java.util.Random(id * 6364136223846793005L + 7L)
        val c = r.nextInt(nClusters)
        val vec = Array.tabulate(dimV) { d =>
          var z = c.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          (((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble).toFloat +
            0.08f * r.nextGaussian().toFloat
        }
        (id, vec)
      })
      .toDF("id", "vec")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"BASE: ${base.count()} rows dim $dim")
    // stride sampling needs a stride the modulus-3 pick can actually
    // select from; nq near/above n would divide by zero or match nothing
    require(n >= 4L * nq, s"nq=$nq must be <= n/4 (n=$n) for stride sampling")
    val queries = base.filter(col("id") % (n / nq) === 3)
      .select(col("id").as("qid"), col("vec").as("qvec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"QUERIES: ${queries.count()}")

    val (pq, pqSec) = timed(s"pq_adc_seeded_m${m}_ksub$ksub") {
      val r = SimilaritySearch.pqKnnSeeded(base, queries, k, m, ksub, refineK)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      r.count(); r
    }
    val (pqT, pqTSec) = timed(s"pq_adc_trained_m${m}_ksub$ksub") {
      val r = SimilaritySearch.pqKnnTrained(base, queries, k, m, ksub, refineK)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      r.count(); r
    }
    val ivfArms: Seq[(String, org.apache.spark.sql.DataFrame, Double)] =
      if (nlist <= 0) Seq.empty
      else {
        val (is, isSec) = timed(s"ivfpq_seeded_nlist${nlist}_nprobe$nprobe") {
          val r = SimilaritySearch.ivfPqKnnSeeded(base, queries, k,
            nlist, nprobe, m, ksub, refineK)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          r.count(); r
        }
        val (it, itSec) = timed(s"ivfpq_trained_nlist${nlist}_nprobe$nprobe") {
          val r = SimilaritySearch.ivfPqKnnTrained(base, queries, k,
            nlist, nprobe, m, ksub, refineK)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          r.count(); r
        }
        Seq(("ivfpq_seeded", is, isSec), ("ivfpq_trained", it, itSec))
      }
    // 1-bit binary quantization at the same operating point: no
    // training, Hamming candidate scan (dim/8 bytes/row vs 4·dim fp32),
    // exact re-rank — where the 32× code shrink lands on the same
    // recall/wall axes as the PQ arms.
    val (bq, bqSec) = timed(s"bq_hamming_refine$refineK") {
      val r = graft.operators.Quantization.bqKnn(base, queries, k, refineK)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      r.count(); r
    }
    val (exact, exactSec) = timed("exact_bruteforce") {
      val r = KnnJoin.exactFlat(
        base.withColumn("label", lit(0L)).withColumn("ts", lit(0.0)),
        queries.withColumn("qtype", lit(0)).withColumn("v", lit(0L))
          .withColumn("l", lit(0.0)).withColumn("r", lit(0.0)), k)
        .filter(col("nid") =!= col("qid"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      r.count(); r
    }
    val recallB = AnnJoin.recallAtK(bq, exact)
    println(f"RECALL@$k bq_1bit: $recallB%.4f ($bqSec%.1f s)")
    val recallS = AnnJoin.recallAtK(pq, exact)
    val recallT = AnnJoin.recallAtK(pqT, exact)
    println(f"RECALL@$k seeded: $recallS%.4f (${pqSec}%.1f s)  trained: $recallT%.4f (${pqTSec}%.1f s)  exact=${exactSec}%.1f s")
    ivfArms.foreach { case (name, df, sec) =>
      val r = AnnJoin.recallAtK(df, exact)
      println(f"RECALL@$k $name: $r%.4f ($sec%.1f s, scan fraction ${nprobe.toDouble / nlist}%.4f)")
    }
    spark.stop()
  }
}
