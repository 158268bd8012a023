package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{HybridKnn, KnnJoin}
import graft.sources.ContestBinaryIO

/** The contest lifecycle end-to-end — the Spark equivalent of the
  * reference's `hybrid_search` binary (baseline.cpp:27-171): read the
  * contest binary base + query files, run the routed BatchSearch
  * composition, write `output.bin`, and score recall against the exact
  * oracle (the reference's generate_groundtruth + GetKNNRecall,
  * utils.h:80-253).
  *
  *   sbt "runMain graft.tools.ContestRun [dataPath queryPath outPath k]"
  *
  * Defaults run the reference's checked-in dummy workload (10k × 100).
  */
object ContestRun {
  def main(args: Array[String]): Unit = {
    val dataPath = if (args.length > 0) args(0) else "/root/reference/dummy-data.bin"
    val queryPath = if (args.length > 1) args(1) else "/root/reference/dummy-queries.bin"
    val outPath = if (args.length > 2) args(2) else "/tmp/graft_contest_output.bin"
    val k = if (args.length > 3) args(3).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var t0 = System.nanoTime()
    val base = ContestBinaryIO.readBase(spark, dataPath, 100, cpus.toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = ContestBinaryIO.readQueries(spark, queryPath, 100, 2)
    val nb = base.count(); val nq = queries.count()
    println(f"READ: base=$nb queries=$nq in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // routed approximate BatchSearch (the production configuration)
    t0 = System.nanoTime()
    val ann = HybridKnn.execute(base, queries, k, ann = true,
      annEf = 400, annBuckets = math.max(2, (nb / 4096).toInt))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nres = ann.count()
    println(f"SEARCH(ann): $nres rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    t0 = System.nanoTime()
    val nested = ann.groupBy("qid").agg(
      expr("transform(array_sort(collect_list(struct(rank, nid))), x -> x.nid)")
        .as("neighbors"))
    ContestBinaryIO.writeKnn(nested, outPath, k)
    println(f"WRITE: $outPath in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // exact oracle + mean recall@k (GetKNNRecall)
    t0 = System.nanoTime()
    val exact = KnnJoin.exactFlat(base, queries, k)
    val recall = graft.operators.AnnJoin.recallAtK(ann, exact)
    println(f"RECALL@$k vs exact oracle: $recall%.4f (in ${(System.nanoTime() - t0) / 1e9}%.1f s)")
    spark.stop()
  }
}
