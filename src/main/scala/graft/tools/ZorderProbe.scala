package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Zorder

/** Measures the file-pruning geometry of a z-order layout of `orders`
  * on (o_custkey, o_totalprice) against the two single-column sorted
  * layouts it replaces: for a point probe on each dimension, how many
  * files COULD contain matches per their own min/max stats (the exact
  * statistic Parquet row-group/file pruning consults).
  *
  *   runMain graft.tools.ZorderProbe [sfDir] [files]
  */
object ZorderProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nFiles = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder_probe").toString
    val zPath = s"$tmp/z"
    val kPath = s"$tmp/bykey"
    val pPath = s"$tmp/byprice"

    var t0 = System.nanoTime()
    Zorder.layout(orders, "o_custkey", "o_totalprice", zPath, files = nFiles)
    println(f"LAYOUT z-order: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    t0 = System.nanoTime()
    orders.repartitionByRange(nFiles, col("o_custkey"))
      .sortWithinPartitions("o_custkey").write.parquet(kPath)
    orders.repartitionByRange(nFiles, col("o_totalprice"))
      .sortWithinPartitions("o_totalprice").write.parquet(pPath)
    println(f"LAYOUT 2 sorted replicas: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val custKey = orders.select(max(col("o_custkey"))).head().getLong(0) / 2
    val (pLo, pHi) = (100000.0, 110000.0)

    def overlap(path: String, c: String, lo: Double, hi: Double): (Long, Long) = {
      val st = Zorder.fileStats(spark, path, c)
      (st.filter(col("lo") <= hi && col("hi") >= lo).count(), st.count())
    }
    def report(name: String, path: String): Unit = {
      val (ck, nf) = overlap(path, "o_custkey", custKey.toDouble, custKey.toDouble)
      val (pr, _) = overlap(path, "o_totalprice", pLo, pHi)
      println(s"FILES $name: custkey-point $ck/$nf  price-range $pr/$nf")
    }
    report("zorder", zPath)
    report("sorted_by_custkey", kPath)
    report("sorted_by_price", pPath)
    spark.stop()
  }
}
