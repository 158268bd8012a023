package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  /** Synthesize a mini lineitem/orders pair under a temp "sf dir" so the
    * operator's parquet-in contract is exercised end to end. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_bkt_spec").toString
    val rnd = new scala.util.Random(7)
    (1L to 400L).map(k => (k, s"P${k % 5}"))
      .toDF("o_orderkey", "o_orderpriority")
      .write.parquet(s"$d/orders.parquet")
    (1 to 2000).map { i =>
      val k = rnd.nextInt(400) + 1L
      (k, 10.0 + rnd.nextInt(90), rnd.nextInt(10) / 100.0)
    }.toDF("l_orderkey", "l_extendedprice", "l_discount")
      .write.parquet(s"$d/lineitem.parquet")
    d
  }

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }.size

  private def plainRevenue() = {
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .cast("decimal(28,6)")), 2).cast("double").as("revenue"))
  }

  test("bucketed join matches the plain join exactly") {
    val got = Bucketing.revenuePerOrder(spark, dir, buckets = 8)
    assert(got.exceptAll(plainRevenue()).isEmpty && plainRevenue().exceptAll(got).isEmpty)
  }

  test("join + key-rooted aggregation plan with zero Exchange") {
    // force the sort-merge path (a broadcast join would also be
    // exchange-free but would not be demonstrating bucketing)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Bucketing.revenuePerOrder(spark, dir, buckets = 8)
      assert(shuffleCount(df) === 0,
        s"expected zero Exchange, plan:\n${df.queryExecution.executedPlan}")
      // and the same pipeline over the raw parquet shuffles — the
      // baseline the bucketed layout eliminates
      assert(shuffleCount(plainRevenue()) > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("a regenerated source GCs the superseded bucketed copy (no /tmp leak)") {
    import graft.sources.ParquetMeta
    val d = Files.createTempDirectory("graft_bkt_gc").toString
    def writeSource(): Unit =
      (1L to 50L).map(k => (k, s"P${k % 3}"))
        .toDF("o_orderkey", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$d/orders.parquet")
    def generations(): Seq[String] = {
      val prefix = ParquetMeta.storePrefix(d, "orders")
      Option(new java.io.File("/tmp/graft_bucketed").listFiles())
        .getOrElse(Array.empty).toSeq
        .map(_.getName).filter(n => n.startsWith(prefix) && n.endsWith("_o_orderkey_b4"))
    }
    writeSource()
    Bucketing.bucketedTable(spark, d, "orders", "o_orderkey", buckets = 4)
    val gen1 = generations()
    assert(gen1.size == 1)
    // regenerate the source (new fingerprint) and rebuild: the stale
    // generation's full copy must be reclaimed, not accumulate forever
    Thread.sleep(1100) // ensure a new mtime second even on coarse clocks
    writeSource()
    Bucketing.bucketedTable(spark, d, "orders", "o_orderkey", buckets = 4)
    val gen2 = generations()
    assert(gen2.size == 1, s"stale generations left behind: $gen2")
    assert(gen2 != gen1)
  }

  test("fresh catalog re-registers existing bucketed files via DDL, still co-located") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val before = Bucketing.revenuePerOrder(spark, dir, buckets = 8).collect().toSet
      // simulate a new session: catalog entries gone, files still on disk
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("graft_bkt_"))
        .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
      val again = Bucketing.revenuePerOrder(spark, dir, buckets = 8)
      assert(shuffleCount(again) === 0)
      assert(again.collect().toSet === before)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }
}
