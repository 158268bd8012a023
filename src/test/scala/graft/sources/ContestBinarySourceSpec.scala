package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The DSv2 reader against the reference's own dummy fixtures: row-for-row
  * parity with the V1 mapPartitions reader, and the F4 projection split
  * happening at the SCAN (pruned ReadSchema, no vector materialization). */
class ContestBinarySourceSpec extends SparkSpec {

  private val dataPath = "/root/reference/dummy-data.bin"
  private val queryPath = "/root/reference/dummy-queries.bin"

  private def v2Base = spark.read.format("contest-bin")
    .option("kind", "base").load(dataPath)
  private def v2Query = spark.read.format("contest-bin")
    .option("kind", "query").load(queryPath)

  private def scanSchema(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.readSchema().catalogString
    }.getOrElse(fail("no BatchScanExec in plan"))

  test("base rows match the V1 reader exactly") {
    val v1 = ContestBinaryIO.readBase(spark, dataPath)
    assert(v2Base.count() === v1.count())
    val a = v2Base.orderBy("id").collect()
    val b = v1.orderBy("id").collect()
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) === y.getLong(0))
      assert(x.getLong(1) === y.getLong(1))
      assert(x.getDouble(2) === y.getDouble(2))
      assert(x.getSeq[Float](3) === y.getSeq[Float](3))
    }
  }

  test("query rows match the V1 reader exactly") {
    val v1 = ContestBinaryIO.readQueries(spark, queryPath)
    val a = v2Query.orderBy("qid").collect()
    val b = v1.orderBy("qid").collect()
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.toSeq.take(5) === y.toSeq.take(5))
      assert(x.getSeq[Float](5) === y.getSeq[Float](5))
    }
  }

  test("meta-only projection prunes vec out of the scan (F4 at the source)") {
    val df = v2Base.select(col("label"), col("ts"))
    assert(scanSchema(df) === "struct<label:bigint,ts:double>")
    // and the pruned scan still computes correctly
    val byLabel = df.groupBy("label").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = ContestBinaryIO.readBase(spark, dataPath)
      .groupBy("label").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byLabel === expected)
  }

  test("ordinal ids survive pruning and partitioning") {
    val ids = v2Base.select("id").collect().map(_.getLong(0)).sorted
    assert(ids.head === 0L && ids.last === ids.length - 1L)
    assert(ids.distinct.length === ids.length)
  }
}
