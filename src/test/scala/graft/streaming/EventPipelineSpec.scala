package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val HourNs = 3600L * 1000 * 1000 * 1000

  private def mkEvents(n: Int): Seq[(Long, Long, Long, String, Double)] = {
    val rnd = new scala.util.Random(3)
    Seq.tabulate(n) { i =>
      (i.toLong, i * (HourNs / 50) + rnd.nextInt(1000000).toLong,
        (i % 5).toLong, if (i % 2 == 0) "click" else "view", rnd.nextInt(100).toDouble)
    }
  }

  test("streaming hourlyAgg (complete mode) equals batch hourlyAgg") {
    implicit val sqlCtx = spark.sqlContext
    val data = mkEvents(300)
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val sdf = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventPipeline.hourlyAgg(sdf).writeStream
      .format("memory").queryName("hourly_out").outputMode("complete").start()
    mem.addData(data: _*)
    q.processAllAvailable()
    val streamed = spark.table("hourly_out").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    q.stop()
    val batch = EventPipeline.hourlyAgg(
      data.toDF("event_id", "ts", "user_id", "event_type", "value")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("mapGroupsWithState keeps cumulative per-user totals across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val sdf = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventPipeline.runningUserTotals(sdf).writeStream
      .format("memory").queryName("totals_out").outputMode("update").start()
    mem.addData((0L, 0L, 1L, "click", 2.0), (1L, 1L, 1L, "click", 3.0), (2L, 2L, 2L, "view", 5.0))
    q.processAllAvailable()
    mem.addData((3L, 3L, 1L, "click", 4.0))
    q.processAllAvailable()
    q.stop()
    // last update per user carries the cumulative state
    val last = spark.table("totals_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (u, xs) => u -> xs.maxBy(_._2) }
    assert(last(1L) == (1L, 3L, 9.0))
    assert(last(2L) == (2L, 1L, 5.0))
  }

  test("streaming exact dedup: first occurrence kept, later duplicates dropped across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val sdf = mem.toDF.toDF("doc_id", "text")
    val q = EventPipeline.streamingExactDedup(sdf, "doc_id", "text").writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    mem.addData((0L, "alpha"), (1L, "beta"), (2L, "alpha"))
    q.processAllAvailable()
    mem.addData((3L, "beta"), (4L, "gamma"), (5L, "alpha"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_out").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // one row per distinct content; the FIRST-arrived id wins (ascending
    // arrival here, so it coincides with the batch min-id representative)
    assert(got.size == 3)
    val batch = graft.operators.Dedup.exactGroups(
      Seq((0L, "alpha"), (1L, "beta"), (2L, "alpha"), (3L, "beta"),
        (4L, "gamma"), (5L, "alpha")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == batch)
  }

  test("streaming semantic dedup: any-earlier-similar drops match the batch operator across batches") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(3)
    val base = Array(Array(10f, 0f, 0f), Array(0f, 10f, 0f), Array(0f, 0f, 10f))
    // identical pair per decade (ids 10d, 10d+1) + noisy uniques
    val rows: Seq[(Long, Array[Float])] = (0 until 30).map { i =>
      val v =
        if (i % 10 < 2) base((i / 10) % 3).map(x => x + (i / 10) * 0.01f)
        else base(i % 3).map(x => x + rnd.nextFloat() * 3f)
      (i.toLong, v)
    }
    val batchDf = rows.toDF("id", "vec")
    val cents = graft.operators.SimilaritySearch.seededCentroids(
      batchDf, "id", "vec", 4)
    val tau = 0.9999
    val mem = MemoryStream[(Long, Array[Float])]
    val q = EventPipeline.streamingSemanticDedup(
        mem.toDF.toDF("id", "vec"), "id", "vec", cents, tau)
      .writeStream.format("memory").queryName("semdedup_out")
      .outputMode("append").start()
    // id-ordered arrival split across micro-batches: the duplicate of a
    // pair can arrive batches after its original and must still drop
    mem.addData(rows.take(11): _*)
    q.processAllAvailable()
    mem.addData(rows.slice(11, 21): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(21): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("semdedup_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // ≡ the batch twin (same function, batch mode)
    val twin = EventPipeline.streamingSemanticDedup(batchDf, "id", "vec", cents, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // ≡ the batch operator's kept = 1 rows (same centroids by construction)
    val kept = graft.operators.Dedup.semanticDedup(batchDf, "id", "vec",
        nClusters = 4, minCosine = tau)
      .filter($"kept" === 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == twin, s"stream=$got batch-twin=$twin")
    assert(got == kept, s"stream=$got semanticDedup-kept=$kept")
    // the planted duplicates (higher id of each identical pair) dropped
    assert(Seq(1L, 11L, 21L).forall(id => !got.contains(id)))
    graft.operators.Dedup.releaseCaches()
  }

  test("stream-stream interval join equals its batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val MinNs = 60L * 1000 * 1000 * 1000
    // NOTE times sit one day past the epoch: a row whose event time is
    // <= the current watermark is dropped as late, and the initial
    // watermark is epoch 0 — t0 = 0 would discard the signup itself.
    val t0 = 24L * 60 * MinNs
    // user 1: signup at t0, purchases at +10min (joins) and +2h (outside)
    // user 2: purchase with no signup (drops)
    val data = Seq(
      (0L, t0, 1L, "signup", 0.0),
      (1L, t0 + 10L * MinNs, 1L, "purchase", 5.0),
      (2L, t0 + 120L * MinNs, 1L, "purchase", 7.0),
      (3L, t0 + 5L * MinNs, 2L, "purchase", 9.0))
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val sdf = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventPipeline.purchaseAttribution(sdf).writeStream
      .format("memory").queryName("attr_out").outputMode("append").start()
    mem.addData(data: _*)
    q.processAllAvailable()
    val streamed = spark.table("attr_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    q.stop()
    val batch = EventPipeline.purchaseAttribution(
      data.toDF("event_id", "ts", "user_id", "event_type", "value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
    assert(batch == Set((1L, 1L, 0L, 10L * 60 * 1000000L)))
  }

  test("sessionAgg session counts match the lag-based batch sessionization") {
    // events with >30min gaps create separate sessions
    val ev = Seq(
      (0L, 0L, 1L, "click", 1.0),
      (1L, 10L * 60 * 1000000000L, 1L, "click", 1.0),   // +10 min: same session
      (2L, 60L * 60 * 1000000000L, 1L, "click", 1.0),   // +50 min: new session
      (3L, 0L, 2L, "view", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val sessions = EventPipeline.sessionAgg(ev)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sessions == Map(1L -> 2L, 2L -> 1L))
  }
}
