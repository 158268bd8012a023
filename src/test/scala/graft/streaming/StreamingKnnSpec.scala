package graft.streaming

import graft.SparkSpec
import graft.operators.KnnJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingKnnSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(61)
  private def vec(): Array[Float] = Array.fill(8)(rnd.nextFloat())

  test("streamed query micro-batches produce the same results as the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val base = Seq.tabulate(300)(i =>
      (i.toLong, (i % 5).toLong, (i % 20) / 20.0, vec())).toDF("id", "label", "ts", "vec")
    val queryRows = Seq(
      (0L, 0, -1L, -1.0, -1.0, vec()),
      (1L, 1, 2L, -1.0, -1.0, vec()),
      (2L, 2, -1L, 0.1, 0.7, vec()))
    val mem = MemoryStream[(Long, Int, Long, Double, Double, Array[Float])]
    val sdf = mem.toDF.toDF("qid", "qtype", "v", "l", "r", "qvec")

    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val writer = StreamingKnn.exactWriter(base, sdf, k = 5) { (out, _) =>
      collected ++= out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    mem.addData(queryRows: _*)
    val q = writer.start()
    q.awaitTermination(60000)

    val batch = KnnJoin.exactFlat(base,
        queryRows.toDF("qid", "qtype", "v", "l", "r", "qvec"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(collected.toSet == batch && batch.nonEmpty)
  }

  test("streaming delta ingest: appended vectors are served; crossing the threshold compacts") {
    implicit val sqlCtx = spark.sqlContext
    import graft.index.AnnIndexStore
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-ingest")
      .toString + "/index"
    AnnIndexStore.build(
      Seq.tabulate(300)(i => (i.toLong, vec())).toDF("id", "vec"),
      dir, numBuckets = 2)

    val mem = MemoryStream[(Long, Array[Float])]
    val sdf = mem.toDF.toDF("id", "vec")
    // two micro-batches: 30 rows (below the 0.25 trigger), then 60 more
    // (90/300 = 0.3 crosses it -> the second batch must compact)
    mem.addData(Seq.tabulate(30)(i => ((1000 + i).toLong, vec())): _*)
    mem.addData(Seq.tabulate(60)(i => ((2000 + i).toLong, vec())): _*)
    val q = StreamingKnn.deltaIngestWriter(sdf, dir, numBuckets = 2,
      compactAt = 0.25).start()
    q.awaitTermination(120000)

    // compaction ran: delta cleared, all 390 ids live in the graphs
    assert(AnnIndexStore.deltaFraction(spark, dir) == 0.0)
    val nIndexed = spark.read.parquet(AnnIndexStore.resolveStore(dir))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.col("ids")))).head().getLong(0)
    assert(nIndexed == 390L)
    // and the streamed rows are searchable
    val queries = Seq((0L, vec()), (1L, vec())).toDF("qid", "qvec")
    val got = AnnIndexStore.searchWithDelta(spark, dir, queries, k = 5, ef = 200)
    assert(got.count() == 10)
  }

  test("checkpointed delta ingest records the query id as the stream epoch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.index.AnnIndexStore
    val root = java.nio.file.Files.createTempDirectory("graft-stream-epoch").toString
    val dir = s"$root/index"
    val ckpt = s"$root/ckpt"
    AnnIndexStore.build(
      Seq.tabulate(200)(i => (i.toLong, vec())).toDF("id", "vec"),
      dir, numBuckets = 2)

    val mem = MemoryStream[(Long, Array[Float])]
    val sdf = mem.toDF.toDF("id", "vec")
    // compactAt high: no fold, so the delta's epoch subtree survives
    // for inspection
    val writer = StreamingKnn.deltaIngestWriter(sdf, dir, numBuckets = 2,
      compactAt = 10.0, checkpointLocation = Some(ckpt))
    mem.addData(Seq.tabulate(20)(i => ((1000 + i).toLong, vec())): _*)
    writer.start().awaitTermination(120000)
    // the recorded epoch is the checkpoint's PERSISTENT query id (a
    // uuid), proving the in-process property path resolved — a silent
    // fall-through to the path fallback would record the ckpt path.
    // The epoch now lives as the batch subtree's eid= dir name (no
    // separate epoch file: the layout IS the attribution)
    def eidTokens(): Seq[String] = Option(
        new java.io.File(AnnIndexStore.deltaPath(dir)).listFiles())
      .map(_.toSeq).getOrElse(Nil)
      .filter(f => f.isDirectory && f.getName.startsWith("eid="))
      .map(_.getName.stripPrefix("eid="))
    assert(eidTokens().size == 1,
      "ingesting with a checkpoint must record the epoch as the eid= subtree")
    val epoch = eidTokens().head
    assert(epoch.matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"),
      s"epoch must be the query id uuid, got '$epoch'")
    // it matches what the metadata fallback resolves: the two sources
    // can never disagree (a uuid is fs-safe, so the dir token is the
    // raw epoch)
    assert(epoch == StreamingKnn.checkpointEpoch(spark, ckpt))
    // a SECOND start on the SAME checkpoint is the same stream: the
    // epoch is stable and rows accumulate in the same subtree
    mem.addData(Seq.tabulate(10)(i => ((2000 + i).toLong, vec())): _*)
    writer.start().awaitTermination(120000)
    assert(eidTokens() == Seq(epoch))
    assert(math.abs(AnnIndexStore.deltaFraction(spark, dir) - 30.0 / 200) < 1e-9)
  }
}
