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
}
