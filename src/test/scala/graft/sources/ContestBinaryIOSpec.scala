package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.KnnJoin
import org.apache.spark.sql.functions._

class ContestBinaryIOSpec extends SparkSpec {

  private val rnd = new scala.util.Random(17)
  private val dim = 12

  test("readBase round-trips the contest binary format, ids are file ordinals") {
    val tmp = Files.createTempFile("graft-base", ".bin").toString
    val rows = Seq.tabulate(257)(i =>
      (i % 7L, rnd.nextDouble(), Array.fill(dim)(rnd.nextFloat())))
    ContestBinaryIO.writeBase(rows, tmp)
    val df = ContestBinaryIO.readBase(spark, tmp, dim, numPartitions = 5)
    val got = df.orderBy("id").collect()
    assert(got.length == 257)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i)
      assert(r.getLong(1) == rows(i)._1)
      assert(math.abs(r.getDouble(2) - rows(i)._2.toFloat.toDouble) < 1e-9)
      assert(r.getSeq[Float](3).toArray.sameElements(rows(i)._3))
    }
  }

  test("writeKnn emits uint32 rows in qid order with -1 padding") {
    import spark.implicits._
    val res = Seq((1L, Seq(5L, 6L)), (0L, Seq(9L, 8L, 7L))).toDF("qid", "neighbors")
    val tmp = Files.createTempFile("graft-knn", ".bin").toString
    ContestBinaryIO.writeKnn(res, tmp, k = 3)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(tmp))
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ints = Array.fill(6)(bb.getInt)
    assert(ints.toSeq == Seq(9, 8, 7, 5, 6, -1))
  }

  test("binary-sourced base feeds the kNN join end-to-end") {
    import spark.implicits._
    val tmp = Files.createTempFile("graft-e2e", ".bin").toString
    val rows = Seq.tabulate(100)(i =>
      ((i % 4).toLong, i / 100.0, Array.fill(dim)(rnd.nextFloat())))
    ContestBinaryIO.writeBase(rows, tmp)
    val base = ContestBinaryIO.readBase(spark, tmp, dim, 3)
    val queries = Seq((0L, 1, 2L, -1.0, -1.0, Array.fill(dim)(rnd.nextFloat())))
      .toDF("qid", "qtype", "v", "l", "r", "qvec")
    val out = KnnJoin.exact(base, queries, 5).collect()
    assert(out.length == 1 && out.head.getSeq[Long](1).size == 5)
  }
}
