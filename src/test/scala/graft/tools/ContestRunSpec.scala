package graft.tools

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.ContestBinaryIO

/** The binary-lifecycle pieces of ContestRun: the parallel positioned
  * binary writer (gen mode) and the corpus twin-ness contract that
  * makes the binary and parquet probes comparable. */
class ContestRunSpec extends SparkSpec {

  test("writeBinaryParallel emits the contest base format; read-back matches ContestCorpus") {
    val tmp = Files.createTempFile("graft-gen-base", ".bin").toString
    val n = 1000L
    ContestRun.writeBinaryParallel(spark, tmp, n, (2 + ContestCorpus.dim) * 4, parts = 7) {
      (id, bb) =>
        val (label, ts, vec) = ContestCorpus.baseRow(id)
        bb.putFloat(label.toFloat); bb.putFloat(ts.toFloat)
        vec.foreach(bb.putFloat)
    }
    assert(new java.io.File(tmp).length() == 4L + n * (2 + ContestCorpus.dim) * 4)
    val got = ContestBinaryIO.readBase(spark, tmp, ContestCorpus.dim, numPartitions = 4)
      .orderBy("id").collect()
    assert(got.length == n)
    Seq(0, 1, 499, 999).foreach { i =>
      val (label, ts, vec) = ContestCorpus.baseRow(i.toLong)
      val r = got(i)
      assert(r.getLong(0) == i)
      assert(r.getLong(1) == label)
      // ts round-trips through f32 (the file format's width)
      assert(math.abs(r.getDouble(2) - ts.toFloat.toDouble) < 1e-9)
      assert(r.getSeq[Float](3).toArray.sameElements(vec))
    }
  }

  test("writeBinaryParallel query format preserves -1 sentinels per type") {
    val tmp = Files.createTempFile("graft-gen-q", ".bin").toString
    val nq = 64L
    ContestRun.writeBinaryParallel(spark, tmp, nq, (4 + ContestCorpus.dim) * 4, parts = 3) {
      (i, bb) =>
        val (qtype, v, l, r, qvec) = ContestCorpus.queryRow(i)
        bb.putFloat(qtype.toFloat); bb.putFloat(v.toFloat)
        bb.putFloat(l.toFloat); bb.putFloat(r.toFloat)
        qvec.foreach(bb.putFloat)
    }
    val got = ContestBinaryIO.readQueries(spark, tmp, ContestCorpus.dim, numPartitions = 2)
      .orderBy("qid").collect()
    assert(got.length == nq)
    got.foreach { r =>
      val qid = r.getLong(0)
      val (qtype, v, l, rr, qvec) = ContestCorpus.queryRow(qid)
      assert(r.getInt(1) == qtype)
      assert(r.getLong(2) == v)
      assert(math.abs(r.getDouble(3) - l.toFloat.toDouble) < 1e-9)
      assert(math.abs(r.getDouble(4) - rr.toFloat.toDouble) < 1e-9)
      assert(r.getSeq[Float](5).toArray.sameElements(qvec))
      // type semantics: v only for 1/3, window only for 2/3
      if (qtype == 0 || qtype == 2) assert(v == -1L)
      if (qtype < 2) assert(l == -1.0 && rr == -1.0)
      else assert(l >= 0.0 && rr > l)
    }
  }
}
