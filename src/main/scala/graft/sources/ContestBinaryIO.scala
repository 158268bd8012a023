package graft.sources

import java.io.{BufferedInputStream, DataOutputStream, FileInputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources/sinks for the contest's little-endian binary formats
  * (FIXTURES.md §1; reference io.h:40-62 ReadBin, utils.h:257-276
  * ReadBase, utils.h:491-548 ReadQuery, io.h:22-33 SaveKNN).
  *
  * Reads are distributed: the file is split into contiguous row ranges,
  * one per partition; each task streams its byte range independently —
  * the same pattern works on any shared filesystem. Row ids are the file
  * ordinals, assigned arithmetically (no shuffle, no zipWithIndex).
  */
object ContestBinaryIO {

  // ONE header reader, shared with the V2 source: the count is uint32,
  // and a signed getInt would wrap a file with N > Int.MaxValue into a
  // negative bound — spark.range(0, n<0) silently yields an EMPTY
  // DataFrame, data loss with no error at exactly the scale this repo
  // targets. ContestBinarySource.readHeader reads it unsigned.
  private def readHeader(path: String): Long =
    ContestBinarySource.readHeader(path)

  /** ONE definition of the per-partition row-range streamer readBase
    * and readQueries share (skip to the partition's first row, fixed
    * rowBytes records, short-read retry, close at exhaustion) — only
    * the record decode differs. `skip` can legally return 0 before
    * EOF; the require fails loudly instead of spinning. */
  private def streamRows[T](path: String, rowBytes: Int,
      ids: Array[Long])(decode: (Long, ByteBuffer) => T): Iterator[T] = {
    if (ids.isEmpty) return Iterator.empty
    val in = new BufferedInputStream(new FileInputStream(path), 1 << 20)
    var skipped = 0L
    val target = 4L + ids.head * rowBytes
    while (skipped < target) {
      val s = in.skip(target - skipped)
      require(s > 0, s"skip stalled at $skipped/$target in $path")
      skipped += s
    }
    val buf = new Array[Byte](rowBytes)
    val out = ids.iterator.map { id =>
      var off = 0
      while (off < rowBytes) {
        val r = in.read(buf, off, rowBytes - off)
        require(r > 0, s"short read at row $id")
        off += r
      }
      decode(id, ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN))
    }
    new Iterator[T] {
      def hasNext: Boolean = { val h = out.hasNext; if (!h) in.close(); h }
      def next(): T = out.next()
    }
  }

  /** Base table: (id LONG, label LONG, ts DOUBLE, vec ARRAY<FLOAT>).
    * File layout: uint32 N; N × (label f32, ts f32, vec f32[dim]). */
  def readBase(spark: SparkSession, path: String, dim: Int = 100,
      numPartitions: Int = 32): DataFrame = {
    import spark.implicits._
    val n = readHeader(path)
    val rowBytes = (2 + dim) * 4
    spark.range(0, n, 1, numPartitions)
      .mapPartitions { it =>
        streamRows(path, rowBytes, it.map(_.toLong).toArray) { (id, bb) =>
          val label = bb.getFloat.toLong
          val ts = bb.getFloat.toDouble
          val vec = Array.fill(dim)(bb.getFloat)
          (id, label, ts, vec)
        }
      }
      .toDF("id", "label", "ts", "vec")
  }

  /** Query table: (qid LONG, qtype INT, v LONG, l DOUBLE, r DOUBLE,
    * qvec ARRAY<FLOAT>). File: uint32 NQ; NQ × (type f32, v f32, l f32,
    * r f32, vec f32[dim]). The reference's -1 sentinels are preserved. */
  def readQueries(spark: SparkSession, path: String, dim: Int = 100,
      numPartitions: Int = 8): DataFrame = {
    import spark.implicits._
    val n = readHeader(path)
    val rowBytes = (4 + dim) * 4
    spark.range(0, n, 1, numPartitions)
      .mapPartitions { it =>
        streamRows(path, rowBytes, it.map(_.toLong).toArray) { (id, bb) =>
          val qtype = bb.getFloat.toInt
          val v = bb.getFloat.toLong
          val l = bb.getFloat.toDouble
          val r = bb.getFloat.toDouble
          val vec = Array.fill(dim)(bb.getFloat)
          (id, qtype, v, l, r, vec)
        }
      }
      .toDF("qid", "qtype", "v", "l", "r", "qvec")
  }

  /** Contest output sink (io.h:22-33): NQ × k uint32 neighbor ids, no
    * header, rows in qid order. Streams through the driver (the contest
    * format is a single flat file by definition). */
  def writeKnn(results: DataFrame, path: String, k: Int): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    try {
      val it = results.select(col("qid"), col("neighbors"))
        .orderBy("qid").toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        val nb = row.getSeq[Long](1)
        val bb = ByteBuffer.allocate(4 * k).order(ByteOrder.LITTLE_ENDIAN)
        nb.take(k).foreach(x => bb.putInt(x.toInt))
        (nb.length until k).foreach(_ => bb.putInt(-1)) // pad when < k matches
        out.write(bb.array())
      }
    } finally out.close()
  }

  /** Test/export helper: write a base DataFrame to the contest format. */
  def writeBase(rows: Seq[(Long, Double, Array[Float])], path: String): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    try {
      val h = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      h.putInt(rows.length)
      out.write(h.array())
      rows.foreach { case (label, ts, vec) =>
        val bb = ByteBuffer.allocate((2 + vec.length) * 4).order(ByteOrder.LITTLE_ENDIAN)
        bb.putFloat(label.toFloat); bb.putFloat(ts.toFloat)
        vec.foreach(bb.putFloat)
        out.write(bb.array())
      }
    } finally out.close()
  }
}
