package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFunctions

class KnnJoinSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(99)
  private def vec(): Array[Float] = Array.fill(8)(rnd.nextFloat())

  private lazy val base: DataFrame =
    Seq.tabulate(300)(i => (i.toLong, (i % 5).toLong, (i % 100) / 100.0, vec()))
      .toDF("id", "label", "ts", "vec")

  private lazy val queries: DataFrame = Seq(
    (0L, 0, -1L, -1.0, -1.0, vec()),          // pure ANN
    (1L, 1, 2L, -1.0, -1.0, vec()),           // category
    (2L, 2, -1L, 0.2, 0.4, vec()),            // range
    (3L, 3, 3L, 0.1, 0.5, vec()),             // both
    (4L, 2, -1L, 0.95, 0.965, vec()),         // narrow range (< k matches)
    (5L, 1, 999L, -1.0, -1.0, vec())          // no matching category
  ).toDF("qid", "qtype", "v", "l", "r", "qvec")

  /** Naive re-implementation via collect for the oracle-of-the-oracle. */
  private def naive(k: Int): Map[Long, Seq[Long]] = {
    val b = base.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getSeq[Float](3).toArray))
    queries.collect().map { q =>
      val (qid, qtype, v, l, r) = (q.getLong(0), q.getInt(1), q.getLong(2),
        q.getDouble(3), q.getDouble(4))
      val qv = q.getSeq[Float](5).toArray
      val matches = b.filter { case (_, label, ts, _) =>
        qtype match {
          case 0 => true
          case 1 => label == v
          case 2 => ts >= l && ts <= r
          case 3 => label == v && ts >= l && ts <= r
        }
      }
      val sorted = matches.map { case (id, _, _, bv) =>
        val d = qv.zip(bv).map { case (x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
        (d, id)
      }.sorted.take(k).map(_._2).toSeq
      qid -> sorted
    }.toMap
  }

  test("exact kNN join matches naive brute force on all 4 query types") {
    val got = KnnJoin.exact(base, queries, 10).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = naive(10).filter(_._2.nonEmpty)
    assert(got == want)
  }

  test("queries with fewer than k matches return all matches") {
    val got = KnnJoin.exact(base, queries, 10).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(4L).nonEmpty && got(4L).size < 10)
  }

  test("queries with no matches are absent (documented corner, utils.h:142-146)") {
    val got = KnnJoin.exact(base, queries, 10).collect().map(_.getLong(0)).toSet
    assert(!got.contains(5L))
  }

  test("exactFlat ranks start at 1 and follow distance order") {
    val flat = KnnJoin.exactFlat(base, queries.filter($"qid" === 0), 5).collect()
    assert(flat.map(_.getLong(1)).toSeq == (1L to 5L))
    // rank 1 neighbor is the true argmin
    val d = base.crossJoin(queries.filter($"qid" === 0))
      .select($"id", VectorFunctions.l2Sq($"qvec", $"vec").as("d"))
      .orderBy($"d", $"id").head.getLong(0)
    assert(flat.head.getLong(2) == d)
  }
}
