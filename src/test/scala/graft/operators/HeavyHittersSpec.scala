package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MgSummary
import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("MgSummary: undercount never exceeds N/(capacity+1), with and without merging") {
    val rnd = new scala.util.Random(42)
    // zipf-ish stream over 1000 items, far beyond capacity 16
    val stream = Array.fill(20000)("w" + (math.pow(rnd.nextDouble(), 3) * 1000).toInt)
    val exact = stream.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = stream.length.toLong
    val cap = 16

    // single summary
    val s1 = new MgSummary(cap)
    stream.foreach(s1.add)
    // merged from 8 chunks (simulates map-side partials)
    val merged = new MgSummary(cap)
    stream.grouped(2500).foreach { chunk =>
      val part = new MgSummary(cap)
      chunk.foreach(part.add)
      merged.mergeFrom(part)
    }
    for (s <- Seq(s1, merged)) {
      assert(s.counts.size <= cap)
      // every counter is an undercount within the bound
      s.counts.forEach { (item, c) =>
        val t = exact(item)
        assert(c <= t && t - c <= n / (cap + 1) + 1, s"$item sketch=$c true=$t")
      }
      // completeness: anything above the threshold is present
      exact.foreach { case (item, t) =>
        if (t > n / (cap + 1)) assert(s.counts.containsKey(item), s"missing heavy $item ($t)")
      }
    }
  }

  test("heavyNgrams == GROUP BY ... HAVING cnt*(cap+1) > N, with eviction and partial merges") {
    // 200 distinct background words (way past capacity 8) + 3 planted
    // heavy words; 16 partitions force the mergeable-summaries path
    val rows = (0 until 4000).map { i =>
      val w =
        if (i % 4 == 0) "alpha"
        else if (i % 7 == 0) "beta"
        else if (i % 9 == 0) "gamma"
        else "bg" + (i % 200)
      (i.toLong, s"$w filler$i")
    }
    val docs = spark.createDataFrame(rows).toDF("doc_id", "text").repartition(16)
    val got = HeavyHitters.heavyNgrams(docs, "text", n = 1, capacity = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // brute-force truth
    val grams = rows.flatMap(_._2.split(" ")).filter(_.nonEmpty)
    val n = grams.length.toLong
    val want = grams.groupBy(identity).view.mapValues(_.length.toLong)
      .filter { case (_, c) => c * 9 > n }.toMap
    assert(want.nonEmpty && got == want, s"got=$got want=$want")
  }

  test("heavyNgrams on bigrams: exact equality at capacity below the distinct count") {
    val rows = (0 until 1000).map { i =>
      val t = if (i % 3 == 0) "spark shuffles data fast" else s"unique$i words here now"
      (i.toLong, t)
    }
    val docs = spark.createDataFrame(rows).toDF("doc_id", "text").repartition(8)
    val got = HeavyHitters.heavyNgrams(docs, "text", n = 2, capacity = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val grams = rows.flatMap(_._2.split(" ").sliding(2).map(_.mkString(" ")))
    val n = grams.length.toLong
    val want = grams.groupBy(identity).view.mapValues(_.length.toLong)
      .filter { case (_, c) => c * 9 > n }.toMap
    assert(want.nonEmpty && got == want)
  }
}
