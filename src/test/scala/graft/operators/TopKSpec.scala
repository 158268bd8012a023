package graft.operators

import org.apache.spark.sql.graft.TopKHeap
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(13)

  test("TopKHeap keeps the k smallest (dist, id) pairs, sorted") {
    for (trial <- 0 until 20) {
      val n = 1 + rnd.nextInt(500)
      val k = 1 + rnd.nextInt(20)
      val items = Array.fill(n)((rnd.nextInt(10).toDouble, rnd.nextLong() % 1000))
      val h = new TopKHeap(k)
      items.foreach { case (d, i) => h.insert(d, i) }
      val expected = items.distinct.sorted.take(k) // ties on dist → id asc
      val got = h.sortedPairs.toSeq
      // heap keeps duplicates; compare against plain sort of all items
      val expectedAll = items.toSeq.sortBy(identity).take(k)
      assert(got == expectedAll, s"trial $trial n=$n k=$k")
    }
  }

  test("TopKHeap merge across splits equals global top-k") {
    val items = Array.fill(1000)((rnd.nextDouble(), rnd.nextLong()))
    val (l, r) = items.splitAt(400)
    val h1 = new TopKHeap(25); l.foreach { case (d, i) => h1.insert(d, i) }
    val h2 = new TopKHeap(25); r.foreach { case (d, i) => h2.insert(d, i) }
    h1.mergeFrom(h2)
    val global = new TopKHeap(25); items.foreach { case (d, i) => global.insert(d, i) }
    assert(h1.sortedPairs.toSeq == global.sortedPairs.toSeq)
  }

  test("serialization round-trips") {
    val h = new TopKHeap(10)
    (0 until 100).foreach(i => h.insert(rnd.nextDouble(), i))
    val h2 = TopKHeap.deserialize(10, h.serialize())
    assert(h.sortedPairs.toSeq == h2.sortedPairs.toSeq)
  }

  test("topkIds aggregate equals window row_number top-k") {
    val df = Seq.tabulate(2000)(i => (i % 7, rnd.nextInt(50).toDouble, i.toLong))
      .toDF("g", "dist", "id")
    val viaAgg = df.groupBy("g")
      .agg(TopKAggregate.topkIds(5, $"dist", $"id").as("ids"))
      .select($"g", posexplode($"ids").as(Seq("r", "id")))
    val w = Window.partitionBy($"g").orderBy($"dist", $"id")
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"g", ($"rn" - 1).cast("int").as("r"), $"id")
    assert(viaAgg.except(viaWindow).isEmpty && viaWindow.except(viaAgg).isEmpty)
  }

  test("k larger than group size returns whole group") {
    val df = Seq((1, 1.0, 10L), (1, 2.0, 11L)).toDF("g", "dist", "id")
    val ids = df.groupBy("g").agg(TopKAggregate.topkIds(100, $"dist", $"id").as("ids"))
      .head.getSeq[Long](1)
    assert(ids == Seq(10L, 11L))
  }
}
