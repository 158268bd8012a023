package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(77)
  private def vec(): Array[Float] = Array.fill(8)(rnd.nextFloat())

  private lazy val base =
    Seq.tabulate(400)(i => (i.toLong, (i % 8).toLong, (i % 50) / 50.0, vec()))
      .toDF("id", "label", "ts", "vec")

  test("pruned-layout kNN equals streaming exact kNN, and the scan is partition-pruned") {
    val dir = Files.createTempDirectory("graft-layout").toString
    val layout = Layouts.ensureCategoryLayout(base, s"$dir/by_label")
    val queries = Seq(
      (0L, 1, 2L, -1.0, -1.0, vec()),
      (1L, 3, 5L, 0.1, 0.8, vec())
    ).toDF("qid", "qtype", "v", "l", "r", "qvec")

    val viaLayout = Layouts.prunedCategoryKnn(layout, queries, 10)
    val viaExact = KnnJoin.exact(base, queries, 10)
    val a = viaLayout.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = viaExact.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b && a.nonEmpty)

    // the physical scan must carry a partition filter on label
    val plan = viaLayout.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [label"),
      "expected partition pruning on the label layout:\n" + plan.take(2000))
  }

  test("decile layout round-trips all rows with correct decile assignment") {
    val dir = Files.createTempDirectory("graft-layout2").toString
    val layout = Layouts.ensureDecileLayout(base, s"$dir/by_decile")
    assert(layout.count() == 400)
    val bad = layout.filter(col("decile") =!= floor(col("ts") * 10).cast("int")).count()
    assert(bad == 0)
  }
}
