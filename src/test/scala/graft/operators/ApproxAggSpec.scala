package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HyperLogLog++ sketch aggregate: relative error bound vs exact. */
class ApproxAggSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact at rsd=0.02") {
    val df = Seq.tabulate(20000)(i => (i % 7, (i * 2654435761L) % 3000))
      .toDF("g", "u")
    val rows = df.groupBy("g")
      .agg(approx_count_distinct($"u", rsd = 0.02).as("a"),
        countDistinct($"u").as("e"))
      .collect()
    rows.foreach { r =>
      val a = r.getLong(1).toDouble
      val e = r.getLong(2).toDouble
      assert(math.abs(a - e) / e <= 0.05, s"group ${r.get(0)}: approx $a exact $e")
    }
  }
}
