package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stats layer + adaptive physical-plan routing, mirroring the
  * reference's hand-rolled cost-based dispatch:
  *  - per-category counts (utils.h:377-395) and decile histogram
  *    (utils.h:444-478) as small stats DataFrames;
  *  - per-query selectivity (hybrid_graph.cpp:169-200);
  *  - route choice by (qtype, selectivity) with the reference's
  *    thresholds: bf_thr = 0.045, bf_thr3 = 0.08
  *    (baseline.cpp:77, hybrid_graph.h:78-79, hybrid_graph.cpp:201);
  *  - SplitInterval: decompose a [l,r] range over the 10 fixed deciles
  *    and classify each overlapped bucket (hybrid_graph.cpp:91-134).
  *
  * At scale these stats jobs are cheap aggregations over the base; the
  * routing column then splits the query batch into sub-plans before any
  * expensive work — the same two-phase (stats → routed plan) shape as
  * the reference, expressed declaratively.
  */
object Selectivity {

  val BfThreshold = 0.045
  val BfThresholdType3 = 0.08

  /** (label, cnt) — the reference's category_map. */
  def categoryCounts(base: DataFrame): DataFrame =
    base.groupBy("label").agg(count(lit(1)).as("cnt"))

  /** (decile, cnt) — the reference's timestamp_map. */
  def decileHistogram(base: DataFrame): DataFrame =
    base.groupBy(floor(col("ts") * 10).cast("int").as("decile"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-query exact selectivity + route.
    * Output: (qid, qtype, matches, sel, route). */
  def routeQueries(base: DataFrame, queries: DataFrame): DataFrame = {
    val n = base.count()
    val matches = broadcast(queries.select("qid", "qtype", "v", "l", "r"))
      .join(base,
        col("qtype") === 0 ||
        (col("qtype") === 1 && col("label") === col("v")) ||
        (col("qtype") === 2 && col("ts") >= col("l") && col("ts") <= col("r")) ||
        (col("qtype") === 3 && col("label") === col("v") &&
          col("ts") >= col("l") && col("ts") <= col("r")),
        "left")
      .groupBy("qid", "qtype")
      .agg(count(col("id")).as("matches"))
    matches
      .withColumn("sel", col("matches") / lit(n.toDouble))
      .withColumn("route",
        when(col("qtype") === 0, "full_graph")
          .when(col("qtype") === 3 && col("sel") < BfThresholdType3, "bruteforce")
          .when(col("qtype") =!= 3 && col("sel") < BfThreshold, "bruteforce")
          .when(col("qtype") === 1 || col("qtype") === 3, "category_graph")
          .otherwise("interval_graph"))
  }

  /** Stats-lookup routing — the scale path. Where [[routeQueries]]
    * counts matches exactly with a predicate join over the base (one
    * full pass), this derives selectivity from the reference's two
    * precomputed stats tables (category_map + timestamp_map): exact for
    * type 0/1, interpolated-histogram estimate for type 2/3
    * (independence assumption for type 3 — the standard CBO treatment).
    * Output: (qid, qtype, sel, route). */
  def routeQueriesFast(base: DataFrame, queries: DataFrame): DataFrame =
    withRoutes(base, queries)
      .select(col("qid"), col("qtype"), col("sel"), col("route"))

  /** The queries with `sel` and `route` appended, from ONE stats pass:
    * the (label, decile) cell grid — both the reference's category_map
    * and timestamp_map fall out of it — is collected to the driver
    * (≤ labels×11 rows) and folded into the routing expression as
    * literals. No join, no per-query job: the routed query batch is a
    * single narrow projection, so composing plans on top of it adds
    * nothing to the physical plan but a `when()` column. */
  def withRoutes(base: DataFrame, queries: DataFrame): DataFrame = {
    val cells = base
      .select(col("label"), floor(col("ts") * 10).cast("int").as("decile"))
      .groupBy("label", "decile").agg(count(lit(1)).as("cnt"))
      .collect()
    val n = math.max(cells.map(_.getLong(2)).sum, 1L).toDouble
    val catMap: Map[Long, Long] = cells.groupBy(_.getLong(0))
      .map { case (l, rs) => l -> rs.map(_.getLong(2)).sum }
    val hist = new Array[Long](10)
    cells.foreach { r =>
      val d = r.getInt(1); if (d >= 0 && d < 10) hist(d) += r.getLong(2)
    }
    val catCnt =
      if (catMap.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(catMap), col("v")), lit(0L))
    // range estimate: sum over deciles of cnt × covered-fraction
    val rangeCnt = (0 until 10).map { d =>
      greatest(lit(0.0),
        (least(col("r"), lit((d + 1) / 10.0)) - greatest(col("l"), lit(d / 10.0))) * 10.0) *
        lit(hist(d).toDouble)
    }.reduce(_ + _)
    queries
      .withColumn("sel",
        when(col("qtype") === 0, lit(1.0))
          .when(col("qtype") === 1, catCnt / n)
          .when(col("qtype") === 2, rangeCnt / n)
          .otherwise((catCnt / n) * (rangeCnt / n)))
      .withColumn("route",
        when(col("qtype") === 0, "full_graph")
          .when(col("qtype") === 3 && col("sel") < BfThresholdType3, "bruteforce")
          .when(col("qtype") =!= 3 && col("sel") < BfThreshold, "bruteforce")
          .when(col("qtype") === 1 || col("qtype") === 3, "category_graph")
          .otherwise("interval_graph"))
  }

  /** SplitInterval: one row per (query, overlapped decile) with the
    * covered fraction of the bucket and its class:
    * SMALL (< 0.2 covered → quantized slice scan), FULL (fully covered
    * → unfiltered sub-index walk), MEDIUM (otherwise → in-filter walk).
    * Thresholds follow hybrid_graph.cpp:117-124. */
  def splitInterval(rangeQueries: DataFrame): DataFrame = {
    val buckets = rangeQueries.sparkSession.range(0, 10)
      .select(col("id").cast("int").as("bucket"),
        (col("id") / 10.0).as("bstart"),
        ((col("id") + 1) / 10.0).as("bend"))
    rangeQueries.crossJoin(broadcast(buckets))
      .filter(col("l") < col("bend") && col("r") > col("bstart"))
      .withColumn("cover",
        (least(col("r"), col("bend")) - greatest(col("l"), col("bstart"))) / (col("bend") - col("bstart")))
      .withColumn("rf_class",
        when(col("cover") < 0.2, "SMALL")
          .when(col("cover") >= 0.999999, "FULL")
          .otherwise("MEDIUM"))
      .select(col("qid"), col("bucket"), col("cover"), col("rf_class"))
  }
}
