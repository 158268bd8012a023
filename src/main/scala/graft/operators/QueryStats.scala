package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-query (type, selectivity, route, timing) stats emission — the
  * Spark analog of the reference's query-analysis workflow
  * (utils.h:568-625 stats dump, getquery.cpp + plot.py recall/latency
  * analysis): run the batch route-by-route, time each route's
  * materialization, and hand back a stats table alongside the results.
  *
  * Per-query wall time is not observable inside a vectorized batch
  * engine; the faithful analog is per-ROUTE wall time attached to every
  * query of that route (plus the exact per-query type/selectivity the
  * routing pass already computes). That is what the reference's plots
  * actually consume — time grouped by (type, selectivity band).
  */
object QueryStats {

  /** Returns (results, stats).
    *  - results: (qid, rank, nid) — same rows as [[HybridKnn.execute]]
    *    (each route's slice is eagerly materialized for the timing
    *    boundary, then unioned);
    *  - stats: (qid, qtype, sel, route, route_queries, route_seconds).
    */
  def executeWithStats(base: DataFrame, queries: DataFrame, k: Int,
      categoryLayout: Option[DataFrame] = None,
      ann: Boolean = false, annEf: Int = 200, annBuckets: Int = 8): (DataFrame, DataFrame) = {
    val spark = base.sparkSession
    import spark.implicits._
    // ONE routing pass: collect the fully-routed query rows (vectors
    // included — query batches are broadcast-sized by contract) and feed
    // each route's slice straight into HybridKnn's batch executor. No
    // isin re-filter, no second withRoutes — the stats grid is computed
    // exactly once.
    val collected = Selectivity.withRoutes(base, queries)
      .select(col("qid").cast("long"), col("qtype").cast("int"),
        col("v").cast("long"), col("l").cast("double"), col("r").cast("double"),
        col("qvec"), col("route"), col("sel").cast("double"))
      .collect()
      .map { r =>
        val routedRow: HybridKnn.RoutedRow =
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
            r.getDouble(4), r.getSeq[Float](5).toArray, r.getString(6))
        (routedRow, r.getDouble(7))
      }
    val byRoute = collected.groupBy(_._1._7).toSeq.sortBy(_._1)
    val timed = byRoute.map { case (route, rows) =>
      val t0 = System.nanoTime()
      val res = HybridKnn.executeBatch(base, rows.map(_._1), k,
          categoryLayout, ann, annEf, annBuckets)
        .localCheckpoint(eager = true)
      val dt = (System.nanoTime() - t0) / 1e9
      (route, res, rows.length.toLong, dt)
    }
    val results =
      if (timed.isEmpty) spark.emptyDataset[(Long, Long, Long)].toDF("qid", "rank", "nid")
      else timed.map(_._2).reduce(_.unionByName(_))
    val routeStats = timed.map(t => t._1 -> (t._3, t._4)).toMap
    val stats = collected.toSeq.map { case ((qid, qtype, _, _, _, _, route), sel) =>
      val (n, secs) = routeStats(route)
      (qid, qtype, sel, route, n, secs)
    }.toDF("qid", "qtype", "sel", "route", "route_queries", "route_seconds")
    (results, stats)
  }
}
