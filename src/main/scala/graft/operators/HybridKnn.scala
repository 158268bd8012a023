package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's `BatchSearch` pipeline (hybrid_graph.cpp:147-503) as
  * one composed, declarative plan:
  *
  *   1. stats pass: exact per-query selectivity + route column
  *      ([[Selectivity.routeQueries]] — the reference's binary-searched
  *      selectivity stage, :168-230);
  *   2. route split at plan-build time (the reference's staged dispatch):
  *      - `bruteforce` type-1/3 → partition-pruned scan on the clustered
  *        label layout (J2's sorted-slice scan);
  *      - other exact routes → the streaming exact join;
  *      - optionally, `full_graph`/`category_graph`/`interval_graph`
  *        routes → partitioned HNSW ([[AnnJoin.hnswKnn]]) for the
  *        approximate configuration;
  *   3. union of per-route results (each already top-k per qid).
  *
  * With `ann = false` every route is exact, so the composition returns
  * byte-identical results to [[KnnJoin.exact]] — asserted in
  * HybridKnnSpec and by the shared DuckDB oracle of `knn_routed`.
  */
object HybridKnn {

  /** (qid, rank, nid) flat results for the full 4-type query batch. */
  def execute(base: DataFrame, queries: DataFrame, k: Int,
      categoryLayout: Option[DataFrame] = None,
      ann: Boolean = false, annEf: Int = 200, annBuckets: Int = 8): DataFrame = {
    // stats-lookup routing (Selectivity.withRoutes): one tiny stats
    // collect, then `route` is a literal-folded column on the query
    // batch itself — no join. Any routing decision preserves exactness —
    // it only picks WHICH exact physical path runs (ANN routes excepted,
    // behind the flag).
    val q = Selectivity.withRoutes(base, queries)

    // route: low-selectivity category queries → pruned clustered scan
    val bfCat = q.filter(col("route") === "bruteforce" && col("qtype").isin(1, 3))
    val bfCatRes = categoryLayout match {
      case Some(layout) =>
        val labels = bfCat.select(col("v")).distinct().collect().map(_.getLong(0))
        if (labels.isEmpty) KnnJoin.exactFlat(base.limit(0), bfCat, k, types = Seq(1, 3))
        else KnnJoin.exactFlat(layout.filter(col("label").isin(labels: _*)), bfCat, k,
          types = Seq(1, 3))
      case None => KnnJoin.exactFlat(base, bfCat, k, types = Seq(1, 3))
    }

    // remaining routes
    val rest = q.filter(!(col("route") === "bruteforce" && col("qtype").isin(1, 3)))
    val restRes =
      if (!ann) KnnJoin.exactFlat(base, rest, k)
      else {
        // approximate configuration — the reference's stage layout:
        //   type-0 → union over hash-bucket sub-indexes       (:306-333)
        //   type-1 → per-category sub-index                   (:239-298)
        //   type-2 → per-decile sub-indexes w/ in-filter      (:338-459)
        //   type-3 → in-filter walk of the category sub-index (:267,
        //            searcher.hpp:301-374); ef sloped by category size
        //   anything else → exact streaming join
        val slope = Some(SearchParams.EfSlope(annEf))
        val fullQ = rest.filter(col("route") === "full_graph")
        val catQ = rest.filter(col("route") === "category_graph" && col("qtype") === 1)
        val cat3Q = rest.filter(col("route") === "category_graph" && col("qtype") === 3)
        val intQ = rest.filter(col("route") === "interval_graph" && col("qtype") === 2)
        val exactQ = rest
          .filter(col("route") =!= "full_graph")
          .filter(!(col("route") === "category_graph" && col("qtype").isin(1, 3)))
          .filter(!(col("route") === "interval_graph" && col("qtype") === 2))
        AnnJoin.hnswKnn(
            base.select(col("id"), col("vec")),
            fullQ.select(col("qid"), col("qvec")), k, annEf, annBuckets)
          .unionByName(AnnJoin.categoryHnswKnn(
            base.select(col("id"), col("label"), col("vec")),
            catQ.select(col("qid"), col("v"), col("qvec")), k, annEf, efSlope = slope))
          .unionByName(AnnJoin.categoryRangeHnswKnn(
            base.select(col("id"), col("label"), col("ts"), col("vec")),
            cat3Q.select(col("qid"), col("v"), col("l"), col("r"), col("qvec")),
            k, annEf, efSlope = slope))
          .unionByName(AnnJoin.decileHnswKnn(
            base.select(col("id"), col("ts"), col("vec")),
            intQ.select(col("qid"), col("l"), col("r"), col("qvec")), k, annEf))
          .unionByName(KnnJoin.exactFlat(base, exactQ, k))
      }

    bfCatRes.unionByName(restRes)
  }
}
