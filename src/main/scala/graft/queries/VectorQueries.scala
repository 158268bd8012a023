package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Quantization, Selectivity}

/** Physical-execution machinery of the reference as verifiable queries:
  * SQ8 quantization + two-stage refine, selectivity-based routing,
  * decile interval decomposition.
  */
object VectorQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  private def base(s: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.vecBase(s, dir)

  private def qs(s: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.vecQueries(s, dir)

  /** knn_stored's one-time store builds, factored out so the bench's
    * pre-pass can overlap them with the OTHER builder queries' ensure
    * blocks (disjoint store roots; guide §2.6). Independent store
    * paths inside too — overlapped builds, the ensureRouteStores
    * rationale. Idempotent: committed stores are skipped. */
  def ensureKnnStores(s: SparkSession, dir: String): String = {
    val root = StorePaths.taggedPath(s, "/tmp/graft_ann_store", dir)
    val b = base(s, dir)
    val builds = Seq.newBuilder[() => Unit]
    if (!new java.io.File(s"$root/by_hash/_SUCCESS").exists())
      builds += (() =>
        graft.index.AnnIndexStore.build(b.select(col("id"), col("vec")), s"$root/by_hash", 4))
    if (!new java.io.File(s"$root/by_label/_SUCCESS").exists())
      builds += (() =>
        graft.index.AnnIndexStore.buildBy(
          b.select(col("id"), col("label"), col("ts"), col("vec")), s"$root/by_label",
          "label", attrCol = Some("ts")))
    if (!new java.io.File(s"$root/by_decile/_SUCCESS").exists())
      builds += (() =>
        graft.index.AnnIndexStore.buildBy(
          b.withColumn("decile", floor(col("ts") * 10).cast("long")),
          s"$root/by_decile", "decile", attrCol = Some("ts")))
    graft.operators.ParallelActions.runAll(builds.result())
    root
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SQ8 two-stage refine: top-20 by int8 code distance, exact top-5 re-rank
    "sq8_refine_knn" -> ((s, dir) => {
      val e = emb(s, dir)
      val alpha = Quantization.trainAlpha(
        e.select(col("embedding").as("vec")), "vec")
      val b = e.select(col("vec_id").cast("long").as("id"), col("embedding").as("vec"))
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").cast("long").as("qid"), col("embedding").as("qvec"))
      Quantization.refineKnn(b, q, alpha, k = 5, refineK = 20)
    }),

    // per-query selectivity + adaptive route choice (reference thresholds)
    "selectivity_route" -> ((s, dir) =>
      Selectivity.routeQueries(base(s, dir), qs(s, dir))
        .select(col("qid"), col("qtype").cast("long").as("qtype"),
          col("matches"), col("sel"), col("route"))),

    // the SCALE stats path: selectivity from the precomputed
    // (label × decile) grid — exact for types 0/1, interpolated
    // histogram estimate for 2/3 (the reference's category_map +
    // timestamp_map lookup); oracle recomputes the estimator in SQL
    "selectivity_route_fast" -> ((s, dir) =>
      Selectivity.routeQueriesFast(base(s, dir), qs(s, dir))
        .select(col("qid"), col("qtype").cast("long").as("qtype"),
          col("sel"), col("route"))),

    // SplitInterval: decile decomposition of range predicates
    "interval_split" -> ((s, dir) =>
      Selectivity.splitInterval(
        qs(s, dir).filter(col("qtype").isin(2, 3)).select("qid", "l", "r"))
        .select(col("qid"), col("bucket").cast("long").as("bucket"),
          col("cover"), col("rf_class"))),

    // partition-pruned exact kNN: type-1/3 queries against the
    // label-partitioned clustered layout (same logical result as
    // knn_hybrid on those queries; the scan reads only matching
    // partition dirs — the reference's binary-searched category slice)
    "knn_pruned" -> ((s, dir) => {
      val layoutPath =
        s"${StorePaths.taggedPath(s, "/tmp/graft_layouts", dir)}/by_label"
      val layout = graft.operators.Layouts.ensureCategoryLayout(base(s, dir), layoutPath)
      val q13 = qs(s, dir).filter(col("qtype").isin(1, 3))
      val labels = q13.select(col("v")).distinct().collect().map(_.getLong(0))
      graft.operators.KnnJoin.exactFlat(
        layout.filter(col("label").isin(labels.toIndexedSeq: _*)), q13, 10, types = Seq(1, 3))
    }),

    // the full routed BatchSearch composition in its exact configuration:
    // stats pass → per-query route → pruned-layout scan for low-sel
    // category queries, streaming join for the rest → union. Same
    // logical result as knn_hybrid (shared oracle), different plan.
    "knn_routed" -> ((s, dir) => {
      val layoutPath =
        s"${StorePaths.taggedPath(s, "/tmp/graft_layouts", dir)}/by_label"
      val layout = graft.operators.Layouts.ensureCategoryLayout(base(s, dir), layoutPath)
      graft.operators.HybridKnn.execute(base(s, dir), qs(s, dir), 10, Some(layout))
    }),

    // the same routed composition in its APPROXIMATE configuration —
    // the reference's production BatchSearch: type-0 hash-bucket union,
    // type-1 category walk, type-2 decile in-filter, type-3 category
    // range walk, ef sloped by sub-index size. Rows-only check (recall
    // floors are asserted in CategoryAnnSpec/HybridKnnSpec).
    "knn_routed_ann" -> ((s, dir) =>
      graft.operators.HybridKnn.execute(base(s, dir), qs(s, dir), 10,
        ann = true, annEf = 150, annBuckets = 4)),

    // build-once/search-many lifecycle over PERSISTED index tables: the
    // hash-bucket store answers type-0, the per-label store (buildBy)
    // answers type-1 with the predicate by construction, and the decile
    // store (buildBy + ts attr) answers type-2 with the in-filter walk.
    // Rows-only; AnnIndexStoreSpec enforces recall + determinism.
    "knn_stored" -> ((s, dir) => {
      val root = ensureKnnStores(s, dir)
      val q = qs(s, dir)
      graft.index.AnnIndexStore.search(s, s"$root/by_hash",
          q.filter(col("qtype") === 0).select(col("qid"), col("qvec")), 10, 200)
        .unionByName(graft.index.AnnIndexStore.searchBy(s, s"$root/by_label",
          q.filter(col("qtype") === 1).select(col("qid"), col("v"), col("qvec")), 10, 200))
        .unionByName(graft.index.AnnIndexStore.searchDecileRange(s, s"$root/by_decile",
          q.filter(col("qtype") === 2).select(col("qid"), col("l"), col("r"), col("qvec")),
          10, 200))
        .unionByName(graft.index.AnnIndexStore.searchByRange(s, s"$root/by_label",
          q.filter(col("qtype") === 3)
            .select(col("qid"), col("v"), col("l"), col("r"), col("qvec")), 10, 200))
    }),

    // inner-product metric kNN (the reference's second metric, unused at
    // its runtime but supported: pyglass/glass/common.hpp:8-11)
    "knn_ip" -> ((s, dir) =>
      graft.operators.KnnJoin.exactFlat(
        base(s, dir),
        qs(s, dir).filter(col("qtype") === 0),
        k = 10, metric = "ip")),

    // asymmetric SQ8 kNN (X4/X8): per-dim (min, dif) codes, dequantizing
    // squared-L2 against raw query floats
    "sq8_asym_knn" -> ((s, dir) => {
      val e = emb(s, dir)
      val data = e.select(col("vec_id").cast("long").as("id"), col("embedding").as("vec"))
      val (mins, difs) = Quantization.trainAsym(data, "vec")
      val coded = data.withColumn("code", Quantization.asymEncode(col("vec"), mins, difs))
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").cast("long").as("qid"), col("embedding").as("qvec"))
      broadcast(q).crossJoin(coded.select(col("id"), col("code")))
        .withColumn("dist", Quantization.asymDistance(col("qvec"), col("code"), mins, difs))
        .groupBy("qid")
        .agg(graft.operators.TopKAggregate.topkIds(5, col("dist"), col("id")).as("nb"))
        .select(col("qid"), posexplode(col("nb")).as(Seq("r0", "nid")))
        .select(col("qid"), (col("r0") + 1).cast("long").as("rank"), col("nid"))
    }),

    // SQ4 4-bit packed kNN (X5): per-dim (min, dif) training, two dims
    // per byte, dequantizing squared-L2 against raw query floats
    "sq4_knn" -> ((s, dir) => {
      val e = emb(s, dir)
      val data = e.select(col("vec_id").cast("long").as("id"), col("embedding").as("vec"))
      val (mins, difs) = Quantization.trainAsym(data, "vec")
      val coded = data.withColumn("code", Quantization.sq4Encode(col("vec"), mins, difs))
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").cast("long").as("qid"), col("embedding").as("qvec"))
      broadcast(q).crossJoin(coded.select(col("id"), col("code")))
        .withColumn("dist", Quantization.sq4AsymDistance(col("qvec"), col("code"), mins, difs))
        .groupBy("qid")
        .agg(graft.operators.TopKAggregate.topkIds(5, col("dist"), col("id")).as("nb"))
        .select(col("qid"), posexplode(col("nb")).as(Seq("r0", "nid")))
        .select(col("qid"), (col("r0") + 1).cast("long").as("rank"), col("nid"))
    }),

    // 1-bit binary quantization kNN: sign-bit codes (32× compression),
    // integer Hamming candidate scan, exact fp32 re-rank — the extreme
    // end of the quantizer ladder (SQ8 sym/asym → SQ4 → PQ → 1-bit)
    "bq_knn" -> ((s, dir) => {
      val e = emb(s, dir)
      val b = e.select(col("vec_id").cast("long").as("id"), col("embedding").as("vec"))
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").cast("long").as("qid"), col("embedding").as("qvec"))
      Quantization.bqKnn(b, q, k = 5, refineK = 20)
    }),

    // recall aggregation (reference GetKNNRecall, utils.h:224-253):
    // mean |approx ∩ exact| / k of the SQ8 refine path vs the exact oracle
    "recall_eval" -> ((s, dir) => {
      val e = emb(s, dir)
      val alpha = Quantization.trainAlpha(e.select(col("embedding").as("vec")), "vec")
      val b = e.select(col("vec_id").cast("long").as("id"), col("embedding").as("vec"))
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").cast("long").as("qid"), col("embedding").as("qvec"))
      val approx = Quantization.refineKnn(b, q, alpha, k = 5, refineK = 20)
        .groupBy("qid").agg(collect_set(col("nid")).as("got"))
      val exact = graft.operators.KnnJoin.exactFlat(
        b.withColumn("label", lit(0L)).withColumn("ts", lit(0.0)),
        q.withColumn("qtype", lit(0)).withColumn("v", lit(0L))
          .withColumn("l", lit(0.0)).withColumn("r", lit(0.0)), 5)
        .groupBy("qid").agg(collect_set(col("nid")).as("want"))
      approx.join(exact, "qid")
        .select(col("qid"),
          (size(array_intersect(col("got"), col("want"))) / lit(5.0)).as("recall"))
    })
  )

  private val vecCte =
    """b AS (
      |  SELECT CAST(vec_id AS BIGINT) AS id, CAST(label AS BIGINT) AS label,
      |         (vec_id % 100) / 100.0 AS ts, embedding AS vec
      |  FROM embeddings
      |), q AS (
      |  SELECT CAST(vec_id AS BIGINT) AS qid,
      |         CAST((vec_id // 50) % 4 AS INT) AS qtype,
      |         CAST(label AS BIGINT) AS v,
      |         ((vec_id // 50) % 5) / 10.0 AS l,
      |         ((vec_id // 50) % 5) / 10.0 + 0.45 AS r,
      |         embedding AS qvec
      |  FROM embeddings WHERE vec_id % 50 = 0
      |)""".stripMargin

  /** knn_routed is exact → shares the knn_hybrid oracle semantics. */
  private val knnAllTypesOracle =
    s"""WITH $vecCte,
       |j AS (
       |  SELECT q.qid, b.id,
       |    list_sum(list_transform(list_zip(q.qvec, b.vec),
       |      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) AS dist
       |  FROM q, b
       |  WHERE (q.qtype = 0)
       |     OR (q.qtype = 1 AND b.label = q.v)
       |     OR (q.qtype = 2 AND b.ts BETWEEN q.l AND q.r)
       |     OR (q.qtype = 3 AND b.label = q.v AND b.ts BETWEEN q.l AND q.r)
       |), r AS (
       |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rnk
       |  FROM j
       |)
       |SELECT qid, CAST(rnk AS BIGINT) AS "rank", id AS nid FROM r WHERE rnk <= 10""".stripMargin

  val oracles: Map[String, String] = Map(
    "knn_routed" -> knnAllTypesOracle,

    // Approximate 4-type compositions whose deterministic builds reach
    // full recall at sf0.01 (input + bucketing + walk all seeded): the
    // exact all-types kNN is then a stable oracle for them too.
    "knn_stored" -> knnAllTypesOracle,
    "knn_routed_ann" -> knnAllTypesOracle,

    "knn_pruned" ->
      s"""WITH $vecCte,
         |j AS (
         |  SELECT q.qid, b.id,
         |    list_sum(list_transform(list_zip(q.qvec, b.vec),
         |      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) AS dist
         |  FROM q, b
         |  WHERE (q.qtype = 1 AND b.label = q.v)
         |     OR (q.qtype = 3 AND b.label = q.v AND b.ts BETWEEN q.l AND q.r)
         |), r AS (
         |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rnk
         |  FROM j
         |)
         |SELECT qid, CAST(rnk AS BIGINT) AS "rank", id AS nid FROM r WHERE rnk <= 10""".stripMargin,

    "knn_ip" ->
      s"""WITH $vecCte,
         |j AS (
         |  SELECT q.qid, b.id,
         |    -list_sum(list_transform(list_zip(q.qvec, b.vec),
         |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dist
         |  FROM q, b WHERE q.qtype = 0
         |), r AS (
         |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rnk
         |  FROM j
         |)
         |SELECT qid, CAST(rnk AS BIGINT) AS "rank", id AS nid FROM r WHERE rnk <= 10""".stripMargin,

    "sq8_refine_knn" ->
      """WITH al AS (
        |  SELECT max(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))) AS a
        |  FROM embeddings
        |), cb AS (
        |  SELECT CAST(vec_id AS BIGINT) AS id, embedding AS vec,
        |    list_transform(embedding, x ->
        |      CAST(round(greatest(least(CAST(x AS DOUBLE) / a, 1.0), -1.0) * 127.0) AS INT)) AS code
        |  FROM embeddings, al
        |), cq AS (
        |  SELECT id AS qid, vec AS qvec, code AS qcode FROM cb WHERE id % 50 = 0
        |), c AS (
        |  SELECT cq.qid, cb.id, cb.vec, cq.qvec,
        |    CAST(list_sum(list_transform(list_zip(cq.qcode, cb.code),
        |      p -> CAST(p[1] - p[2] AS BIGINT) * CAST(p[1] - p[2] AS BIGINT))) AS BIGINT) AS qdist,
        |    row_number() OVER (PARTITION BY cq.qid ORDER BY
        |      CAST(list_sum(list_transform(list_zip(cq.qcode, cb.code),
        |        p -> CAST(p[1] - p[2] AS BIGINT) * CAST(p[1] - p[2] AS BIGINT))) AS BIGINT), cb.id) AS crnk
        |  FROM cq, cb
        |), r AS (
        |  SELECT qid, id,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      list_sum(list_transform(list_zip(qvec, vec),
        |        p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), id) AS rnk
        |  FROM c WHERE crnk <= 20
        |)
        |SELECT qid, CAST(rnk AS BIGINT) AS "rank", id AS nid FROM r WHERE rnk <= 5""".stripMargin,

    "sq8_asym_knn" ->
      """WITH st AS (
        |  SELECT i, min(x) AS mn, greatest(max(x) - min(x), 1e-12) AS df
        |  FROM (SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
        |               generate_subscripts(embedding, 1) AS i FROM embeddings)
        |  GROUP BY i
        |), stl AS (
        |  SELECT list(mn ORDER BY i) AS mins, list(df ORDER BY i) AS difs FROM st
        |), cb AS (
        |  SELECT CAST(vec_id AS BIGINT) AS id,
        |    list_transform(range(1, len(embedding) + 1), i ->
        |      CAST(round((CAST(embedding[i] AS DOUBLE) - mins[i]) / difs[i] * 255.0) AS INT)) AS code
        |  FROM embeddings, stl
        |), q AS (
        |  SELECT CAST(vec_id AS BIGINT) AS qid, embedding AS qvec
        |  FROM embeddings WHERE vec_id % 50 = 0
        |), j AS (
        |  SELECT q.qid, cb.id,
        |    list_sum(list_transform(range(1, len(q.qvec) + 1), i ->
        |      (CAST(q.qvec[i] AS DOUBLE) - CAST(CAST(CAST(cb.code[i] AS DOUBLE) / 255.0 * difs[i] + mins[i] AS FLOAT) AS DOUBLE))
        |      * (CAST(q.qvec[i] AS DOUBLE) - CAST(CAST(CAST(cb.code[i] AS DOUBLE) / 255.0 * difs[i] + mins[i] AS FLOAT) AS DOUBLE)))) AS dist
        |  FROM q, cb, stl
        |), r AS (
        |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rnk
        |  FROM j
        |)
        |SELECT qid, CAST(rnk AS BIGINT) AS "rank", id AS nid FROM r WHERE rnk <= 5""".stripMargin,

    "sq4_knn" ->
      """WITH st AS (
        |  SELECT i, min(x) AS mn, greatest(max(x) - min(x), 1e-12) AS df
        |  FROM (SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
        |               generate_subscripts(embedding, 1) AS i FROM embeddings)
        |  GROUP BY i
        |), stl AS (
        |  SELECT list(mn ORDER BY i) AS mins, list(df ORDER BY i) AS difs FROM st
        |), cb AS (
        |  SELECT CAST(vec_id AS BIGINT) AS id,
        |    list_transform(range(1, len(embedding) + 1), i ->
        |      CAST(round(greatest(least((CAST(embedding[i] AS DOUBLE) - mins[i]) / difs[i], 1.0), 0.0) * 15.0) AS INT)) AS code
        |  FROM embeddings, stl
        |), q AS (
        |  SELECT CAST(vec_id AS BIGINT) AS qid, embedding AS qvec
        |  FROM embeddings WHERE vec_id % 50 = 0
        |), j AS (
        |  SELECT q.qid, cb.id,
        |    list_sum(list_transform(range(1, len(q.qvec) + 1), i ->
        |      (CAST(q.qvec[i] AS DOUBLE) - CAST(CAST(CAST(cb.code[i] AS DOUBLE) / 15.0 * difs[i] + mins[i] AS FLOAT) AS DOUBLE))
        |      * (CAST(q.qvec[i] AS DOUBLE) - CAST(CAST(CAST(cb.code[i] AS DOUBLE) / 15.0 * difs[i] + mins[i] AS FLOAT) AS DOUBLE)))) AS dist
        |  FROM q, cb, stl
        |), r AS (
        |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rnk
        |  FROM j
        |)
        |SELECT qid, CAST(rnk AS BIGINT) AS "rank", id AS nid FROM r WHERE rnk <= 5""".stripMargin,

    "bq_knn" ->
      """WITH cb AS (
        |  SELECT CAST(vec_id AS BIGINT) AS id, embedding AS vec FROM embeddings
        |), q AS (
        |  SELECT CAST(vec_id AS BIGINT) AS qid, embedding AS qvec
        |  FROM embeddings WHERE vec_id % 50 = 0
        |), c AS (
        |  SELECT q.qid, cb.id, cb.vec, q.qvec,
        |    row_number() OVER (PARTITION BY q.qid ORDER BY
        |      CAST(list_sum(list_transform(list_zip(q.qvec, cb.vec),
        |        p -> CASE WHEN (p[1] > 0) <> (p[2] > 0) THEN 1 ELSE 0 END)) AS BIGINT), cb.id) AS crnk
        |  FROM q, cb
        |), r AS (
        |  SELECT qid, id,
        |    row_number() OVER (PARTITION BY qid ORDER BY
        |      list_sum(list_transform(list_zip(qvec, vec),
        |        p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), id) AS rnk
        |  FROM c WHERE crnk <= 20
        |)
        |SELECT qid, CAST(rnk AS BIGINT) AS "rank", id AS nid FROM r WHERE rnk <= 5""".stripMargin,

    "recall_eval" ->
      """WITH al AS (
        |  SELECT max(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))) AS a
        |  FROM embeddings
        |), cb AS (
        |  SELECT CAST(vec_id AS BIGINT) AS id, embedding AS vec,
        |    list_transform(embedding, x ->
        |      CAST(round(greatest(least(CAST(x AS DOUBLE) / a, 1.0), -1.0) * 127.0) AS INT)) AS code
        |  FROM embeddings, al
        |), cq AS (
        |  SELECT id AS qid, vec AS qvec, code AS qcode FROM cb WHERE id % 50 = 0
        |), c AS (
        |  SELECT cq.qid, cb.id, cb.vec, cq.qvec,
        |    row_number() OVER (PARTITION BY cq.qid ORDER BY
        |      CAST(list_sum(list_transform(list_zip(cq.qcode, cb.code),
        |        p -> CAST(p[1] - p[2] AS BIGINT) * CAST(p[1] - p[2] AS BIGINT))) AS BIGINT), cb.id) AS crnk
        |  FROM cq, cb
        |), approx AS (
        |  SELECT qid, id FROM (
        |    SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY
        |      list_sum(list_transform(list_zip(qvec, vec),
        |        p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), id) AS rnk
        |    FROM c WHERE crnk <= 20
        |  ) WHERE rnk <= 5
        |), exact AS (
        |  SELECT qid, id FROM (
        |    SELECT cq.qid, cb.id,
        |      row_number() OVER (PARTITION BY cq.qid ORDER BY
        |        list_sum(list_transform(list_zip(cq.qvec, cb.vec),
        |          p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), cb.id) AS rnk
        |    FROM cq, cb
        |  ) WHERE rnk <= 5
        |)
        |SELECT a.qid, CAST(sum(CASE WHEN e.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) / 5.0 AS recall
        |FROM approx a LEFT JOIN exact e ON a.qid = e.qid AND a.id = e.id
        |GROUP BY a.qid""".stripMargin,

    "selectivity_route" ->
      s"""WITH $vecCte,
         |m AS (
         |  SELECT q.qid, CAST(q.qtype AS BIGINT) AS qtype, count(b.id) AS matches
         |  FROM q LEFT JOIN b ON
         |    (q.qtype = 0)
         |    OR (q.qtype = 1 AND b.label = q.v)
         |    OR (q.qtype = 2 AND b.ts >= q.l AND b.ts <= q.r)
         |    OR (q.qtype = 3 AND b.label = q.v AND b.ts >= q.l AND b.ts <= q.r)
         |  GROUP BY 1, 2
         |)
         |SELECT qid, qtype, matches,
         |  matches / (SELECT CAST(count(*) AS DOUBLE) FROM embeddings) AS sel,
         |  CASE WHEN qtype = 0 THEN 'full_graph'
         |       WHEN qtype = 3 AND matches / (SELECT CAST(count(*) AS DOUBLE) FROM embeddings) < 0.08 THEN 'bruteforce'
         |       WHEN qtype != 3 AND matches / (SELECT CAST(count(*) AS DOUBLE) FROM embeddings) < 0.045 THEN 'bruteforce'
         |       WHEN qtype = 1 OR qtype = 3 THEN 'category_graph'
         |       ELSE 'interval_graph' END AS route
         |FROM m""".stripMargin,

    "selectivity_route_fast" ->
      s"""WITH $vecCte,
         |nn AS (SELECT greatest(CAST(count(*) AS DOUBLE), 1.0) AS n FROM b),
         |cm AS (SELECT label, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY label),
         |hl AS (
         |  SELECT list(cnt ORDER BY d) AS hist FROM (
         |    SELECT ds.d, CAST(coalesce(h.cnt, 0) AS DOUBLE) AS cnt
         |    FROM (SELECT unnest(range(0, 10)) AS d) ds
         |    LEFT JOIN (
         |      SELECT CAST(floor(ts * 10) AS INT) AS d, count(*) AS cnt
         |      FROM b GROUP BY 1
         |    ) h ON ds.d = h.d
         |  )
         |),
         |se AS (
         |  SELECT q.qid, CAST(q.qtype AS BIGINT) AS qtype,
         |    CAST(coalesce(cm.cnt, 0) AS BIGINT) AS catcnt,
         |    list_sum(list_transform(range(0, 10), d ->
         |      greatest(0.0, (least(q.r, (d + 1) / 10.0) - greatest(q.l, d / 10.0)) * 10.0)
         |        * hl.hist[d + 1])) AS rangecnt,
         |    nn.n AS n
         |  FROM q
         |  LEFT JOIN cm ON cm.label = q.v
         |  CROSS JOIN hl CROSS JOIN nn
         |)
         |SELECT qid, qtype,
         |  CASE WHEN qtype = 0 THEN 1.0
         |       WHEN qtype = 1 THEN catcnt / n
         |       WHEN qtype = 2 THEN rangecnt / n
         |       ELSE (catcnt / n) * (rangecnt / n) END AS sel,
         |  CASE WHEN qtype = 0 THEN 'full_graph'
         |       WHEN qtype = 3 AND (catcnt / n) * (rangecnt / n) < 0.08 THEN 'bruteforce'
         |       WHEN qtype != 3 AND (CASE WHEN qtype = 1 THEN catcnt / n ELSE rangecnt / n END) < 0.045 THEN 'bruteforce'
         |       WHEN qtype = 1 OR qtype = 3 THEN 'category_graph'
         |       ELSE 'interval_graph' END AS route
         |FROM se""".stripMargin,

    "interval_split" ->
      s"""WITH $vecCte,
         |rq AS (SELECT qid, l, r FROM q WHERE qtype IN (2, 3)),
         |bk AS (
         |  SELECT bucket, bucket / 10.0 AS bstart, (bucket + 1) / 10.0 AS bend
         |  FROM (SELECT unnest(range(0, 10)) AS bucket)
         |)
         |SELECT qid, CAST(bucket AS BIGINT) AS bucket,
         |  (least(r, bend) - greatest(l, bstart)) / (bend - bstart) AS cover,
         |  CASE WHEN (least(r, bend) - greatest(l, bstart)) / (bend - bstart) < 0.2 THEN 'SMALL'
         |       WHEN (least(r, bend) - greatest(l, bstart)) / (bend - bstart) >= 0.999999 THEN 'FULL'
         |       ELSE 'MEDIUM' END AS rf_class
         |FROM rq, bk
         |WHERE l < bend AND r > bstart""".stripMargin
  )
}
