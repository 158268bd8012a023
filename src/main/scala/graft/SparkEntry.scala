package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{KnnJoin, TopKAggregate}
import graft.functions.VectorFunctions

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a DuckDB-equivalent SQL in [[oracleSql]]
  * (same column names, types normalized to BIGINT/DOUBLE/STRING) unless the
  * operator is not SQL-expressible, in which case the driver records a
  * rows-only check.
  *
  * Embedders with their own SparkSession: apply [[GraftConf.tuned]] to the
  * builder. The contract queries here use ≤128-query batches and are safe
  * on a stock session, but WIDE query batches through any bounded-top-k
  * reduction need the raised ObjectHashAggregate threshold — the measured
  * cliff is in BASELINE.md (2M × 1000-query serve: 115.6 s stock vs
  * 4.7 s tuned). */
object SparkEntry {

  private[graft] def load(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Vector-search base table derived from `embeddings`: the reference's
    * base table shape (id, categorical label, normalized timestamp, vec) —
    * utils.h:257-276. `ts` is synthesized deterministically from vec_id so
    * the DuckDB oracle can reproduce it exactly. */
  private[graft] def vecBase(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "embeddings").select(
      col("vec_id").cast("long").as("id"),
      col("label").cast("long").as("label"),
      (col("vec_id") % 100 / lit(100.0)).as("ts"),
      col("embedding").as("vec"))

  /** Query batch derived from `embeddings` (the reference's 4 query types,
    * utils.h:491-548): every 50th vector queries the base; qtype/l/r cycle
    * deterministically. */
  private[graft] def vecQueries(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "embeddings")
      .filter(col("vec_id") % 50 === 0)
      .select(
        col("vec_id").cast("long").as("qid"),
        expr("cast((vec_id div 50) % 4 as int)").as("qtype"),
        col("label").cast("long").as("v"),
        (expr("(vec_id div 50) % 5") / lit(10.0)).as("l"),
        (expr("(vec_id div 50) % 5") / lit(10.0) + lit(0.45)).as("r"),
        col("embedding").as("qvec"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's entire query surface — predicate-filtered kNN over all
    * 4 query types — as one exact DataFrame job. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    KnnJoin.exactFlat(vecBase(spark, dir), vecQueries(spark, dir), k = 10)
  }

  /** Shared DuckDB SQL fragment: the derived vector base/query tables. */
  private val oracleVecCte =
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

  /** DuckDB double-accumulated squared L2 — must mirror
    * [[graft.functions.L2SquaredDistance]] op-for-op. */
  private def oracleL2Sq(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), " +
      "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = coreQueries ++
    graft.queries.RelationalQueries.queries ++
    graft.queries.TextQueries.queries ++
    graft.queries.VectorQueries.queries ++
    graft.queries.ApproxQueries.queries

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference core: hybrid predicate-filtered kNN (J1+A1, all 4 types)
    "knn_hybrid" -> ((s, dir) =>
      KnnJoin.exactFlat(vecBase(s, dir), vecQueries(s, dir), k = 10)),

    // ---- similarity search: brute-force cosine top-k (excluding self)
    "sim_cosine_topk" -> ((s, dir) => {
      val base = vecBase(s, dir)
      val q = load(s, dir, "embeddings")
        .filter(col("vec_id") % 71 === 3)
        .select(col("vec_id").cast("long").as("qid"), col("embedding").as("qvec"))
      broadcast(q).crossJoin(base)
        .filter(col("id") =!= col("qid"))
        .withColumn("negcos", -VectorFunctions.cosineSim(col("qvec"), col("vec")))
        .groupBy("qid")
        .agg(TopKAggregate.topkIds(5, col("negcos"), col("id")).as("nb"))
        .select(col("qid"), posexplode(col("nb")).as(Seq("r0", "nid")))
        .select(col("qid"), (col("r0") + 1).cast("long").as("rank"), col("nid"))
    }),

    // ---- TPC-H Q1-style pricing summary (scan + filter + groupBy agg)
    "q1_pricing_summary" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .filter(col("l_discount") <= 0.06)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))),

    // ---- exact deduplication: hash-groupBy on content (rep = min id)
    "dedup_exact" -> ((s, dir) =>
      load(s, dir, "documents")
        .groupBy(md5(col("text").cast("binary")).as("text_hash"))
        .agg(
          min(col("doc_id")).cast("long").as("rep_doc_id"),
          count(lit(1)).as("dup_count"))),

    // ---- text analysis: token counts / quality ratios
    "text_stats" -> ((s, dir) =>
      load(s, dir, "documents")
        .withColumn("toks", expr("filter(split(text, ' '), x -> x != '')"))
        .select(
          col("doc_id").cast("long").as("doc_id"),
          length(col("text")).cast("long").as("len_chars"),
          size(col("toks")).cast("long").as("n_tokens"),
          round(expr("aggregate(toks, 0L, (a, x) -> a + length(x))") / size(col("toks")), 4).as("avg_token_len"),
          round(expr("size(filter(toks, x -> array_contains(array('the','a','of','and','to','in'), x)))") /
            size(col("toks")).cast("double"), 4).as("stopword_ratio")))
  )

  def oracleSql: Map[String, String] = coreOracles ++
    graft.queries.RelationalQueries.oracles ++
    graft.queries.TextQueries.oracles ++
    graft.queries.VectorQueries.oracles ++
    graft.queries.ApproxQueries.oracles

  private def coreOracles: Map[String, String] = Map(
    "knn_hybrid" ->
      s"""WITH $oracleVecCte,
         |j AS (
         |  SELECT q.qid, b.id, ${oracleL2Sq("q.qvec", "b.vec")} AS dist
         |  FROM q, b
         |  WHERE (q.qtype = 0)
         |     OR (q.qtype = 1 AND b.label = q.v)
         |     OR (q.qtype = 2 AND b.ts BETWEEN q.l AND q.r)
         |     OR (q.qtype = 3 AND b.label = q.v AND b.ts BETWEEN q.l AND q.r)
         |), r AS (
         |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rnk
         |  FROM j
         |)
         |SELECT qid, CAST(rnk AS BIGINT) AS "rank", id AS nid FROM r WHERE rnk <= 10""".stripMargin,

    "sim_cosine_topk" ->
      s"""WITH $oracleVecCte,
         |qq AS (
         |  SELECT CAST(vec_id AS BIGINT) AS qid, embedding AS qvec
         |  FROM embeddings WHERE vec_id % 71 = 3
         |), j AS (
         |  SELECT qq.qid, b.id,
         |    -(list_sum(list_transform(list_zip(qq.qvec, b.vec), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         |      / (sqrt(list_sum(list_transform(qq.qvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |       * sqrt(list_sum(list_transform(b.vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) AS negcos
         |  FROM qq, b WHERE b.id != qq.qid
         |), r AS (
         |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY negcos, id) AS rnk
         |  FROM j
         |)
         |SELECT qid, CAST(rnk AS BIGINT) AS "rank", id AS nid FROM r WHERE rnk <= 5""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_discount <= 0.06
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS text_hash,
        |  CAST(min(doc_id) AS BIGINT) AS rep_doc_id,
        |  count(*) AS dup_count
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "text_stats" ->
      """WITH t AS (
        |  SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents
        |)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(length(text) AS BIGINT) AS len_chars,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  round(list_sum(list_transform(toks, x -> length(x))) / len(toks), 4) AS avg_token_len,
        |  round(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in'], x)))
        |        / CAST(len(toks) AS DOUBLE), 4) AS stopword_ratio
        |FROM t""".stripMargin
  )
}
