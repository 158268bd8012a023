package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational operator coverage (joins, windows, sorts, set ops,
  * scalar/date/JSON functions, sessionization) over the TPC-H-ish corpus.
  *
  * Cross-engine determinism rules used throughout (the DuckDB oracle must
  * hash-match bit-for-bit):
  *  - per-row scalar arithmetic is emitted RAW (identical IEEE doubles in
  *    both engines); `round` is only applied to order-varying aggregates;
  *  - every output is explicitly non-null (`coalesce`) — null handling in
  *    pandas/parquet dtype bridges is not worth betting on;
  *  - every LIMIT sits on a total order (unique tie-break columns);
  *  - event-time arithmetic is integer nanoseconds (`nanosAsLong`).
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.ts normalized to integer epoch ns whatever the parquet
    * encoding generation — see [[graft.sources.Events]]. */
  private def events(s: SparkSession, dir: String): DataFrame =
    graft.sources.Events.read(s, dir)

  private val HourUs = 3600L * 1000 * 1000
  private val SessionGapUs = 1800L * 1000 * 1000

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 3-way join + group + deterministic top-10 (TPC-H Q3 shape)
    "q3_shipping_priority" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select(
          col("l_orderkey").cast("long").as("l_orderkey"),
          col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
    }),

    // 6-way join: revenue by region/nation with local-supplier condition (Q5 shape)
    "q5_nation_revenue" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem"); val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(su, l("l_suppkey") === su("s_suppkey") && c("c_nationkey") === su("s_nationkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // ranking window: top-3 orders per customer
    "window_top_orders" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(
          col("o_custkey").cast("long").as("o_custkey"),
          col("o_orderkey").cast("long").as("o_orderkey"),
          col("rnk").cast("long").as("rnk"),
          col("o_totalprice"))
    }),

    // frame window: running spend + lag within customer order history
    "window_running_spend" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("running_spend",
          round(sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
        .withColumn("prev_order", coalesce(lag(col("o_orderkey"), 1).over(w), lit(-1L)))
        .select(
          col("o_custkey").cast("long").as("o_custkey"),
          col("o_orderkey").cast("long").as("o_orderkey"),
          col("running_spend"),
          col("prev_order").cast("long").as("prev_order"))
    }),

    // global sort + deterministic limit
    "sort_limit_lineitem" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
        .select(
          col("l_orderkey").cast("long").as("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_extendedprice"))),

    // second-moment statistics (stddev / variance / correlation)
    "stats_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_extendedprice")), 2).as("var_price"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(avg(col("l_discount")), 6).as("avg_disc"))),

    // hierarchical ROLLUP aggregation (grouping sets)
    "rollup_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))),

    // exact distinct aggregation
    "distinct_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows"))),

    // exact interpolated percentiles (median + p90)
    "percentile_prices" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, 0.5)").as("p50"),
          expr("percentile(l_extendedprice, 0.9)").as("p90"),
          round(expr("percentile(l_quantity, array(0.25, 0.75))")(0), 4).as("q1_qty"),
          round(expr("percentile(l_quantity, array(0.25, 0.75))")(1), 4).as("q3_qty"))),

    // conditional (pivot-style) aggregation
    "pivot_status_revenue" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          round(sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0.0)), 2).as("rev_f"),
          round(sum(when(col("o_orderstatus") === "O", col("o_totalprice")).otherwise(0.0)), 2).as("rev_o"),
          round(sum(when(col("o_orderstatus") === "P", col("o_totalprice")).otherwise(0.0)), 2).as("rev_p"),
          count(lit(1)).as("n"))),

    // array aggregation: ordered collect + array ops
    "array_agg_orders" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey").cast("long").as("o_custkey"))
        .agg(sort_array(collect_list(col("o_orderkey").cast("long"))).as("ok"))
        .select(
          col("o_custkey"),
          size(col("ok")).cast("long").as("n_orders"),
          element_at(col("ok"), 1).as("first_order"),
          element_at(col("ok"), -1).as("last_order"))),

    // semi/anti joins (EXISTS / NOT EXISTS)
    "semi_anti_orders" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      val semi = c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
        .select(col("c_custkey").cast("long").as("c_custkey"))
        .withColumn("tag", lit("has_urgent"))
      val anti = c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
        .select(col("c_custkey").cast("long").as("c_custkey"))
        .withColumn("tag", lit("no_urgent"))
      semi.unionByName(anti)
    }),

    // correlated aggregate: orders above their customer's average price
    "above_avg_orders" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val avgs = o.groupBy(col("o_custkey").as("ck"))
        .agg(avg(col("o_totalprice")).as("cavg"))
      o.join(avgs, o("o_custkey") === avgs("ck"))
        .filter(col("o_totalprice") > col("cavg"))
        .select(
          col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_custkey").cast("long").as("o_custkey"),
          col("o_totalprice"))
    }),

    // set operations: INTERSECT / EXCEPT
    "setop_customers" -> ((s, dir) => {
      val ck = t(s, dir, "customer").select(col("c_custkey").cast("long").as("k"))
      val ok = t(s, dir, "orders").select(col("o_custkey").cast("long").as("k"))
      ck.intersect(ok).withColumn("tag", lit("with_orders"))
        .unionByName(ck.except(ok).withColumn("tag", lit("without_orders")))
    }),

    // event-time tumbling window aggregation (integer-ns bucketing)
    "events_hourly" -> ((s, dir) =>
      events(s, dir)
        .groupBy(expr(s"(ts div 1000) div $HourUs").as("hour_bucket"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          round(sum(col("value")), 2).as("sum_value"))),

    // JSON extraction + aggregation
    "events_json" -> ((s, dir) =>
      events(s, dir)
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"), col("value"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))),

    // scalar string/conditional functions (raw doubles, no rounding)
    "part_scalar" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey").cast("long").as("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 4).as("name_prefix"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_extract(col("p_brand"), "[0-9]+", 0).cast("long").as("brand_num"),
        when(col("p_size") > 25, "large").when(col("p_size") > 10, "medium")
          .otherwise("small").as("size_class"),
        (col("p_retailprice") * col("p_size")).as("price_volume"))),

    // as-of join shape: each purchase paired with the user's most recent
    // prior-or-same-time signup (windowed last_value IGNORE NULLS — the
    // composition that covers DuckDB's native ASOF JOIN semantics)
    "asof_last_signup" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      events(s, dir)
        .withColumn("tus", expr("ts div 1000"))
        .withColumn("last_signup",
          last(when(col("event_type") === "signup", col("tus")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(
          col("event_id").cast("long").as("event_id"),
          col("user_id").cast("long").as("user_id"),
          col("tus").as("purchase_us"),
          coalesce(col("last_signup"), lit(-1L)).as("signup_us"))
    }),

    // sessionization: 30-min-gap sessions per user (lag + conditional sum).
    // Event time is truncated to MICROseconds: DuckDB's TIMESTAMP is us, so
    // the oracle can only see us precision on the ns-encoded parquet column.
    "sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      events(s, dir)
        .withColumn("tus", expr("ts div 1000"))
        .withColumn("prev_ts", lag(col("tus"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull || col("tus") - col("prev_ts") > SessionGapUs, 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(
          sum(col("new_session")).as("n_sessions"),
          count(lit(1)).as("n_events"),
          max(col("tus") - coalesce(col("prev_ts"), col("tus"))).as("max_gap_us"))
        .select(col("user_id").cast("long").as("user_id"),
          col("n_sessions"), col("n_events"), col("max_gap_us"))
    }),

    // CUBE grouping sets: every (returnflag × linestatus) subtotal level.
    // Group columns are never null in the corpus, so coalesce-to-'ALL'
    // identifies subtotal rows unambiguously in both engines.
    "cube_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("revenue"))),

    // lateral explode (UDTF shape): part type text → one row per token
    "part_tokens" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey").cast("long").as("p_partkey"),
          explode(split(col("p_type"), " ")).as("word"))
        .select(col("p_partkey"), col("word"),
          length(col("word")).cast("long").as("word_len"))),

    // range self-join: pairs of same-user events within a 5-minute
    // window — equi key (user) + range condition, the classic
    // interval-join shape (event-time at µs for oracle parity)
    "event_pairs_range" -> ((s, dir) => {
      // SmallBase: the pair enumeration otherwise runs in the event
      // scan's ONE split (single-row-group gate parquet); above the
      // bound the self-join shuffles by uid as before
      val e = graft.operators.SmallBase.parallelize(
        events(s, dir).select(col("event_id").cast("long").as("eid"),
          col("user_id").cast("long").as("uid"), expr("ts div 1000").as("tus")))
      val a = e.select(col("eid").as("eid_a"), col("uid"), col("tus").as("t_a"))
      val b = e.select(col("eid").as("eid_b"), col("uid"), col("tus").as("t_b"))
      a.join(b, Seq("uid"))
        .filter(col("eid_a") < col("eid_b") &&
          col("t_b") >= col("t_a") && col("t_b") <= col("t_a") + lit(300000000L))
        .groupBy(col("uid"))
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // skew-mitigation pattern with exact semantics: the build side is
    // replicated over 8 salt values, the probe side hashes into one —
    // the classic salted equi-join; the result is identical to the
    // plain join (the oracle runs the unsalted form)
    // PARTIAL skew salting — the scale-correct form: detect heavy-hitter
    // join keys (bounded: top-1024 by count over a threshold — at 100 TB
    // the heavy list must be capped, never |keys|-sized), replicate the
    // build side ONLY for those keys, plain-join everything else, union.
    // Naive full-side ×salts explosion replicates the entire dimension
    // for the benefit of a handful of hot keys. The threshold here is
    // low enough that the corpus genuinely exercises both branches;
    // exact semantics either way (oracle = plain join).
    "salted_join_revenue" -> ((s, dir) => {
      val salts = 8
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val heavyKeys = l.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 5).orderBy(desc("n"), col("l_orderkey")).limit(1024)
        .select(col("l_orderkey")).collect().map(_.getLong(0)).toSeq
      val isHeavy = col("l_orderkey").isin(heavyKeys: _*)
      val oIsHeavy = col("o_orderkey").isin(heavyKeys: _*)
      val salted = l.filter(isHeavy)
        .withColumn("lsalt", pmod(hash(col("l_orderkey"), col("l_extendedprice")), lit(salts)))
        .join(o.filter(oIsHeavy)
            .withColumn("osalt", explode(sequence(lit(0), lit(salts - 1)))),
          col("l_orderkey") === col("o_orderkey") && col("lsalt") === col("osalt"))
      val plain = l.filter(!isHeavy)
        .join(o.filter(!oIsHeavy), col("l_orderkey") === col("o_orderkey"))
      salted.select(col("o_orderpriority"), col("l_extendedprice"), col("l_discount"))
        .unionByName(plain.select(col("o_orderpriority"), col("l_extendedprice"), col("l_discount")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
    }),

    // lead window + event-time arithmetic: gap to each customer's next
    // order (rows without a next order are excluded — no-null outputs)
    "order_gaps" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("ous"), col("o_orderkey"))
      t(s, dir, "orders")
        // o_orderdate is TIMESTAMP_NTZ; session tz is pinned UTC, so the
        // cast is the identity on the naive value (what epoch_us sees)
        .withColumn("ous", unix_micros(col("o_orderdate").cast("timestamp")))
        .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
        .withColumn("next_us", lead(col("ous"), 1).over(w))
        .filter(col("next_key").isNotNull)
        .select(col("o_custkey").cast("long").as("o_custkey"),
          col("o_orderkey").cast("long").as("o_orderkey"),
          col("next_key").cast("long").as("next_orderkey"),
          (col("next_us") - col("ous")).as("gap_us"))
    }),

    // source/sink breadth: events → CSV sink → CSV source (schema'd)
    // → aggregate; the oracle aggregates the same logical rows from
    // parquet (doubles round-trip losslessly through Spark's CSV)
    "csv_roundtrip_agg" -> ((s, dir) => {
      val path = s"/tmp/graft_csv/${dir.replaceAll("[^a-zA-Z0-9]", "_")}/events"
      events(s, dir)
        .select(col("event_id").cast("long"), col("user_id").cast("long"),
          col("event_type"), col("value").cast("double"))
        .write.mode("overwrite").option("header", "true").csv(path)
      s.read.option("header", "true")
        .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
        .csv(path)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          round(sum(col("value")), 2).as("sum_value"))
    }),

    // multiset set op: INTERSECT ALL keeps duplicate cardinalities
    // (customers' order counts in both status classes)
    "setop_all_orders" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey").cast("long").as("k"))
        .intersectAll(
          o.filter(col("o_orderstatus") === "F").select(col("o_custkey").cast("long").as("k")))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
    }),

    // z-order clustered scan: ONE Morton-interleaved layout of orders on
    // (o_custkey, o_totalprice) serves selective predicates on EITHER
    // column — the reference needs a sorted replica per dimension
    // (utils.h:403-434); a point probe on an n-file z-layout overlaps
    // ~sqrt(n) files instead of all (file-stats disjointness is
    // spec-asserted in ZorderSpec; results here are oracle-checked
    // against the plain table)
    "zorder_orders_scan" -> ((s, dir) => {
      val path = s"/tmp/graft_zorder/${graft.sources.ParquetMeta.storeTag(s, dir, "orders")}"
      graft.operators.Zorder.layout(t(s, dir, "orders"), "o_custkey", "o_totalprice", path,
        gcPrefix = Some(graft.sources.ParquetMeta.storePrefix(dir, "orders")))
      val z = s.read.parquet(path)
      def probe(name: String, f: org.apache.spark.sql.Column): DataFrame =
        z.filter(f).agg(count(lit(1)).as("n"),
          round(sum(round(col("o_totalprice"), 2).cast("decimal(28,2)")), 2)
            .cast("double").as("sum_price"))
          .select(lit(name).as("probe"), col("n"), col("sum_price"))
      probe("custkey_point", col("o_custkey") === 721)
        .unionByName(probe("price_range",
          col("o_totalprice") >= 100000 && col("o_totalprice") < 150000))
    }),

    // bucketed co-located join: both sides stored hash-bucketed on the
    // join key (one-time shuffle at write), so the join AND the
    // key-rooted aggregation plan with zero Exchange — the storage-level
    // answer to the repeated fact⋈fact shuffle at 100 TB. Result is
    // identical to the plain join; the physical plan is asserted
    // exchange-free in BucketingSpec.
    "bucketed_join_revenue" -> ((s, dir) => graft.operators.Bucketing.revenuePerOrder(s, dir))
  )

  val oracles: Map[String, String] = Map(
    "q3_shipping_priority" ->
      """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_orderpriority
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND o_orderkey = l_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "window_top_orders" ->
      """SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
        |  CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |  CAST(rnk AS BIGINT) AS rnk, o_totalprice
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders
        |) WHERE rnk <= 3""".stripMargin,

    "window_running_spend" ->
      """SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
        |  CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
        |  CAST(coalesce(lag(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), -1) AS BIGINT) AS prev_order
        |FROM orders""".stripMargin,

    "sort_limit_lineitem" ->
      """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
        |  CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,

    "stats_agg" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_extendedprice), 2) AS var_price,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(avg(l_discount), 6) AS avg_disc
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "rollup_revenue" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "percentile_prices" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.9) AS p90,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS q1_qty,
        |  round(quantile_cont(l_quantity, 0.75), 4) AS q3_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "pivot_status_revenue" ->
      """SELECT o_orderpriority,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END), 2) AS rev_f,
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END), 2) AS rev_o,
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0.0 END), 2) AS rev_p,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "array_agg_orders" ->
      """WITH g AS (
        |  SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
        |    list_sort(list(CAST(o_orderkey AS BIGINT))) AS ok
        |  FROM orders GROUP BY 1
        |)
        |SELECT o_custkey, CAST(len(ok) AS BIGINT) AS n_orders,
        |  ok[1] AS first_order, ok[-1] AS last_order
        |FROM g""".stripMargin,

    "semi_anti_orders" ->
      """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, 'has_urgent' AS tag
        |FROM customer c WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |UNION ALL
        |SELECT CAST(c_custkey AS BIGINT) AS c_custkey, 'no_urgent' AS tag
        |FROM customer c WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin,

    "above_avg_orders" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |  CAST(o_custkey AS BIGINT) AS o_custkey, o_totalprice
        |FROM orders o
        |JOIN (SELECT o_custkey AS ck, avg(o_totalprice) AS cavg
        |      FROM orders GROUP BY 1) a ON o.o_custkey = a.ck
        |WHERE o_totalprice > cavg""".stripMargin,

    "setop_customers" ->
      """SELECT k, 'with_orders' AS tag FROM (
        |  SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
        |  INTERSECT SELECT CAST(o_custkey AS BIGINT) FROM orders)
        |UNION ALL
        |SELECT k, 'without_orders' AS tag FROM (
        |  SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
        |  EXCEPT SELECT CAST(o_custkey AS BIGINT) FROM orders)""".stripMargin,

    "events_hourly" ->
      """SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
        |  count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "events_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,

    "part_scalar" ->
      """SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
        |  upper(p_name) AS name_upper,
        |  substr(p_name, 1, 4) AS name_prefix,
        |  p_brand || '|' || p_type AS brand_type,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  CAST(regexp_extract(p_brand, '[0-9]+', 0) AS BIGINT) AS brand_num,
        |  CASE WHEN p_size > 25 THEN 'large' WHEN p_size > 10 THEN 'medium'
        |       ELSE 'small' END AS size_class,
        |  p_retailprice * p_size AS price_volume
        |FROM part""".stripMargin,

    "asof_last_signup" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus FROM events
        |), w AS (
        |  SELECT event_id, user_id, event_type, tus,
        |    last_value(CASE WHEN event_type = 'signup' THEN tus END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY tus, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup
        |  FROM e
        |)
        |SELECT CAST(event_id AS BIGINT) AS event_id,
        |  CAST(user_id AS BIGINT) AS user_id,
        |  CAST(tus AS BIGINT) AS purchase_us,
        |  CAST(coalesce(last_signup, -1) AS BIGINT) AS signup_us
        |FROM w WHERE event_type = 'purchase'""".stripMargin,

    "sessionize" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) AS tus,
        |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_ts
        |  FROM events
        |)
        |SELECT CAST(user_id AS BIGINT) AS user_id,
        |  CAST(sum(CASE WHEN prev_ts IS NULL OR tus - prev_ts > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events,
        |  CAST(max(tus - coalesce(prev_ts, tus)) AS BIGINT) AS max_gap_us
        |FROM g GROUP BY user_id""".stripMargin,

    "cube_revenue" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "part_tokens" ->
      """WITH x AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
        |    unnest(string_split(p_type, ' ')) AS word
        |  FROM part
        |)
        |SELECT p_partkey, word, CAST(length(word) AS BIGINT) AS word_len
        |FROM x""".stripMargin,

    "event_pairs_range" ->
      """WITH e AS (
        |  SELECT event_id AS eid, CAST(user_id AS BIGINT) AS uid, epoch_us(ts) AS tus
        |  FROM events
        |)
        |SELECT a.uid AS uid, count(*) AS n_pairs
        |FROM e a JOIN e b ON a.uid = b.uid AND a.eid < b.eid
        |  AND b.tus >= a.tus AND b.tus <= a.tus + 300000000
        |GROUP BY a.uid""".stripMargin,

    "salted_join_revenue" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "order_gaps" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS ous FROM orders
        |), w AS (
        |  SELECT o_custkey, o_orderkey, ous,
        |    lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY ous, o_orderkey) AS next_key,
        |    lead(ous) OVER (PARTITION BY o_custkey ORDER BY ous, o_orderkey) AS next_us
        |  FROM o
        |)
        |SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
        |  CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |  CAST(next_key AS BIGINT) AS next_orderkey,
        |  CAST(next_us - ous AS BIGINT) AS gap_us
        |FROM w WHERE next_key IS NOT NULL""".stripMargin,

    "csv_roundtrip_agg" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,

    "setop_all_orders" ->
      """SELECT k, count(*) AS n FROM (
        |  SELECT CAST(o_custkey AS BIGINT) AS k FROM orders WHERE o_orderstatus = 'O'
        |  INTERSECT ALL
        |  SELECT CAST(o_custkey AS BIGINT) AS k FROM orders WHERE o_orderstatus = 'F'
        |) GROUP BY k""".stripMargin,

    "zorder_orders_scan" ->
      """SELECT 'custkey_point' AS probe, CAST(count(*) AS BIGINT) AS n,
        |  CAST(round(sum(CAST(round(o_totalprice, 2) AS DECIMAL(28,2))), 2) AS DOUBLE)
        |    AS sum_price
        |FROM orders WHERE o_custkey = 721
        |UNION ALL
        |SELECT 'price_range', CAST(count(*) AS BIGINT),
        |  CAST(round(sum(CAST(round(o_totalprice, 2) AS DECIMAL(28,2))), 2) AS DOUBLE)
        |FROM orders WHERE o_totalprice >= 100000 AND o_totalprice < 150000""".stripMargin,

    "bucketed_join_revenue" ->
      """SELECT l_orderkey, o_orderpriority, count(*) AS n_items,
        |  CAST(round(sum(CAST(round(l_extendedprice * (1.0 - l_discount), 6)
        |    AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_orderkey, o_orderpriority""".stripMargin
  )
}
