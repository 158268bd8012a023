package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming event pipeline. Every transform here accepts a
  * batch OR streaming DataFrame with the `events` schema
  * (event_id LONG, ts LONG /*ns*/, user_id LONG, event_type STRING,
  * value DOUBLE) — the streaming-capable twins of the batch queries in
  * [[graft.queries.RelationalQueries]]. The reference is strictly batch
  * (SURVEY §2.10); these extend the engine to continuous ingestion.
  */
object EventPipeline {

  case class UserTotals(n: Long, sum: Double)

  private def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("ets", timestamp_micros(expr("ts div 1000")))

  /** Hourly tumbling-window aggregates per event type. With a 2h
    * watermark on streaming input; the watermark is a no-op in batch. */
  def hourlyAgg(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("ets", "2 hours")
      .groupBy(window(col("ets"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Custom arbitrary-state streaming: cumulative per-user totals kept
    * in `GroupState` across micro-batches (mapGroupsWithState) — the
    * extension point for state machines no built-in aggregation covers.
    * Emits the updated (user_id, n_events, sum_value) per batch; in
    * batch mode it degenerates to a plain grouped aggregate. */
  def runningUserTotals(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserTotals, (Long, Long, Double)](GroupStateTimeout.NoTimeout) {
        case (user, rows, state) =>
          var n = 0L
          var sum = 0.0
          state.getOption.foreach { s => n = s.n; sum = s.sum }
          rows.foreach { r => n += 1; sum += r._2 }
          state.update(UserTotals(n, sum))
          (user, n, sum)
      }
      .toDF("user_id", "n_events", "sum_value")
  }

  /** STREAMING exact dedup — the continuous-ingestion form of
    * [[graft.operators.Dedup.exactGroups]]: keyed by content hash, the
    * first document to arrive with a given hash is emitted, every later
    * duplicate is dropped, with the seen-set held in `GroupState` across
    * micro-batches (flatMapGroupsWithState — the standard first-wins
    * streaming dedup; state is one (hash → first id) entry per distinct
    * content). Within one micro-batch, the smallest id wins, so batch
    * mode degenerates to exactGroups' min-id representative choice and
    * the MemoryStream run is asserted ≡ the batch twin in
    * `EventPipelineSpec`. Input: (idCol, textCol); output
    * (text_hash, doc_id). */
  def streamingExactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(md5(col(textCol).cast("binary")).as("th"),
        col(idCol).cast("long").as("doc_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (hash, rows, state) =>
          if (state.exists) {
            // duplicates of an already-seen content hash: drop
            Iterator.empty
          } else {
            var minId = Long.MaxValue
            rows.foreach { r => if (r._2 < minId) minId = r._2 }
            state.update(minId)
            Iterator.single((hash, minId))
          }
      }
      .toDF("text_hash", "doc_id")
  }

  case class SeenVecs(vecs: Array[Array[Float]])

  /** STREAMING semantic dedup — the continuous-ingestion form of
    * [[graft.operators.Dedup.semanticDedup]]: rows are assigned to the
    * given (offline-trained) centroids by the same folded-literal
    * codegen argmin, grouped by cluster, and a row is dropped when its
    * cosine to ANY earlier-arrived row of its cluster reaches
    * `minCosine` — earlier rows count whether they were kept or
    * dropped, the exact drop rule of the batch operator. Within one
    * micro-batch rows are processed in id order, so with id-ordered
    * arrival the output is precisely the batch survivor set (kept = 1
    * rows of `semdedup_prune`; MemoryStream ≡ batch twin asserted in
    * EventPipelineSpec, and the DuckDB oracle replays the batch run).
    *
    * State per cluster is every seen vector — the price of the exact
    * any-earlier rule under continuous ingestion (the batch path bounds
    * pair work by banding instead, which has no arrival-order
    * contract); at dim d that is 4·d bytes per ingested row, so
    * production deployments bound it upstream (per-cluster TTL or an
    * SRP-signature state compaction). Centroids are trained offline
    * ([[graft.operators.SimilaritySearch.seededCentroids]] or
    * `lloydKMeans`) because a stream cannot run the seed-pick collect.
    * (id, vec) → (id, cluster) survivors. */
  def streamingSemanticDedup(rows: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], minCosine: Double): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import graft.functions.{VectorFunctions => VF}
    val spark = rows.sparkSession
    import spark.implicits._
    val centsFlat = typedLit(centroids.flatten)
    val tau = minCosine
    rows.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
        element_at(VF.nearestCentroids(col(vecCol), centsFlat, lit(1)), 1)
          .cast("long").as("cluster"))
      .as[(Long, Array[Float], Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[SeenVecs, (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (cluster, it, state) =>
          val seen = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
          state.getOption.foreach(s => seen ++= s.vecs)
          val out = Seq.newBuilder[(Long, Long)]
          it.toArray.sortBy(_._1).foreach { case (id, v, _) =>
            val dup = seen.exists(b => cosine(v, b) >= tau)
            seen += v
            if (!dup) out += ((id, cluster))
          }
          state.update(SeenVecs(seen.toArray))
          out.result().iterator
      }
      .toDF("id", "cluster")
  }

  /** Sequential-double cosine — op-for-op the `vec_dot / (nrm · nrm)`
    * chain the batch operator filters on (dot over the common prefix,
    * norms over each full array), so streaming and batch make identical
    * keep/drop decisions at the threshold. */
  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
    var na = 0.0
    i = 0
    while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
    var nb = 0.0
    i = 0
    while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Stream-stream interval join: each purchase paired with every signup
    * of the same user in the preceding hour. Both sides carry watermarks
    * and the join condition is time-bounded — exactly what Spark requires
    * to bound join state in streaming (late rows beyond the watermark are
    * dropped, matched state is evicted past the interval). In batch the
    * same plan is a plain equi+range join; the driver's oracle checks
    * that twin. */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val e = withEventTime(events)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ets").as("pts"))
      .withWatermark("pts", "2 hours")
    val signups = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"),
        col("ets").as("sts"))
      .withWatermark("sts", "2 hours")
    purchases.join(signups,
        col("user_id") === col("s_user") &&
          col("sts") <= col("pts") &&
          col("sts") >= col("pts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id").cast("long").as("purchase_id"),
        col("user_id").cast("long").as("user_id"),
        col("signup_id").cast("long").as("signup_id"),
        (unix_micros(col("pts")) - unix_micros(col("sts"))).as("latency_us"))
  }

  /** Session-window (30-min gap) event counts per user — Spark's native
    * session_window, usable in streaming with watermark + append mode. */
  def sessionAgg(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("ets", "2 hours")
      .groupBy(session_window(col("ets"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
}
