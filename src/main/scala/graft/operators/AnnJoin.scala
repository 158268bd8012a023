package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.index.HnswIndex

/** Approximate kNN join via partitioned HNSW sub-indexes — the Spark
  * re-expression of the reference's per-category / per-decile graph
  * dispatch (hybrid_graph.cpp:239-459):
  *
  *   1. hash-partition the base into `numBuckets` buckets;
  *   2. inside `mapPartitions`, build one HNSW per bucket and search the
  *      broadcast query batch against it (the reference's "query each
  *      sub-index, pool candidates" pattern, hybrid_graph.cpp:306-333);
  *   3. merge per-bucket candidates with the bounded top-k aggregate.
  *
  * Scale shape: the base is streamed exactly once and never shuffled
  * (hash repartition excepted); per-bucket index build is embarrassingly
  * parallel; the merge shuffles only (#queries × k × buckets) candidate
  * rows. For a 1000-executor cluster, numBuckets ≈ #cores and the query
  * batch is chunked if it exceeds broadcast budget.
  */
object AnnJoin {

  /** (qid LONG, rank LONG, nid LONG) approximate top-k by squared L2.
    * base: (id LONG, vec ARRAY<FLOAT>), queries: (qid LONG, qvec ARRAY<FLOAT>). */
  def hnswKnn(base: DataFrame, queries: DataFrame, k: Int, ef: Int = 200,
      numBuckets: Int = 8, m: Int = 16, efConstruction: Int = 200): DataFrame =
    hnswKnnBatch(base,
      queries.select(col("qid").cast("long"), col("qvec")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)),
      k, ef, numBuckets, m, efConstruction)

  /** Pre-collected query-batch form — composition layers (HybridKnn)
    * collect the routed batch once and feed every route from it. An
    * empty batch plans nothing (no base shuffle, no index build). */
  private[graft] def hnswKnnBatch(base: DataFrame, qBatch: Array[(Long, Array[Float])],
      k: Int, ef: Int, numBuckets: Int, m: Int = 16, efConstruction: Int = 200): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    if (qBatch.isEmpty) return spark.emptyDataset[(Long, Long, Long)].toDF("qid", "rank", "nid")
    val bq = spark.sparkContext.broadcast(qBatch)
    val candidates = base
      .select(col("id").cast("long"), col("vec"))
      .as[(Long, Array[Float])]
      .repartition(numBuckets, pmod(hash(col("id")), lit(numBuckets)))
      .mapPartitions { it =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val ids = rows.map(_._1)
          val index = HnswIndex.buildOn(rows.head._2.length, m, efConstruction,
            rows.iterator.map(_._2), HnswIndex.maxAbsOf(rows.iterator.map(_._2)))
          bq.value.iterator.flatMap { case (qid, qvec) =>
            index.search(qvec, k, ef).iterator.map { case (internal, d) =>
              (qid, ids(internal), d)
            }
          }
        }
      }
      .toDF("qid", "id", "dist")
    candidates
      .groupBy("qid")
      .agg(TopKAggregate.topkIds(k, col("dist"), col("id")).as("nb"))
      .select(col("qid"), posexplode(col("nb")).as(Seq("r0", "nid")))
      .select(col("qid"), (col("r0") + 1).cast("long").as("rank"), col("nid"))
  }

  /** Per-category ANN join for label-equality (type-1) queries — the
    * reference's per-category sub-index dispatch (hybrid_graph.cpp:47-70
    * build, :239-298 search). The base is co-partitioned by `label`, one
    * HNSW is built per label group, and each query is searched ONLY
    * against its own category's index — so the predicate holds by
    * construction. Labels above `maxRowsPerIndex` are salted into
    * sub-buckets (one giant category would otherwise be one straggler
    * task building one giant graph — the reference dedicates special
    * handling to exactly this, its maxc category); per-sub-index
    * candidates carry exact distances, so the bounded top-k merge yields
    * the final result either way.
    *
    * base: (id, label, vec); queries: (qid, v, qvec).
    * Returns (qid, rank, nid). */
  def categoryHnswKnn(base: DataFrame, queries: DataFrame, k: Int,
      ef: Int = 200, m: Int = 16, efConstruction: Int = 200,
      efSlope: Option[SearchParams.EfSlope] = None,
      maxRowsPerIndex: Int = 200000): DataFrame =
    categoryHnswKnnBatch(base,
      queries.select(col("qid").cast("long"), col("v").cast("long"), col("qvec"))
        .collect()
        .map(r => (r.getLong(1), (r.getLong(0), r.getSeq[Float](2).toArray)))
        .groupBy(_._1).map { case (l, xs) => (l, xs.map(_._2)) },
      k, ef, m, efConstruction, efSlope, maxRowsPerIndex)

  /** (label → sub-bucket count) for the requested labels: one small agg
    * job; labels under the cap keep a single sub-index. */
  private def labelSplits(base: DataFrame, labels: Iterable[Long],
      maxRowsPerIndex: Int): Map[Long, Int] = {
    val counts = base.filter(col("label").isin(labels.toSeq: _*))
      .groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    counts.map { case (l, c) =>
      l -> math.max(1, math.ceil(c.toDouble / maxRowsPerIndex).toInt)
    }.toMap
  }

  private[graft] def categoryHnswKnnBatch(base: DataFrame,
      qByLabel: Map[Long, Array[(Long, Array[Float])]], k: Int,
      ef: Int, m: Int = 16, efConstruction: Int = 200,
      efSlope: Option[SearchParams.EfSlope] = None,
      maxRowsPerIndex: Int = 200000): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    if (qByLabel.isEmpty) return spark.emptyDataset[(Long, Long, Long)].toDF("qid", "rank", "nid")
    val bq = spark.sparkContext.broadcast(qByLabel)
    val splits = labelSplits(base, qByLabel.keys, maxRowsPerIndex)
    val splitsCol = element_at(typedLit(splits), col("label"))
    base
      .select(col("id").cast("long"), col("label").cast("long"), col("vec"))
      .filter(col("label").isin(qByLabel.keys.toSeq: _*))
      .withColumn("sub", pmod(hash(col("id")), splitsCol).cast("int"))
      .as[(Long, Long, Array[Float], Int)]
      .repartition(col("label"), col("sub"))
      .mapPartitions { it =>
        it.toArray.groupBy(t => (t._2, t._4)).iterator
          .flatMap { case ((label, _), rows) =>
            val ids = rows.map(_._1)
            val index = HnswIndex.buildOn(rows.head._3.length, m, efConstruction,
              rows.iterator.map(_._3), HnswIndex.maxAbsOf(rows.iterator.map(_._3)))
            // ef sloped by category size (hybrid_graph.cpp:263-267)
            val effEf = efSlope.map(s => math.max(ef, s.efFor(rows.length))).getOrElse(ef)
            bq.value(label).iterator.flatMap { case (qid, qvec) =>
              index.search(qvec, k, effEf).iterator.map { case (internal, d) =>
                (qid, ids(internal), d)
              }
            }
          }
      }
      .toDF("qid", "id", "dist")
      .groupBy("qid")
      .agg(TopKAggregate.topkIds(k, col("dist"), col("id")).as("nb"))
      .select(col("qid"), posexplode(col("nb")).as(Seq("r0", "nid")))
      .select(col("qid"), (col("r0") + 1).cast("long").as("rank"), col("nid"))
  }

  /** Per-category ANN join for type-3 (label AND ts-range) queries — the
    * reference's `SearchCategoryRange` (searcher.hpp:301-374, dispatched
    * hybrid_graph.cpp:267, ef table hybrid_graph.h:32-33): search the
    * category's sub-index with an in-filter timestamp check, widening ef
    * by the inverse of the range's coverage (the narrower the slice, the
    * more of the walk's frontier the filter rejects). Predicate holds by
    * construction for the label and by the `allowed` filter for ts;
    * oversized labels are salted into sub-buckets (see
    * [[categoryHnswKnn]]) and merged through the bounded top-k.
    *
    * base: (id, label, ts, vec); queries: (qid, v, l, r, qvec).
    * Returns (qid, rank, nid). */
  def categoryRangeHnswKnn(base: DataFrame, queries: DataFrame, k: Int,
      ef: Int = 200, m: Int = 16, efConstruction: Int = 200,
      efSlope: Option[SearchParams.EfSlope] = None,
      maxRowsPerIndex: Int = 200000): DataFrame =
    categoryRangeHnswKnnBatch(base,
      queries
        .select(col("qid").cast("long"), col("v").cast("long"),
          col("l").cast("double"), col("r").cast("double"), col("qvec"))
        .collect()
        .map(r => (r.getLong(1),
          (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getSeq[Float](4).toArray)))
        .groupBy(_._1).map { case (l, xs) => (l, xs.map(_._2)) },
      k, ef, m, efConstruction, efSlope, maxRowsPerIndex)

  private[graft] def categoryRangeHnswKnnBatch(base: DataFrame,
      qByLabel: Map[Long, Array[(Long, Double, Double, Array[Float])]], k: Int,
      ef: Int, m: Int = 16, efConstruction: Int = 200,
      efSlope: Option[SearchParams.EfSlope] = None,
      maxRowsPerIndex: Int = 200000): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    if (qByLabel.isEmpty) return spark.emptyDataset[(Long, Long, Long)].toDF("qid", "rank", "nid")
    val bq = spark.sparkContext.broadcast(qByLabel)
    val splits = labelSplits(base, qByLabel.keys, maxRowsPerIndex)
    val splitsCol = element_at(typedLit(splits), col("label"))
    base
      .select(col("id").cast("long"), col("label").cast("long"),
        col("ts").cast("double"), col("vec"))
      .filter(col("label").isin(qByLabel.keys.toSeq: _*))
      .withColumn("sub", pmod(hash(col("id")), splitsCol).cast("int"))
      .as[(Long, Long, Double, Array[Float], Int)]
      .repartition(col("label"), col("sub"))
      .mapPartitions { it =>
        it.toArray.groupBy(t => (t._2, t._5)).iterator
          .flatMap { case ((label, _), rows) =>
            val ids = rows.map(_._1)
            val ts = rows.map(_._3)
            val index = HnswIndex.buildOn(rows.head._4.length, m, efConstruction,
              rows.iterator.map(_._4), HnswIndex.maxAbsOf(rows.iterator.map(_._4)))
            // coverage/seeds by binary search on the sorted-ts view —
            // O(log n) per query instead of a per-query O(n) scan
            // (hybrid_graph.cpp:181-199)
            val tsIdx = new graft.index.TsIndex(ts)
            val baseEf = efSlope.map(s => math.max(ef, s.efFor(rows.length))).getOrElse(ef)
            bq.value(label).iterator.flatMap { case (qid, l, r, qvec) =>
              val cover = tsIdx.coverage(l, r)
              val hits =
                if (cover < SearchParams.SmallCoverage)
                  // SMALL slice: exact scan beats any walk and is exact
                  index.exactOver(qvec, tsIdx.inRange(l, r), k)
                else {
                  val effEf = SearchParams.inFilterEf(baseEf, cover)
                  val allowed: Int => Boolean = j => ts(j) >= l && ts(j) <= r
                  index.search(qvec, k, effEf, allowed,
                    seeds = tsIdx.seeds(l, r, SearchParams.FilterSeeds))
                }
              hits.iterator.map { case (internal, d) => (qid, ids(internal), d) }
            }
          }
      }
      .toDF("qid", "id", "dist")
      .groupBy("qid")
      .agg(TopKAggregate.topkIds(k, col("dist"), col("id")).as("nb"))
      .select(col("qid"), posexplode(col("nb")).as(Seq("r0", "nid")))
      .select(col("qid"), (col("r0") + 1).cast("long").as("rank"), col("nid"))
  }

  /** Per-decile ANN join for timestamp-range (type-2) queries — the
    * reference's decile sub-index union (hybrid_graph.cpp:306-459 + J5):
    * base co-partitioned by `decile = floor(ts*10)`, one HNSW per decile
    * group; each query is searched only in deciles overlapping its
    * [l, r], with an in-filter `allowed` check on partially-covered
    * deciles (the reference's MEDIUM class) and an unfiltered walk on
    * fully-covered ones (FULL). Per-decile candidates carry exact
    * distances, so the bounded top-k merge yields the final result.
    *
    * base: (id, ts, vec); queries: (qid, l, r, qvec). → (qid, rank, nid). */
  def decileHnswKnn(base: DataFrame, queries: DataFrame, k: Int,
      ef: Int = 200, m: Int = 16, efConstruction: Int = 200): DataFrame =
    decileHnswKnnBatch(base,
      queries
        .select(col("qid").cast("long"), col("l").cast("double"),
          col("r").cast("double"), col("qvec"))
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getSeq[Float](3).toArray)),
      k, ef, m, efConstruction)

  private[graft] def decileHnswKnnBatch(base: DataFrame,
      qBatch: Array[(Long, Double, Double, Array[Float])], k: Int,
      ef: Int, m: Int = 16, efConstruction: Int = 200): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    if (qBatch.isEmpty) return spark.emptyDataset[(Long, Long, Long)].toDF("qid", "rank", "nid")
    val bq = spark.sparkContext.broadcast(qBatch)
    base
      .select(col("id").cast("long"), col("ts").cast("double"), col("vec"))
      .withColumn("decile", floor(col("ts") * 10).cast("int"))
      .as[(Long, Double, Array[Float], Int)]
      .repartition(col("decile"))
      .mapPartitions { it =>
        it.toArray.groupBy(_._4).iterator.flatMap { case (decile, rows) =>
          val bStart = decile / 10.0
          val bEnd = (decile + 1) / 10.0
          // closed query interval [l, r] vs half-open decile [bStart, bEnd):
          // r == bStart still matches rows with ts == r exactly. The low
          // side is inclusive too (l <= bEnd): floor(ts*10) on a double
          // just below a decile boundary files the row one bucket down
          // with ts == that bucket's bEnd, so a query with l exactly at
          // the boundary must still visit it (the in-filter keeps it
          // correct — ADVICE r2).
          val overlapping = bq.value.filter { case (_, l, r, _) => l <= bEnd && r >= bStart }
          if (overlapping.isEmpty) Iterator.empty
          else {
            val ids = rows.map(_._1)
            val ts = rows.map(_._2)
            val index = HnswIndex.buildOn(rows.head._3.length, m, efConstruction,
              rows.iterator.map(_._3), HnswIndex.maxAbsOf(rows.iterator.map(_._3)))
            val tsIdx = new graft.index.TsIndex(ts)
            overlapping.iterator.flatMap { case (qid, l, r, qvec) =>
              val full = l <= bStart && r >= bEnd
              val hits =
                if (full) index.search(qvec, k, ef)
                else {
                  // the reference's SplitInterval classes per partial
                  // bucket (hybrid_graph.cpp:338-459): SMALL coverage →
                  // exact slice scan, MEDIUM → seeded in-filter walk
                  val cover = tsIdx.coverage(l, r)
                  if (cover < SearchParams.SmallCoverage)
                    index.exactOver(qvec, tsIdx.inRange(l, r), k)
                  else {
                    val allowed: Int => Boolean = i => ts(i) >= l && ts(i) <= r
                    index.search(qvec, k, SearchParams.inFilterEf(ef, cover), allowed,
                      seeds = tsIdx.seeds(l, r, SearchParams.FilterSeeds))
                  }
                }
              hits.iterator.map { case (internal, d) => (qid, ids(internal), d) }
            }
          }
        }
      }
      .toDF("qid", "id", "dist")
      .groupBy("qid")
      .agg(TopKAggregate.topkIds(k, col("dist"), col("id")).as("nb"))
      .select(col("qid"), posexplode(col("nb")).as(Seq("r0", "nid")))
      .select(col("qid"), (col("r0") + 1).cast("long").as("rank"), col("nid"))
  }

  /** Recall@k of `approx` against `exact`, both (qid, rank, nid). */
  def recallAtK(approx: DataFrame, exact: DataFrame): Double = {
    val a = approx.groupBy("qid").agg(collect_set(col("nid")).as("got"))
    val e = exact.groupBy("qid").agg(collect_set(col("nid")).as("want"))
    val r = a.join(e, "qid")
      .select(avg(size(array_intersect(col("got"), col("want"))) / size(col("want"))))
      .head().getDouble(0)
    r
  }
}
