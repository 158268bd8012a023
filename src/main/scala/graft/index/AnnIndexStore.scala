package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TopKAggregate

/** Batch ANN index construction + reuse — the "DataFrame batch index
  * build" shape: one Spark job buckets the base and persists one HNSW
  * per bucket as a parquet row (bucket, ids, graph bytes); any number of
  * later query batches load the index table and search it without
  * touching the raw base again. The Spark analog of the reference's
  * build-then-batch-search lifecycle (baseline.cpp:96-152).
  *
  * At 100 TB: buckets ≈ #cores × small multiple; each bucket row is a
  * self-contained sub-index (tens of MB), the index table is just
  * another parquet dataset — replicated, partition-pruned, cacheable.
  */
object AnnIndexStore {

  // ---- write-time store version: the serving cache's invalidation key --
  //
  // Every store write ends by stamping a fresh unique token into
  // `_store_version` AFTER the parquet job commits. The SQL serving path
  // keys its executor-resident graph cache on (path, version, bucket,
  // sub) — all readable without touching the blob column — so a warm
  // statement reads zero blob bytes, and a rebuilt store at the same
  // path misses (new token) instead of serving stale graphs. A missing
  // file (legacy store, or a writer that died between the parquet commit
  // and the stamp) downgrades readers to the content-fingerprint path:
  // slower, never stale. The stamp rides INSIDE the store directory, so
  // compactDelta's rename swap carries it with the data it describes.

  // private[graft]: probes/specs that hide or delete a stamp to drive
  // the fingerprint fallback must share the one name, not copy it
  private[graft] val versionFileName = "_store_version"

  /** Stamp `dir` with a fresh version token — call AFTER the store's
    * data files are committed. */
  def stampVersion(dir: java.io.File): Unit =
    java.nio.file.Files.write(
      new java.io.File(dir, versionFileName).toPath,
      java.util.UUID.randomUUID().toString.getBytes("UTF-8"))

  /** The store's write-time version token, if stamped. */
  def storeVersion(path: String): Option[String] = {
    val f = new java.io.File(path.stripSuffix("/"), versionFileName)
    if (!f.exists()) None
    else Some(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim)
      .filter(_.nonEmpty)
  }

  // ---- tuned effort-band sidecar (`_ef_bands`) -----------------------
  //
  // [[EfTuner.tuneBands]] derives a store's own EfBands table and
  // persists it here; the banded search arms (searchDecileRange /
  // searchByRange with efBands = true) load it per call and fall back
  // to the hand-derived SearchParams defaults when absent or corrupt.

  private val efBandsFileName = "_ef_bands"

  def writeEfBands(path: String, bands: graft.operators.EfBands): Unit =
    java.nio.file.Files.write(
      new java.io.File(path.stripSuffix("/"), efBandsFileName).toPath,
      bands.serialize.getBytes("UTF-8"))

  def efBandsOf(path: String): Option[graft.operators.EfBands] = {
    val f = new java.io.File(path.stripSuffix("/"), efBandsFileName)
    if (!f.exists()) None
    else graft.operators.EfBands.parse(
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
  }

  /** Test observability: the last (store path, table) a banded search
    * arm resolved — the spec's proof that lifecycle arms actually load
    * the tuned sidecar rather than silently using the defaults. */
  @volatile private[index] var lastBandsLoaded: Option[(String, graft.operators.EfBands)] = None

  /** The banded arms' band-table resolution: the store's tuned sidecar
    * when present, else the hand defaults; recorded for specs. */
  private def resolveBands(path: String): graft.operators.EfBands = {
    val loaded = efBandsOf(path)
    lastBandsLoaded = loaded.map(path -> _)
    loaded.getOrElse(graft.operators.SearchParams.DefaultBands)
  }

  /** Build and persist the bucketed index table.
    * base: (id LONG, vec ARRAY<FLOAT>). */
  def build(base: DataFrame, path: String, numBuckets: Int,
      m: Int = 16, efConstruction: Int = 200): Unit = {
    val spark = base.sparkSession
    import spark.implicits._
    base.select(col("id").cast("long"), col("vec"),
        pmod(hash(col("id")), lit(numBuckets)).cast("int").as("bucket"))
      .as[(Long, Array[Float], Int)]
      .repartition(numBuckets, col("bucket"))
      // group by the bucket VALUE inside the partition: repartition
      // re-hashes the value, so two values can collide into one
      // partition — building per partition would then produce one
      // double-size index and leave another partition empty (observed
      // at the 10M probe: a 625k-row bucket next to 312k ones)
      .mapPartitions { it =>
        it.toArray.groupBy(_._3).iterator.map { case (bucket, rows) =>
          val index = HnswIndex.buildOn(rows.head._2.length, m, efConstruction,
            rows.iterator.map(_._2), HnswIndex.maxAbsOf(rows.iterator.map(_._2)))
          (bucket, rows.map(_._1), index.toBytes)
        }
      }
      .toDF("bucket", "ids", "graph")
      // UNCOMPRESSED: a graph blob is packed fp32 + int8 codes +
      // adjacency — snappy saves almost nothing on it, and parquet's
      // snappy codec (NonBlockedDecompressor) stages every page through
      // DIRECT ByteBuffers sized to the page: a ~200 MB blob costs each
      // scan task ~650 MB of direct memory (compressed input +
      // uncompressed output), which is what exhausted
      // MaxDirectMemorySize=20g at 32 threads in the r9/r10 full-scale
      // runs. Uncompressed pages read through plain heap buffers.
      .write.mode("overwrite").option("compression", "uncompressed").parquet(path)
    stampVersion(new java.io.File(path.stripSuffix("/")))
  }

  /** Build sub-indexes per VALUE of `bucketCol` (label, decile, …) —
    * the reference's per-category/per-decile build-once lifecycle
    * (hybrid_graph.cpp:47-89): later query batches search only their
    * own value's sub-index rows. Persisted as (bucket, ids, graph)
    * rows; a value above `maxRowsPerIndex` spans several salted rows.
    * base: (id LONG, <bucketCol> LONG, vec ARRAY<FLOAT>). */
  /** `attrCol` (optional) persists one aligned double per row (e.g. the
    * raw timestamp) so range predicates can run the in-filter walk
    * against the stored sub-index ([[searchDecileRange]]).
    *
    * `attrSalted` (requires `attrCol`): oversized buckets split into
    * ATTR-CONTIGUOUS sub-chunks (consecutive (attr, id) rank) instead
    * of hash(id) salt. Hash salting spreads every range query's slice
    * across ALL of a bucket's sub-graphs — the measured type-2 wall at
    * the 10M contest point, and the same amplification on the type-3
    * label+range path; contiguous chunks let [[searchByRange]]'s banded
    * arm skip sub-rows whose [attr_min, attr_max] misses the query
    * range before even deserializing them. Changes sub-graph MEMBERSHIP
    * (walk results can differ at equal recall), so hash-gated oracle
    * stores keep the default. */
  def buildBy(base: DataFrame, path: String, bucketCol: String,
      m: Int = 16, efConstruction: Int = 200,
      attrCol: Option[String] = None,
      maxRowsPerIndex: Int = 200000,
      attrSalted: Boolean = false): Unit = {
    val spark = base.sparkSession
    import spark.implicits._
    require(!attrSalted || attrCol.isDefined, "attrSalted requires attrCol")
    val attr = attrCol.map(c => col(c).cast("double")).getOrElse(lit(0.0))
    val keyed = base.select(col("id").cast("long"),
      col(bucketCol).cast("long").as("bucket"), attr.as("attr"), col("vec"))
    // oversized bucket values split into salted sub-indexes — one giant
    // bucket would otherwise be one straggler task building one giant
    // graph; readers merge sub-rows through the bounded top-k
    val salted =
      if (attrSalted) {
        // per-bucket (attr, id) rank → chunks of ≤ maxRowsPerIndex
        // consecutive rows; the biggest bucket is one sort partition,
        // the same skew its graph build pays anyway
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("bucket").orderBy(col("attr"), col("id"))
        keyed.withColumn("sub",
          ((row_number().over(w) - 1) / maxRowsPerIndex).cast("int"))
      } else {
        val splits = keyed.groupBy("bucket").agg(count(lit(1)).as("cnt"))
          .collect()
          .map(r => r.getLong(0) ->
            math.max(1, math.ceil(r.getLong(1).toDouble / maxRowsPerIndex).toInt))
          .toMap
        val splitsCol = element_at(typedLit(splits), col("bucket"))
        keyed.withColumn("sub", pmod(hash(col("id")), splitsCol).cast("int"))
      }
    salted
      .as[(Long, Long, Double, Array[Float], Int)]
      .repartition(col("bucket"), col("sub"))
      .mapPartitions { it =>
        it.toArray.groupBy(t => (t._2, t._5)).iterator.map { case ((bucket, sub), rowsIn) =>
          // insert in (attr, id) order: node ids then align with the
          // ts-sorted view (TsIndex.perm ≈ identity), so a range
          // slice's SQ8 codes are one CONTIGUOUS run — the sequential
          // layout the reference keeps by sorting each decile before
          // building (utils.h:403-434 + the aligned-code trick,
          // hybrid_graph.cpp:505-524). Shuffle arrival order would
          // scatter every slice scan across the codes array.
          val rows = rowsIn.sortBy(t => (t._3, t._1))
          val index = HnswIndex.buildOn(rows.head._4.length, m, efConstruction,
            rows.iterator.map(_._4), HnswIndex.maxAbsOf(rows.iterator.map(_._4)))
          // `sub` persisted: (bucket, sub) uniquely names this row, so
          // the serving cache can key it without hashing the blob.
          // attr_min/attr_max (rows are (attr, id)-sorted): the range
          // skip bound — parquet column min/max stats prune row GROUPS,
          // these prune per ROW before the blob is deserialized
          (bucket, sub, rows.map(_._1), rows.map(_._3), index.toBytes,
            rows.head._3, rows.last._3)
        }
      }
      .toDF("bucket", "sub", "ids", "attrs", "graph", "attr_min", "attr_max")
      // record WHICH column the aligned attrs came from, so range routes
      // can refuse an index whose attrs are the 0.0 placeholder (a label
      // index built without attrCol would otherwise silently answer
      // type-3 statements wrong — ADVICE r2)
      .withColumn("attr_col", lit(attrCol.orNull))
      // uncompressed for the same direct-memory reason as [[build]]
      .write.mode("overwrite").option("compression", "uncompressed").parquet(path)
    stampVersion(new java.io.File(path.stripSuffix("/")))
  }

  /** IVF-routed stored index: sampled k-means++ centroids as the coarse
    * quantizer, one HNSW sub-index per centroid list (salted above
    * `maxRowsPerIndex` like [[buildBy]]), centroids persisted alongside
    * the list table. The scale path for UNFILTERED kNN over a stored
    * index: a hash-bucketed [[build]] store must walk every bucket per
    * query (B× walk amplification — 32 walks/query at the 10M contest
    * probe), while centroid routing reads only `nprobe` lists.
    * base: (id LONG, vec ARRAY<FLOAT>). */
  def buildIvf(base: DataFrame, path: String, nlist: Int,
      m: Int = 16, efConstruction: Int = 200,
      sampleCap: Int = 16384, seed: Long = 7L,
      maxRowsPerIndex: Int = 200000): Unit = {
    val spark = base.sparkSession
    import spark.implicits._
    // Hash-spread training sample: limit() would take the scan's FIRST
    // sampleCap rows — one file's locality at warehouse scale, a biased
    // quantizer (all centroids land in that file's data region). A
    // deterministic id-hash stride samples uniformly across the corpus
    // for one full scan of the id column (vec fetched only for matches).
    val nRows = base.select(count(lit(1))).collect()(0).getLong(0)
    val stride = math.max(1L, nRows / math.max(1, sampleCap))
    val sample = base
      .filter(pmod(hash(col("id")), lit(stride)) === 0)
      .select(col("vec")).limit(sampleCap)
      .collect().map(_.getSeq[Float](0).toArray)
    val centroids = graft.operators.SimilaritySearch.lloydKMeans(sample, nlist, 10, seed)
    writeIvf(base, path, centroids, m, efConstruction, maxRowsPerIndex)
  }

  /** Seeded-IVF stored index: centroids are the deterministic
    * md5-ordered row pick of
    * [[graft.operators.SimilaritySearch.ivfKnnSeeded]] (no Lloyd
    * iterations), so list membership — and therefore the nprobe-limited
    * serving candidate set of an [[org.apache.spark.sql.graft.AnnCatalog]]
    * `ivfIndex` registration — is replayable by a SQL oracle
    * (`ann_sql_ivf`). [[buildIvf]] (k-means centroids) stays the quality
    * path; this is the verifiability path with the same storage layout. */
  def buildIvfSeeded(base: DataFrame, path: String, nlist: Int,
      m: Int = 16, efConstruction: Int = 200,
      maxRowsPerIndex: Int = 200000): Unit = {
    // ONE definition of the seed formula: the SQL oracles (ann_sql_ivf,
    // ann_ivfpq_knn, semdedup_prune) replay it verbatim, so a second
    // hand-maintained copy here would silently break hash parity for
    // one consumer the day the other is edited
    writeIvf(base, path,
      graft.operators.SimilaritySearch.seededCentroids(base, "id", "vec", nlist),
      m, efConstruction, maxRowsPerIndex)
  }

  /** Shared IVF tail: persist the centroid table, assign every row to
    * its nearest centroid (codegen argmin, ties by list index), build
    * one HNSW per list. */
  private def writeIvf(base: DataFrame, path: String,
      centroids: Array[Array[Float]], m: Int, efConstruction: Int,
      maxRowsPerIndex: Int): Unit = {
    val spark = base.sparkSession
    import spark.implicits._
    centroids.zipWithIndex.map { case (cv, i) => (i, cv) }.toSeq
      .toDF("list", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val centsFlat = typedLit(centroids.flatten)
    buildBy(
      base.withColumn("list",
        element_at(graft.functions.VectorFunctions.nearestCentroids(
          col("vec"), centsFlat, lit(1)), 1).cast("long")),
      s"$path/lists", "list", m, efConstruction,
      attrCol = None, maxRowsPerIndex = maxRowsPerIndex)
  }

  /** Residual IVF-PQ stored index — the persisted form of
    * [[graft.operators.SimilaritySearch.ivfPqKnnSeeded]]'s in-memory
    * encode, and the layout the 100-TB argument rests on: the codes
    * table is written `partitionBy("list")`, so a query batch's
    * `nprobe` probed lists become STATIC partition filters on the scan
    * — the engine reads nprobe/nlist of an m-ints-per-row table and
    * never touches the other lists' files (the reference's
    * "route before you scan", hybrid_graph.cpp:306-333, as a storage
    * property). Sidecars: `centroids` (list, centroid) and `codebook`
    * (c, bvec — residual rows). Refine reads full vectors from the
    * caller's base table, not the store — codes stay the only derived
    * artifact.
    *
    * Seeded variant (md5 row picks, engine-replayable routing). */
  def buildIvfPqSeeded(base: DataFrame, path: String, nlist: Int,
      m: Int = 8, ksub: Int = 256): Unit = {
    val b = base.select(col("id").cast("long").as("id"), col("vec"))
    val coarse = graft.operators.SimilaritySearch.seededCentroids(b, "id", "vec", nlist)
    val book = graft.operators.SimilaritySearch.seededResidualBook(b, ksub, coarse)
    writeIvfPq(b, path, coarse, book, m)
  }

  /** Trained IVF-PQ stored index: Lloyd coarse + per-subspace Lloyd
    * residual codebooks (the quality path; see
    * [[graft.operators.SimilaritySearch.ivfPqKnnTrained]]). */
  def buildIvfPq(base: DataFrame, path: String, nlist: Int,
      m: Int = 8, ksub: Int = 256, sampleCap: Int = 16384,
      maxIter: Int = 10, seed: Long = 7L): Unit = {
    val b = base.select(col("id").cast("long").as("id"), col("vec"))
    val (coarse, book) = graft.operators.SimilaritySearch.trainedIvfPqBooks(
      b, nlist, m, ksub, sampleCap, maxIter, seed)
    writeIvfPq(b, path, coarse, book, m)
  }

  private def writeIvfPq(b: DataFrame, path: String,
      coarse: Array[Array[Float]], book: Array[Array[Float]], m: Int): Unit = {
    val spark = b.sparkSession
    import spark.implicits._
    val dim = coarse(0).length
    require(dim % m == 0, s"writeIvfPq: dim $dim not divisible by m=$m")
    val sub = dim / m
    coarse.zipWithIndex.map { case (cv, i) => (i, cv) }.toSeq
      .toDF("list", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    // m rides in the sidecar: readers must not pay a codes-scan probe
    // job per search call just to recover a build-time constant (the
    // same per-call-probe smell as the r8 dim-probe finding)
    book.zipWithIndex.map { case (bv, c) => (c, bv, m) }.toSeq
      .toDF("c", "bvec", "m")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
    val centsFlat = typedLit(coarse.flatten)
    val subBooks = graft.operators.SimilaritySearch.pqSubBooks(book, m, sub)
    b.withColumn("list",
        element_at(graft.functions.VectorFunctions.nearestCentroids(
          col("vec"), centsFlat, lit(1)), 1))
      .withColumn("codes",
        graft.operators.SimilaritySearch.pqCodesCol(
          graft.operators.SimilaritySearch.pqResidualCol(col("vec"), col("list"), centsFlat, dim),
          subBooks, m, sub))
      .select(col("id"), col("codes"), col("list"))
      .write.mode("overwrite").partitionBy("list").parquet(s"$path/codes")
  }

  /** Search a [[buildIvfPq]]/[[buildIvfPqSeeded]] store: per query,
    * route to the `nprobe` nearest stored centroids, prune the codes
    * scan to those list partitions (STATIC `isin` filter — the probed
    * set is collected once, bounded by nlist), ADC-rank with
    * per-(query,list) tables over the query's residual, then exact
    * refine against the caller's `base` (id, vec). Matches the
    * in-memory [[graft.operators.SimilaritySearch.ivfPqKnnSeeded]]
    * semantics bit-for-bit at equal parameters (self-excluding,
    * (dist, id) orders). (qid, rank, nid). */
  def searchIvfPq(spark: SparkSession, path: String, base: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int = 8,
      refineK: Int = 100): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    import graft.operators.{SimilaritySearch => SS, TopKAggregate}
    val coarse = spark.read.parquet(s"$path/centroids")
      .select(col("list").cast("int"), col("centroid"))
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).map(_._2)
    val bookRows = spark.read.parquet(s"$path/codebook")
      .select(col("c").cast("int"), col("bvec"), col("m").cast("int"))
      .collect()
    require(bookRows.nonEmpty, s"searchIvfPq: empty codebook at $path")
    val book = bookRows.map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).map(_._2)
    val m = bookRows(0).getInt(2) // build-time constant, from the sidecar
    val dim = coarse(0).length
    val ksub = book.length
    val centsFlat = typedLit(coarse.flatten)
    val bookFlat = typedLit(book.flatten)

    // tracked persist: used by the bounded list collect AND the cand
    // join; released through the shared CacheRegistry lifecycle (an
    // inline unpersist here would race the caller's lazy execution)
    val probed = graft.operators.CacheRegistry.tracked(queries
      .select(col("qid").cast("long").as("qid"), col("qvec"))
      .withColumn("list",
        explode(VF.nearestCentroids(col("qvec"), centsFlat,
          lit(math.min(nprobe, coarse.length)))))
      .withColumn("adc_table",
        VF.pqAdcTable(SS.pqResidualCol(col("qvec"), col("list"), centsFlat, dim), bookFlat, lit(m)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // the probed-list set is ≤ nlist values: one bounded collect turns
    // routing into a STATIC partition filter on the codes scan
    val lists = probed.select(col("list")).distinct().collect().map(_.getInt(0)).sorted
    val codes = spark.read.parquet(s"$path/codes")
      .where(col("list").isin(lists.map(Integer.valueOf): _*))
      .select(col("id"), col("list").cast("int").as("list"), col("codes"))

    val cand = broadcast(probed.select(col("qid"), col("list"), col("adc_table")))
      .join(codes, "list")
      .filter(col("id") =!= col("qid"))
      .withColumn("adc", VF.pqAdcSum(col("codes"), col("adc_table"), lit(ksub)))
      .groupBy("qid")
      .agg(TopKAggregate.topkIds(refineK, col("adc"), col("id")).as("cands"))
      .select(col("qid"), explode(col("cands")).as("id"))

    val q = queries.select(col("qid").cast("long").as("qid"), col("qvec"))
    broadcast(cand.join(broadcast(q), "qid"))
      .join(base.select(col("id").cast("long").as("id"), col("vec")), "id")
      .withColumn("dist", VF.l2Sq(col("qvec"), col("vec")))
      .groupBy("qid")
      .agg(TopKAggregate.topkIds(k, col("dist"), col("id")).as("nb"))
      .select(col("qid"), posexplode(col("nb")).as(Seq("r0", "nid")))
      .select(col("qid"), (col("r0") + 1).cast("long").as("rank"), col("nid"))
  }

  /** Search a [[buildIvf]] table: each query fans out to its `nprobe`
    * nearest centroid lists and the per-list candidates merge through
    * the bounded top-k ([[searchBy]] machinery — several rows per list
    * when the build salted an oversized one). (qid, rank, nid). */
  def searchIvf(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, ef: Int = 200, nprobe: Int = 4): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("list").cast("int"), col("centroid"))
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val centsFlat = typedLit(cents.flatMap(_._2))
    val probed = queries.select(col("qid"),
        explode(graft.functions.VectorFunctions.nearestCentroids(
          col("qvec"), centsFlat, lit(math.min(nprobe, cents.length)))).as("probe"),
        col("qvec"))
      .select(col("qid"), col("probe").cast("long").as("v"), col("qvec"))
    searchBy(spark, s"$path/lists", probed, k, ef)
  }

  /** Chunked [[searchIvf]] for query batches too large to hold on the
    * driver at once: streams `chunkRows`-sized slices through
    * `toLocalIterator` (the [[searchChunked]] pattern), routes each
    * slice to its `nprobe` nearest centroid lists driver-side (the
    * centroid table is already driver-resident; nlist·dim flops per
    * query ≈1 s per 100k chunk at nlist=128 dim=100), and unions the
    * eagerly-materialized per-chunk results. Peak driver memory is one
    * chunk, independent of total batch size. */
  def searchIvfChunked(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, ef: Int = 200, nprobe: Int = 4, chunkRows: Int = 100000): DataFrame = {
    import spark.implicits._
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("list").cast("int"), col("centroid"))
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).map(_._2)
    val np = math.min(nprobe, cents.length)
    val results = queryChunks(queries, chunkRows).map { chunk =>
      val qByBucket = chunk.iterator.flatMap { case (qid, qvec) =>
        nearestLists(cents, np, qvec).iterator.map(l => (l, (qid, qvec)))
      }.toArray.groupBy(_._1).map { case (b, xs) => (b, xs.map(_._2)) }
      searchByBatch(spark, s"$path/lists", qByBucket, k, ef).localCheckpoint(eager = true)
    }.toSeq
    if (results.isEmpty) spark.emptyDataset[(Long, Long, Long)].toDF("qid", "rank", "nid")
    else results.reduce(_.unionByName(_))
  }

  /** Driver-side centroid routing: the `np` nearest list ids for one
    * query via a bounded max-heap (drain order irrelevant — the
    * per-list candidates merge through the bounded top-k downstream). */
  private def nearestLists(cents: Array[Array[Float]], np: Int,
      q: Array[Float]): Array[Long] = {
    val heap = new scala.collection.mutable.PriorityQueue[(Double, Int)]()(Ordering.by(_._1))
    var li = 0
    while (li < cents.length) {
      val c = cents(li)
      var d = 0.0
      var i = 0
      while (i < c.length) { val t = q(i) - c(i); d += t * t; i += 1 }
      if (heap.size < np) heap.enqueue((d, li))
      else if (d < heap.head._1) { heap.dequeue(); heap.enqueue((d, li)) }
      li += 1
    }
    heap.iterator.map((p: (Double, Int)) => p._2.toLong).toArray
  }

  /** [[searchIvfChunked]] in the [[searchChunkedTo]] form: each chunk's
    * centroid-routed result is written straight to parquet (staged,
    * promoted by rename) instead of accumulating as localCheckpoint
    * blocks. */
  def searchIvfChunkedTo(spark: SparkSession, path: String, queries: DataFrame,
      outPath: String, k: Int, ef: Int = 200, nprobe: Int = 4,
      chunkRows: Int = 100000): Unit = {
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("list").cast("int"), col("centroid"))
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).map(_._2)
    val np = math.min(nprobe, cents.length)
    writeChunkedResults(spark, outPath,
      queryChunks(queries, chunkRows).map { chunk =>
        val qByBucket = chunk.iterator.flatMap { case (qid, qvec) =>
          nearestLists(cents, np, qvec).iterator.map(l => (l, (qid, qvec)))
        }.toArray.groupBy(_._1).map { case (b, xs) => (b, xs.map(_._2)) }
        searchByBatch(spark, s"$path/lists", qByBucket, k, ef)
      })
  }

  /** Type-3 search over a per-label [[buildBy]] table built with
    * `attrCol = ts`: each query walks ONLY its label's sub-index with
    * the ts in-filter — the stored-index form of the reference's
    * SearchCategoryRange (searcher.hpp:301-374).
    *
    * `efBands` (serving-scale arm, pairs with an `attrSalted` store):
    * the type-2 rework's ingredients applied to the label+range path —
    * (a) sub-rows whose [ts(0), ts(last)] misses the query range are
    * SKIPPED before the graph is even deserialized (with attr-contiguous
    * salting an oversized label's non-overlapping chunks cost nothing;
    * hash-salted stores walk every chunk per query), (b) a sub-row the
    * range fully covers walks PLAIN (no in-filter overhead), (c) below
    * [[graft.operators.SearchParams.BruteCoverage]] the slice is scanned
    * by the quantized two-stage [[HnswIndex.exactOverQ]] (int8 preselect
    * + fp32 re-rank — the measured 4.3× over the boosted filtered walk
    * at the t2 probe). Results can differ from the exact-effort arm at
    * the quantization margin, so hash-gated oracle queries keep the
    * default. queries: (qid, v, l, r, qvec) → (qid, rank, nid). */
  def searchByRange(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, ef: Int = 200, efBands: Boolean = false): DataFrame = {
    import spark.implicits._
    val qByBucket = queries
      .select(col("qid").cast("long"), col("v").cast("long"),
        col("l").cast("double"), col("r").cast("double"), col("qvec"))
      .collect()
      .map(r => (r.getLong(1),
        (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getSeq[Float](4).toArray)))
      .groupBy(_._1).map { case (b, xs) => (b, xs.map(_._2)) }
    if (qByBucket.isEmpty) return spark.emptyDataset[(Long, Long, Long)].toDF("qid", "rank", "nid")
    val bands =
      if (efBands) resolveBands(path) else graft.operators.SearchParams.DefaultBands
    val bq = spark.sparkContext.broadcast(qByBucket)
    val wanted = qByBucket.keys.toSeq
    val scan0 = spark.read.parquet(path).filter(col("bucket").isin(wanted: _*))
    // banded arm, attr-stamped store: push PER-BUCKET attr envelopes
    // into the scan — parquet row-group stats then skip sub-rows no
    // query OF THAT BUCKET can touch before their blob columns are even
    // read (a global envelope would approach [0, 1] as soon as the
    // batch spans many labels and prune nothing). Each disjunct only
    // drops rows outside its own bucket's query envelope, so the filter
    // is safe by construction; the per-row ts(0)/ts(last) check below
    // still skips precisely, per query, before deserialization. The
    // stats evaluation is per ROW GROUP and these rows are graph blobs
    // (few rows per group), so a few hundred disjuncts cost ~nothing;
    // beyond the clamp the OR tree's plan-analysis cost outweighs the
    // pruning and the batch-global envelope is used instead.
    val scan =
      if (efBands && scan0.columns.contains("attr_min")) {
        if (qByBucket.size <= 256)
          scan0.filter(qByBucket.iterator.map { case (b, qs) =>
            col("bucket") === b &&
              col("attr_max") >= qs.iterator.map(_._2).min &&
              col("attr_min") <= qs.iterator.map(_._3).max
          }.reduce(_ || _))
        else {
          val minL = qByBucket.valuesIterator.flatMap(_.iterator).map(_._2).min
          val maxR = qByBucket.valuesIterator.flatMap(_.iterator).map(_._3).max
          scan0.filter(col("attr_max") >= minL && col("attr_min") <= maxR)
        }
      } else scan0
    scan
      .select(col("bucket"), col("ids"), col("attrs"), col("graph"))
      .as[(Long, Array[Long], Array[Double], Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (bucket, ids, ts, graphBytes) =>
          bq.value.get(bucket).iterator.flatMap { qs =>
            // attrs are (attr, id)-sorted at build: ts(0)/ts(last) bound
            // the sub-row, so the overlap check needs no graph
            val overlapping =
              if (!efBands || ts.isEmpty) qs
              else qs.filter { case (_, l, r, _) => l <= ts(ts.length - 1) && r >= ts(0) }
            if (overlapping.isEmpty) Iterator.empty
            else {
              val index = HnswIndex.fromBytesCached(graphBytes)
              val tsIdx = new TsIndex(ts)
              overlapping.iterator.flatMap { case (qid, l, r, qvec) =>
                val full = efBands && ts.nonEmpty &&
                  l <= ts(0) && r >= ts(ts.length - 1)
                val hits =
                  if (full) index.search(qvec, k, ef)
                  else {
                    val cover = tsIdx.coverage(l, r)
                    val (thr, exactScan) =
                      if (efBands)
                        (bands.bruteCoverage,
                          () => index.exactOverQ(qvec, tsIdx.inRange(l, r), k))
                      else
                        (graft.operators.SearchParams.SmallCoverage,
                          () => index.exactOver(qvec, tsIdx.inRange(l, r), k))
                    if (cover < thr) exactScan()
                    else {
                      val allowed: Int => Boolean = i => ts(i) >= l && ts(i) <= r
                      val efW =
                        if (efBands) bands.inFilterEf(ef, cover)
                        else graft.operators.SearchParams.inFilterEf(ef, cover)
                      index.search(qvec, k, efW, allowed,
                        seeds = tsIdx.seeds(l, r, graft.operators.SearchParams.FilterSeeds))
                    }
                  }
                hits.iterator.map { case (internal, d) => (qid, ids(internal), d) }
              }
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

  /** Range search over a ts-bucketed [[buildBy]] table (bucketCol =
    * floor(ts·scale), attrCol = ts): each query reads only its
    * overlapping bucket rows (bucket min/max pruned), walks
    * fully-covered buckets unfiltered and partially-covered ones with
    * the ts in-filter, and the per-bucket candidates merge through the
    * bounded top-k — the stored-index form of the reference's type-2
    * stage (hybrid_graph.cpp:338-459).
    *
    * `scale` = buckets per unit ts (10 = the reference's deciles). The
    * reference is pinned to 10 because its decile graphs are offset
    * slices of ONE ts-sorted array; here each bucket is its own stored
    * graph, so the right granularity is data-sized: scale ≈
    * n/maxRowsPerIndex keeps every bucket ONE unsalted graph, and a
    * range then walks only the buckets it actually overlaps. A coarse
    * salted store makes every partial range walk ALL of a decile's
    * salted sub-graphs (hash salting spreads each query's range over
    * every sub-graph — the measured type-2 wall at the 10M contest
    * point); ts-contiguous fine buckets cut the per-query walk count by
    * the salt factor.
    *
    * `efBands` (serving-scale arm): fully-covered bucket walks use
    * [[graft.operators.SearchParams.unionWalkEf]] (per-bucket depth
    * shrinks as more full buckets contribute) and SMALL slices use the
    * quantized [[HnswIndex.exactOverQ]] two-stage scan. Off by default:
    * both can differ from the exact-effort result at the margin, and
    * the hash-gated oracle queries must stay bit-stable.
    *
    * queries: (qid, l, r, qvec). */
  def searchDecileRange(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, ef: Int = 200, scale: Int = 10, efBands: Boolean = false): DataFrame = {
    import spark.implicits._
    val qBatch = queries
      .select(col("qid").cast("long"), col("l").cast("double"),
        col("r").cast("double"), col("qvec"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getSeq[Float](3).toArray))
    if (qBatch.isEmpty) return spark.emptyDataset[(Long, Long, Long)].toDF("qid", "rank", "nid")
    // the banded arm's effort table: the store's tuned sidecar when
    // present (EfTuner.tuneBands), else the hand-derived defaults
    val bands =
      if (efBands) resolveBands(path) else graft.operators.SearchParams.DefaultBands
    val bq = spark.sparkContext.broadcast(qBatch)
    // widen the coarse prune one bucket low: floor(ts*scale) float
    // rounding can file a boundary row one bucket down (ADVICE r2); the
    // per-row in-filter keeps the extra bucket correct
    val minB = math.floor(qBatch.map(_._2).min * scale).toLong - 1
    val maxB = math.floor(qBatch.map(_._3).max * scale).toLong
    // Query-shard the batch across replicated bucket scans: one task
    // per bucket row makes the stage wall the SLOWEST bucket (middle
    // buckets overlap most ranges — measured tail skew at the 6M
    // probe: 2-28 of 32 threads busy). Each of the `shards` scan
    // replicas serves an index-strided 1/shards of the batch, so the
    // straggler shrinks by the shard factor; the graph blob re-read is
    // page-cached and the deserialization is shared via
    // fromBytesCached.
    val shards = math.max(1, math.min(16, qBatch.length / 4000))
    val scanOne = spark.read.parquet(path)
      .filter(col("bucket") >= minB && col("bucket") <= maxB)
      .select(col("bucket"), col("ids"), col("attrs"), col("graph"))
    val scan =
      if (shards == 1) scanOne.withColumn("qshard", lit(0))
      else (0 until shards).map(s => scanOne.withColumn("qshard", lit(s)))
        .reduce(_ unionByName _)
    scan
      .as[(Long, Array[Long], Array[Double], Array[Byte], Int)]
      .mapPartitions { it =>
        it.flatMap { case (bucket, ids, ts, graphBytes, qshard) =>
          val bStart = bucket.toDouble / scale
          val bEnd = (bucket + 1).toDouble / scale
          // boundary buckets inclusive on both sides (see minB note)
          val all = bq.value
          val overlapping = Iterator.range(qshard, all.length, shards)
            .map(all(_))
            .filter { case (_, l, r, _) => l <= bEnd && r >= bStart }
            .toArray
          if (overlapping.isEmpty) Iterator.empty
          else {
            val index = HnswIndex.fromBytesCached(graphBytes)
            val tsIdx = new TsIndex(ts)
            overlapping.iterator.flatMap { case (qid, l, r, qvec) =>
              val full = l <= bStart && r >= bEnd
              val hits =
                if (full) {
                  val efFull =
                    if (efBands) {
                      val mFull = math.max(0,
                        math.floor(r * scale) - math.ceil(l * scale)).toInt
                      bands.unionWalkEf(ef, k, mFull)
                    } else ef
                  index.search(qvec, k, efFull)
                } else {
                  // partial bucket: below a coverage threshold a
                  // sequential exact scan of the in-range run (one
                  // contiguous slice — ts-sorted build) beats a
                  // rejection-boosted filtered walk. The banded arm
                  // scans int8 codes + fp32 refine and draws its line
                  // at BruteCoverage (measured: warm filtered walk
                  // ≈ 3.5 ms vs ≤ 2.5 ms scan at the 6M probe; the
                  // reference's narrow-sel SplitInterval draws the same
                  // 0.5-0.6 line, hybrid_graph.cpp:91-134); the plain
                  // arm scans fp32 below SmallCoverage. Same walk above
                  // the line in both arms.
                  val cover = tsIdx.coverage(l, r)
                  val (thr, exactScan) =
                    if (efBands)
                      (bands.bruteCoverage,
                        () => index.exactOverQ(qvec, tsIdx.inRange(l, r), k))
                    else
                      (graft.operators.SearchParams.SmallCoverage,
                        () => index.exactOver(qvec, tsIdx.inRange(l, r), k))
                  if (cover < thr) exactScan()
                  else {
                    val allowed: Int => Boolean = i => ts(i) >= l && ts(i) <= r
                    val efW =
                      if (efBands) bands.inFilterEf(ef, cover)
                      else graft.operators.SearchParams.inFilterEf(ef, cover)
                    index.search(qvec, k, efW, allowed,
                      seeds = tsIdx.seeds(l, r, graft.operators.SearchParams.FilterSeeds))
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

  /** Search a [[buildBy]] table with bucket-keyed queries (qid, v,
    * qvec): each query runs ONLY against its own value's sub-index rows
    * — the predicate holds by construction, per-row candidates merge
    * through the bounded top-k (several rows per value when the build
    * salted an oversized bucket), and the scan prunes to the requested
    * buckets via parquet min/max stats. (qid, rank, nid). */
  def searchBy(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, ef: Int = 200): DataFrame = {
    val qByBucket = queries.select(col("qid").cast("long"), col("v").cast("long"), col("qvec"))
      .collect()
      .map(r => (r.getLong(1), (r.getLong(0), r.getSeq[Float](2).toArray)))
      .groupBy(_._1).map { case (b, xs) => (b, xs.map(_._2)) }
    searchByBatch(spark, path, qByBucket, k, ef)
  }

  private def searchByBatch(spark: SparkSession, path: String,
      qByBucket: Map[Long, Array[(Long, Array[Float])]],
      k: Int, ef: Int): DataFrame = {
    import spark.implicits._
    if (qByBucket.isEmpty) return spark.emptyDataset[(Long, Long, Long)].toDF("qid", "rank", "nid")
    val bq = spark.sparkContext.broadcast(qByBucket)
    val wanted = qByBucket.keys.toSeq
    spark.read.parquet(path)
      .filter(col("bucket").isin(wanted: _*))
      .select(col("bucket"), col("ids"), col("graph"))
      .as[(Long, Array[Long], Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (bucket, ids, graphBytes) =>
          bq.value.get(bucket).iterator.flatMap { qs =>
            val index = HnswIndex.fromBytesCached(graphBytes)
            qs.iterator.flatMap { case (qid, qvec) =>
              index.search(qvec, k, ef).iterator.map { case (internal, d) =>
                (qid, ids(internal), d)
              }
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

  /** Search a persisted index table: every bucket row searches the
    * broadcast query batch; bounded top-k merge. (qid, rank, nid).
    *
    * The query batch is broadcast-sized by contract (the contest shape,
    * 1M × ~420 B ≈ 420 MB, fits a broadcast); batches beyond that go
    * through [[searchChunked]], which never materializes the full batch
    * on the driver. */
  def search(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, ef: Int = 200): DataFrame = {
    val qBatch = queries.select(col("qid").cast("long"), col("qvec"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    searchBatch(spark, path, qBatch, k, ef)
  }

  /** Chunked search for query batches too large to hold on the driver
    * at once: streams the batch through `toLocalIterator` in
    * `chunkRows`-sized slices, broadcasts one slice at a time (each
    * chunk's result is eagerly materialized, so the previous broadcast
    * is unreferenced before the next is built), and unions the
    * per-chunk results. Peak driver memory is one chunk + one
    * partition, independent of total batch size. */
  def searchChunked(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, ef: Int = 200, chunkRows: Int = 100000): DataFrame = {
    import spark.implicits._
    val results = queryChunks(queries, chunkRows).map { chunk =>
      // materialize this chunk's results so its broadcast can be freed
      searchBatch(spark, path, chunk, k, ef).localCheckpoint(eager = true)
    }.toSeq
    if (results.isEmpty) spark.emptyDataset[(Long, Long, Long)].toDF("qid", "rank", "nid")
    else results.reduce(_.unionByName(_))
  }

  /** [[searchChunked]] that streams each chunk's (qid, rank, nid)
    * result straight to parquet instead of holding every chunk as a
    * localCheckpoint block: nothing accumulates in the block manager
    * between chunks, and the run's peak footprint is one chunk's plan.
    * Chunks append into a `.tmp` staging dir promoted by rename at the
    * end, so a crash mid-sequence never leaves a _SUCCESS-marked
    * partial result for a resume guard to trust. */
  def searchChunkedTo(spark: SparkSession, path: String, queries: DataFrame,
      outPath: String, k: Int, ef: Int = 200, chunkRows: Int = 100000): Unit =
    writeChunkedResults(spark, outPath,
      queryChunks(queries, chunkRows).map(chunk => searchBatch(spark, path, chunk, k, ef)))

  /** Driver-streamed `chunkRows`-sized query slices — peak driver
    * memory is one chunk, independent of total batch size. */
  private def queryChunks(queries: DataFrame,
      chunkRows: Int): Iterator[Array[(Long, Array[Float])]] = {
    val it = queries.select(col("qid").cast("long"), col("qvec"))
      .toLocalIterator()
    Iterator.continually {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
      while (it.hasNext && buf.length < chunkRows) {
        val r = it.next()
        buf += ((r.getLong(0), r.getSeq[Float](1).toArray))
      }
      buf.toArray
    }.takeWhile(_.nonEmpty)
  }

  private def writeChunkedResults(spark: SparkSession, outPath: String,
      results: Iterator[DataFrame]): Unit = {
    import spark.implicits._
    val tmp = outPath.stripSuffix("/") + ".tmp"
    deleteRecursively(new java.io.File(tmp))
    var any = false
    results.foreach { df => df.write.mode("append").parquet(tmp); any = true }
    if (!any)
      spark.emptyDataset[(Long, Long, Long)].toDF("qid", "rank", "nid")
        .write.mode("overwrite").parquet(tmp)
    deleteRecursively(new java.io.File(outPath))
    require(new java.io.File(tmp).renameTo(new java.io.File(outPath)),
      s"rename $tmp -> $outPath failed")
  }

  private def searchBatch(spark: SparkSession, path: String,
      qBatch: Array[(Long, Array[Float])], k: Int, ef: Int): DataFrame = {
    if (qBatch.isEmpty) {
      import spark.implicits._
      return spark.emptyDataset[(Long, Long, Long)].toDF("qid", "rank", "nid")
    }
    rankTopK(rawSearchBatch(spark, path, qBatch, k, ef), k)
  }

  /** Per-candidate (qid, id, dist) rows before the top-k merge — shared
    * by the plain search and the delta-union path. */
  private def rawSearchBatch(spark: SparkSession, path: String,
      qBatch: Array[(Long, Array[Float])], k: Int, ef: Int): DataFrame = {
    import spark.implicits._
    val bq = spark.sparkContext.broadcast(qBatch)
    spark.read.parquet(path)
      .select(col("ids"), col("graph"))
      .as[(Array[Long], Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (ids, graphBytes) =>
          val index = HnswIndex.fromBytesCached(graphBytes)
          bq.value.iterator.flatMap { case (qid, qvec) =>
            index.search(qvec, k, ef).iterator.map { case (internal, d) =>
              (qid, ids(internal), d)
            }
          }
        }
      }
      .toDF("qid", "id", "dist")
  }

  private def rankTopK(raw: DataFrame, k: Int): DataFrame =
    raw.groupBy("qid")
      .agg(TopKAggregate.topkIds(k, col("dist"), col("id")).as("nb"))
      .select(col("qid"), posexplode(col("nb")).as(Seq("r0", "nid")))
      .select(col("qid"), (col("r0") + 1).cast("long").as("rank"), col("nid"))

  // ---- delta appends: LSM-style incremental index maintenance ----
  //
  // Lifecycle contract (single-writer MAINTENANCE, lock-free reads):
  //   - appendDelta / replaceDelta / appendDeltaBatch / compactDelta are
  //     maintenance ops — at most one runs at a time, and only they
  //     mutate the store or delete stale delta data ([[repairDelta]],
  //     [[recoverStore]] run at their entry).
  //   - searchWithDelta / deltaFraction are READ ops: they classify
  //     already-folded delta data as dead and EXCLUDE it, but never
  //     delete — two concurrent readers can never race a delete against
  //     a scan. One carve-out: an EPOCH SWITCH (see demoteBidsToFlat)
  //     relocates live bid files, so a read racing that rare
  //     redeployment event can fail transiently or observe a partial
  //     delta — retry after the switch, or pause serving around
  //     stream redeployments.

  /** Test-only fault injection: every fs-visible boundary inside the
    * maintenance ops calls [[crashPoint]] with a stable name, and the
    * crash-point property spec swaps in a hook that THROWS at a chosen
    * point — simulating the process dying exactly there. The recovery
    * contract under test: whatever the boundary, the next maintenance
    * entry (recoverStore + repairDelta + the replay rules) restores a
    * store whose serve set is exactly the acknowledged rows. Production
    * value is a no-op; the call sites double as documentation of the
    * crash windows. */
  @volatile private[index] var crashHook: String => Unit = _ => ()

  private def crashPoint(name: String): Unit = crashHook(name)

  /** Sibling dataset holding not-yet-indexed rows (plain (id, vec)
    * parquet) — `<path>.delta`, NOT a subdirectory, so reading the main
    * store never mixes schemas. Two committed layouts coexist: flat
    * part files at the root (batch [[appendDelta]]/[[replaceDelta]])
    * and `bid=<batchId>` subdirectories ([[appendDeltaBatch]], the
    * streaming form — one dir per micro-batch so at-least-once replays
    * overwrite instead of double-appending). */
  def deltaPath(path: String): String = path.stripSuffix("/") + ".delta"

  private val foldMarkerName = "_folded_delta"

  /** What a compaction folded: a fingerprint of the flat part files it
    * consumed ("-" when there were none), the highest micro-batch id
    * it consumed (-1 when there were none), and the stream EPOCH those
    * micro-batches belonged to (the ingesting writer's checkpoint
    * identity — see [[appendDeltaBatch]]; "-" when unknown). Stored in
    * the promoted store as [[foldMarkerName]]; the legacy single-line
    * form (a whole-delta-dir fingerprint) is still read. */
  private case class FoldMarker(flatFp: Option[String], maxBid: Long,
      legacyFp: Option[String], epoch: Option[String] = None)

  private def readFoldMarker(path: String): Option[FoldMarker] = {
    val marker = new java.io.File(path, foldMarkerName)
    if (!marker.exists()) return None
    val lines = new String(
      java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8")
      .split("\n").map(_.trim).filter(_.nonEmpty)
    if (lines.headOption.contains("v2")) {
      val kv = lines.drop(1).flatMap { l =>
        l.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
      }.toMap
      Some(FoldMarker(
        kv.get("flatfp").filter(_ != "-"),
        kv.get("maxbid").map(_.toLong).getOrElse(-1L),
        legacyFp = None,
        epoch = kv.get("epoch").filter(_ != "-")))
    } else lines.headOption.map(fp => FoldMarker(None, -1L, legacyFp = Some(fp)))
  }

  private def writeFoldMarker(dir: java.io.File, flatFp: String,
      maxBid: Long, epoch: Option[String]): Unit =
    java.nio.file.Files.write(
      new java.io.File(dir, foldMarkerName).toPath,
      s"v2\nflatfp=$flatFp\nmaxbid=$maxBid\nepoch=${epoch.getOrElse("-")}\n"
        .getBytes("UTF-8"))

  /** The delta's current stream epoch (written beside the bid= dirs by
    * [[appendDeltaBatch]]; consumed by [[compactDelta]] to stamp the
    * fold marker). `_`-prefixed, so invisible to flat fingerprints and
    * committed-file listings. */
  private val streamEpochName = "_stream_epoch"

  private def readStreamEpoch(path: String): Option[String] = {
    val f = new java.io.File(deltaPath(path), streamEpochName)
    if (!f.exists()) None
    else Some(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim)
      .filter(_.nonEmpty)
  }

  /** Only COMMITTED data counts (`_SUCCESS` written at job commit): a
    * crashed/in-flight write is invisible rather than failing the read
    * or serving partial rows. */
  private def committedFlatFiles(path: String): Seq[java.io.File] = {
    val root = new java.io.File(deltaPath(path))
    if (!new java.io.File(root, "_SUCCESS").exists()) return Nil
    root.listFiles().toSeq.filter(f => f.isFile &&
      f.getName.endsWith(".parquet") &&
      !f.getName.startsWith("_") && !f.getName.startsWith("."))
  }

  private def committedBids(path: String): Seq[(Long, java.io.File)] = {
    val root = new java.io.File(deltaPath(path))
    if (!root.isDirectory) return Nil
    root.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("bid=") &&
        new java.io.File(f, "_SUCCESS").exists())
      .flatMap(f => scala.util.Try(f.getName.stripPrefix("bid=").toLong)
        .toOption.map(_ -> f))
      .sortBy(_._1)
  }

  /** Fingerprint of the delta's FLAT part files only (bid dirs have
    * their own watermark), non-recursive — pairs with the `flatfp`
    * marker line. */
  private def flatFp(spark: SparkSession, path: String): String =
    graft.sources.ParquetMeta.fingerprint(spark, deltaPath(path), recursive = false)

  /** LIVE delta read roots — committed data the fold marker does NOT
    * record as already folded into the main graphs. Flat files are
    * returned individually (the root dir may also hold bid= subdirs,
    * which a directory read would misparse as a partition column).
    * Pure function of the on-disk state: read paths never delete. */
  private def liveDeltaRoots(spark: SparkSession, path: String): Seq[String] = {
    val flat = committedFlatFiles(path)
    val bids = committedBids(path)
    if (flat.isEmpty && bids.isEmpty) return Nil
    readFoldMarker(path) match {
      case None => (flat ++ bids.map(_._2)).map(_.toString)
      case Some(m) if m.legacyFp.isDefined =>
        // legacy marker: whole-dir identity — all-or-nothing
        if (m.legacyFp.contains(
            graft.sources.ParquetMeta.fingerprint(spark, deltaPath(path)))) Nil
        else (flat ++ bids.map(_._2)).map(_.toString)
      case Some(m) =>
        val liveFlat =
          if (flat.isEmpty || m.flatFp.contains(flatFp(spark, path))) Nil else flat
        val liveBids = bids.filter(_._1 > m.maxBid).map(_._2)
        (liveFlat ++ liveBids).map(_.toString)
    }
  }

  /** The live delta rows, if any. */
  private def readDelta(spark: SparkSession, path: String): Option[DataFrame] = {
    val roots = liveDeltaRoots(spark, path)
    if (roots.isEmpty) None
    else Some(spark.read.parquet(roots: _*)
      .select(col("id").cast("long"), col("vec")))
  }

  /** MAINTENANCE-side repair: physically delete delta data the fold
    * marker records as already folded — the crash window of
    * [[compactDelta]] between the store promote and the delta delete
    * would otherwise (a) serve every folded id twice and (b) fold it a
    * SECOND time. Runs at the top of every maintenance op (append /
    * replace / compact), so a stale folded delta is gone BEFORE any new
    * rows land beside it — new appends can never blend into a stale
    * generation and defeat the marker comparison. Read paths only
    * exclude ([[liveDeltaRoots]]); this is the one place that deletes. */
  private def repairDelta(spark: SparkSession, path: String): Unit = {
    val root = new java.io.File(deltaPath(path))
    if (!root.exists()) return
    readFoldMarker(path).foreach { m =>
      if (m.legacyFp.isDefined) {
        if (m.legacyFp.contains(
            graft.sources.ParquetMeta.fingerprint(spark, deltaPath(path))))
          deleteRecursively(root)
      } else {
        if (committedFlatFiles(path).nonEmpty && m.flatFp.contains(flatFp(spark, path))) {
          committedFlatFiles(path).foreach(deleteRecursively)
          deleteRecursively(new java.io.File(root, "_SUCCESS"))
        }
        committedBids(path).filter(_._1 <= m.maxBid)
          .foreach(b => deleteRecursively(b._2))
      }
      val left = Option(root.listFiles()).map(_.toSeq).getOrElse(Nil)
      if (left.forall(f => f.getName.startsWith("_") || f.getName.startsWith(".")))
        deleteRecursively(root)
    }
  }

  /** Remove everything at the delta ROOT that is not a `bid=` micro-
    * batch dir or the stream-epoch file — the shared pre-write sweep of
    * [[replaceDelta]] and [[demoteBidsToFlat]]. What it removes is
    * either uncommitted (part files with no surviving `_SUCCESS`,
    * `_temporary` job-attempt dirs) or about to be rewritten; what
    * counts as sweepable must stay identical between the two callers,
    * hence one definition. */
  private def sweepUncommittedRoot(root: java.io.File): Unit =
    Option(root.listFiles()).foreach(_.foreach { f =>
      if (f.getName != streamEpochName &&
          (f.isFile || !f.getName.startsWith("bid="))) deleteRecursively(f)
    })

  /** Demote committed `bid=` micro-batch dirs to FLAT delta rows — the
    * epoch-switch step of [[appendDeltaBatch]]. The old stream's
    * committed bids are checkpoint-acknowledged (id, vec) parquet it
    * will never resend; once its epoch is retired they are ordinary
    * un-indexed rows, so their part files move (atomic renames) to the
    * delta root under bid-tagged names and serve/fold exactly like a
    * batch append. Crash-safe ORDER: the flat layout is committed (root
    * `_SUCCESS`) BEFORE any rename — a crash mid-demotion then leaves
    * every row visible exactly once (moved files as committed flat,
    * unmoved ones still in their committed bid dirs) and the switch
    * retry re-demotes what remains; committing after the renames would
    * instead make a crash between the last rename and the commit lose
    * every moved row invisibly. When the flat layout was NOT previously
    * committed, uncommitted root leftovers (a crashed batch append) are
    * swept first so the new `_SUCCESS` cannot retroactively commit
    * partial files. Un-COMMITTED bid dirs (no `_SUCCESS`) are crashed
    * writes the old stream never acknowledged: deleted.
    *
    * This is the ONE maintenance op that relocates LIVE data: a read
    * overlapping the switch can fail transiently (it planned a bid
    * file that moved before its scan) or return a PARTIAL delta (it
    * listed the flat layout before a file landed and the bid dir
    * after it left) — bounded by the switch duration. Serving that
    * cannot tolerate either should pause around stream redeployments;
    * a manifest-pointer layout (the object-store evolution already
    * noted on [[compactDelta]]) removes the window entirely. Epoch
    * switches are rare redeployment events, not steady-state serving. */
  private def demoteBidsToFlat(path: String): Unit = {
    val root = new java.io.File(deltaPath(path))
    if (!root.isDirectory) return
    val bids = committedBids(path)
    if (bids.nonEmpty) {
      if (!new java.io.File(root, "_SUCCESS").exists()) {
        sweepUncommittedRoot(root)
        java.nio.file.Files.write(
          new java.io.File(root, "_SUCCESS").toPath, Array.empty[Byte])
      }
      crashPoint("demote.root_committed")
      bids.foreach { case (bid, dir) =>
        Option(dir.listFiles()).getOrElse(Array.empty[java.io.File]).foreach { f =>
          if (f.isFile && f.getName.endsWith(".parquet") &&
              !f.getName.startsWith("_") && !f.getName.startsWith("."))
            require(f.renameTo(new java.io.File(root, s"bid$bid-${f.getName}")),
              s"epoch switch: cannot demote $f")
        }
        crashPoint("demote.bid_moved")
        deleteRecursively(dir)
      }
    }
    Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("bid="))
      .foreach(deleteRecursively)
  }

  /** Roll a half-completed [[compactDelta]] swap forward or back: dying
    * between the two renames leaves nothing at `path` ('.old' holds the
    * previous store, '.compact' may hold a complete rebuilt one) — with
    * no repair, every later read or compaction fails on the missing
    * store and nothing ever restores it. A complete '.compact' wins
    * (roll FORWARD — it already contains the folded delta and carries
    * the fold marker); otherwise a complete '.old' is restored (roll
    * BACK — the fold never happened). Runs at maintenance entry points
    * (same single-writer contract as [[repairDelta]]). */
  private def recoverStore(path: String): Unit = {
    val store = new java.io.File(path.stripSuffix("/"))
    if (new java.io.File(store, "_SUCCESS").exists()) return
    val compact = new java.io.File(path.stripSuffix("/") + ".compact")
    val old = new java.io.File(path.stripSuffix("/") + ".old")
    if (new java.io.File(compact, "_SUCCESS").exists()) {
      deleteRecursively(store)
      require(compact.renameTo(store), s"recover: cannot promote $compact")
      deleteRecursively(old)
    } else if (new java.io.File(old, "_SUCCESS").exists()) {
      deleteRecursively(compact)
      deleteRecursively(store)
      require(old.renameTo(store), s"recover: cannot restore $old")
    }
  }

  /** Append new vectors to a stored index WITHOUT rebuilding its
    * graphs — the LSM pattern for continuously-ingested corpora
    * (Fresh-DiskANN's immutable main + mutable delta): graph builds
    * are the expensive operation (minutes per million rows), so
    * between-batch inserts accumulate as plain parquet rows that
    * [[searchWithDelta]] scans EXACTLY, and [[compactDelta]] folds
    * into rebuilt graphs once [[deltaFraction]] crosses a threshold —
    * amortized-O(1) index maintenance with zero recall loss from
    * staleness (the delta side is brute-force, recall 1.0 by
    * construction). NOT replay-safe on its own: a crashed-and-rerun
    * append doubles its rows — retrying writers use [[replaceDelta]]
    * or the per-batch [[appendDeltaBatch]]. */
  def appendDelta(delta: DataFrame, path: String): Unit = {
    recoverStore(path)
    repairDelta(delta.sparkSession, path)
    delta.select(col("id").cast("long"), col("vec"))
      .write.mode("append").parquet(deltaPath(path))
  }

  /** Idempotent form for build scripts that may retry: REPLACE the
    * delta's FLAT layout instead of appending (a crashed-and-rerun
    * `appendDelta` would double its rows). Committed `bid=` micro-batch
    * dirs are a concurrent STREAM's not-yet-folded rows and survive —
    * a whole-dir overwrite would silently lose them (their checkpoints
    * have committed, so the stream never replays them). NOTE: rows an
    * epoch switch DEMOTED to the flat layout ([[demoteBidsToFlat]])
    * count as flat and are replaced with it — callers mixing epoch
    * switches with replace-style batch maintenance must compact between
    * them or the demoted rows are (by these semantics) discarded.
    * Crash-safe the same way as before: a write that dies mid-job
    * leaves part files with no root `_SUCCESS` (invisible to reads),
    * and the retry's file-level sweep below removes them before
    * rewriting. */
  def replaceDelta(delta: DataFrame, path: String): Unit = {
    recoverStore(path)
    repairDelta(delta.sparkSession, path)
    val root = new java.io.File(deltaPath(path))
    // sweep root FILES and any _temporary job-attempt dir — a crashed
    // write's committed task outputs under _temporary would otherwise
    // be merged into the retry's commitJob (the committer commits ALL
    // on-disk task dirs of the attempt path), duplicating rows. bid=
    // dirs (the stream's rows) and its epoch file survive.
    sweepUncommittedRoot(root)
    crashPoint("replace.swept")
    delta.select(col("id").cast("long"), col("vec"))
      .write.mode("append").parquet(deltaPath(path))
  }

  /** Exactly-once-effective streaming append: micro-batch `batchId`
    * lands in its own `bid=<batchId>` subdirectory with OVERWRITE mode,
    * so foreachBatch's at-least-once replay (crash after the parquet
    * commit, before the checkpoint commit) rewrites the same rows
    * instead of double-appending them. A batch AT the fold marker's
    * watermark FROM THE SAME STREAM EPOCH is skipped outright: its rows
    * were folded into the main graphs by a compaction the crash
    * happened to straddle — appending them again would serve and
    * re-fold every row twice. Only the watermark batch can legitimately
    * replay (checkpoints commit in batch order, so every lower bid's
    * checkpoint committed before a higher bid could exist).
    *
    * `epoch` identifies the ingesting STREAM, not its batch counter:
    * the streaming writer derives it from the checkpoint's persistent
    * query id ([[graft.streaming.StreamingKnn.checkpointEpoch]]) — the
    * id survives a checkpoint directory being MOVED (a moved checkpoint
    * is the same stream and must still replay-skip, not reset) and is
    * regenerated when the contents are cleared (a genuinely new stream
    * even at the same path). A batch arriving under a DIFFERENT epoch
    * than the store's (the fold marker's, or the delta's `_stream_epoch`
    * when nothing was ever folded) is a new stream whose ids restart at
    * 0 — its rows are NEW data: the OLD stream's committed-but-unfolded
    * bid dirs are first DEMOTED to flat delta rows (they are
    * checkpoint-acknowledged data the old stream will never resend;
    * leaving them as bids would let the new stream's overwrite silently
    * destroy them, and folding them under the new watermark would poison
    * its id space), the watermark resets (maxbid=-1), and ingestion
    * proceeds. Without an epoch (batch callers, legacy markers), a
    * batchId strictly below the watermark is ambiguous between a
    * fresh-checkpoint restart and an impossible replay; both silently
    * lose data, so it fails loudly instead. */
  def appendDeltaBatch(delta: DataFrame, path: String, batchId: Long,
      epoch: Option[String] = None): Unit = {
    recoverStore(path)
    val spark = delta.sparkSession
    repairDelta(spark, path)
    val marker = readFoldMarker(path).filter(_.legacyFp.isEmpty)
    // the store's current epoch: what the last fold recorded, else what
    // the current delta's writer recorded (a never-compacted store has
    // no marker, but its bids still belong to a stream)
    val storeEpoch = marker.flatMap(_.epoch).orElse(readStreamEpoch(path))
    val newEpoch = (epoch, storeEpoch) match {
      case (Some(e), Some(se)) => e != se
      case _                   => false
    }
    if (newEpoch) {
      // the old stream is gone: its committed bids become flat rows
      // (searchable and foldable like any batch append), and the
      // watermark resets so the new stream's restarted ids are LIVE
      // under the bid > maxBid rule
      demoteBidsToFlat(path)
      crashPoint("append.demoted")
      marker.foreach { m =>
        writeFoldMarker(new java.io.File(path.stripSuffix("/")),
          m.flatFp.getOrElse("-"), -1L, epoch)
      }
      crashPoint("append.watermark_reset")
    } else {
      if (marker.exists(_.maxBid == batchId)) return
      marker.foreach { m =>
        if (batchId < m.maxBid)
          throw new IllegalStateException(
            s"appendDeltaBatch($path, batchId=$batchId): below the fold " +
              s"watermark ${m.maxBid} with no stream-epoch change — this " +
              "stream appears restarted from a cleared checkpoint; its " +
              "batch ids would collide with already-folded ones and be " +
              "served never or twice. Use a fresh store path or a fresh " +
              "checkpoint location (a new epoch resets the watermark); " +
              s"if reuse is intended, delete $path/$foldMarkerName.")
      }
    }
    epoch.foreach { e =>
      val dp = new java.io.File(deltaPath(path))
      dp.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(dp, streamEpochName).toPath, e.getBytes("UTF-8"))
    }
    crashPoint("append.epoch_file_written")
    delta.select(col("id").cast("long"), col("vec"))
      .write.mode("overwrite").parquet(s"${deltaPath(path)}/bid=$batchId")
  }

  /** delta rows ÷ indexed rows — the compaction trigger. Delta count
    * comes from parquet footers (no job); the indexed count is one
    * aggregate over the B bucket rows (sums `size(ids)` — B is tens of
    * rows by construction, so this is a driver-trivial job). Read-only:
    * folded leftovers are excluded, not deleted. */
  def deltaFraction(spark: SparkSession, path: String): Double = {
    val roots = liveDeltaRoots(spark, path)
    if (roots.isEmpty) return 0.0
    val indexed = spark.read.parquet(path)
      .agg(sum(size(col("ids")))).head().getLong(0)
    val delta = roots.map(graft.sources.ParquetMeta.rowCount(spark, _)).sum
    if (indexed == 0) Double.PositiveInfinity else delta.toDouble / indexed
  }

  /** Search the main graphs AND the delta in one plan: graph walks over
    * the stored sub-indexes union an exact broadcast-scan of the delta
    * rows ([[graft.functions.VectorFunctions.l2Sq]] codegen — the same
    * arithmetic as the exact kNN join), merged by a single bounded
    * top-k. Newly appended rows are searchable immediately, at exact
    * recall, without touching a graph. Read-only: folded leftovers are
    * excluded, not deleted. */
  def searchWithDelta(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, ef: Int = 200): DataFrame = {
    import spark.implicits._
    val qBatch = queries.select(col("qid").cast("long"), col("qvec"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    if (qBatch.isEmpty)
      return spark.emptyDataset[(Long, Long, Long)].toDF("qid", "rank", "nid")
    val main = rawSearchBatch(spark, path, qBatch, k, ef)
    val all = readDelta(spark, path) match {
      case None => main
      case Some(delta) =>
        val qDf = broadcast(qBatch.toIndexedSeq.toDF("qid", "qvec"))
        val deltaRaw = qDf.crossJoin(delta)
          .select(col("qid"), col("id"),
            graft.functions.VectorFunctions.l2Sq(col("qvec"), col("vec")).as("dist"))
        main.unionByName(deltaRaw)
    }
    rankTopK(all, k)
  }

  /** Fold the delta into rebuilt graphs and clear it. Self-contained:
    * the stored graphs carry their vectors, so compaction reads them
    * back out ([[HnswIndex.vectorOf]]) and never needs the original
    * base table — at 100 TB the archived corpus is not re-scanned to
    * maintain its index. The rebuilt store lands beside the live one
    * and swaps in with directory renames (object-store equivalent: a
    * manifest pointer flip). Crash-idempotent end to end: entry runs
    * [[recoverStore]] (a half-completed PRIOR swap rolls forward/back)
    * and [[repairDelta]]; the new store carries a marker recording what
    * it folded (flat-file fingerprint + micro-batch watermark), so
    * dying between the promote and the delta delete leaves a leftover
    * the marker classifies dead — never served, never folded twice —
    * and the next maintenance op deletes. Maintenance is single-writer
    * by contract; readers racing the two renames can observe a brief
    * store-absent window (a manifest-pointer layout removes even that
    * on object stores). */
  def compactDelta(spark: SparkSession, path: String, numBuckets: Int,
      m: Int = 16, efConstruction: Int = 200): Unit = {
    import spark.implicits._
    recoverStore(path)
    repairDelta(spark, path)
    val hadFlat = committedFlatFiles(path).nonEmpty
    // carry the PREVIOUS fold's watermark forward: a compaction that
    // sees no (or lower) live bids must not regress maxbid — a
    // regressed watermark lets an at-least-once replay of the highest
    // already-folded batch slip past appendDeltaBatch's skip check and
    // re-append rows the graphs already contain (served and folded
    // twice). The previous marker's bids were deleted by repairDelta
    // above, so committedBids alone only sees the NEW generation.
    val prevMarker = readFoldMarker(path).filter(_.legacyFp.isEmpty)
    val prevMaxBid = prevMarker.map(_.maxBid).getOrElse(-1L)
    val maxBid = committedBids(path).map(_._1).foldLeft(prevMaxBid)(math.max)
    // the folded bids' stream epoch: the delta's epoch file when a
    // stream is ingesting, else whatever the previous fold recorded
    // (append-time epoch resets keep the two consistent)
    val foldedEpoch = readStreamEpoch(path).orElse(prevMarker.flatMap(_.epoch))
    val foldedFlatFp = if (hadFlat) flatFp(spark, path) else "-"
    val fromGraphs = spark.read.parquet(path)
      .select(col("ids"), col("graph"))
      .as[(Array[Long], Array[Byte])]
      .flatMap { case (ids, g) =>
        val idx = HnswIndex.fromBytes(g)
        ids.indices.iterator.map(i => (ids(i), idx.vectorOf(i)))
      }
      .toDF("id", "vec")
    val all = readDelta(spark, path) match {
      case None        => fromGraphs
      case Some(delta) => fromGraphs.unionByName(delta)
    }
    val tmp = path.stripSuffix("/") + ".compact"
    deleteRecursively(new java.io.File(tmp)) // a crashed prior attempt
    build(all, tmp, numBuckets, m, efConstruction)
    crashPoint("compact.built")
    if (hadFlat || maxBid >= 0)
      writeFoldMarker(new java.io.File(tmp), foldedFlatFp, maxBid, foldedEpoch)
    crashPoint("compact.marked")
    val old = new java.io.File(path.stripSuffix("/") + ".old")
    deleteRecursively(old)
    require(new java.io.File(path).renameTo(old), s"swap: cannot move $path aside")
    crashPoint("compact.store_aside")
    require(new java.io.File(tmp).renameTo(new java.io.File(path)),
      s"swap: cannot promote $tmp")
    crashPoint("compact.promoted")
    deleteRecursively(old)
    crashPoint("compact.old_deleted")
    // delete exactly what the marker says was folded (an in-flight
    // uncommitted micro-batch dir, if the single-writer contract were
    // ever stretched, is left for its replay to overwrite)
    repairDelta(spark, path)
  }

  private def deleteRecursively(f: java.io.File): Unit =
    graft.sources.ParquetMeta.deleteRecursively(f)
}
