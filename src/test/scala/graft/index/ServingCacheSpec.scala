package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AnnCatalog

import graft.SparkSpec
import graft.functions.VectorFunctions

/** The version-keyed serving cache: a WARM SQL statement must serve
  * from executor-resident graphs without reading a single blob byte
  * (miss counter flat), a REBUILT store at the same path must be picked
  * up immediately (write-time version bump), and a store whose stamp is
  * missing (legacy layout / stamp-crash window) must still serve
  * correctly through the content-fingerprint fallback. */
class ServingCacheSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 12

  private def mkBase(path: String, n: Int, idOffset: Long, seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n) { i =>
      (idOffset + i, (i % 4).toLong, (i % 25) / 25.0,
        Array.fill(dim)(rnd.nextFloat()))
    }.toDF("id", "label", "ts", "vec").write.mode("overwrite").parquet(path)
  }

  private def exactTopK(basePath: String, qv: Array[Float], k: Int): Seq[Long] =
    spark.read.parquet(basePath)
      .withColumn("d", VectorFunctions.l2Sq(col("vec"), typedLit(qv)))
      .orderBy(col("d"), col("id")).select("id").limit(k)
      .collect().map(_.getLong(0)).toSeq

  test("warm statements read zero blobs; rebuilds invalidate; stampless stores fall back") {
    val root = Files.createTempDirectory("graft_servcache").toFile
    root.deleteOnExit()
    val basePath = s"$root/base"
    val indexPath = s"$root/index"
    mkBase(basePath, 400, idOffset = 0L, seed = 3)
    AnnIndexStore.build(spark.read.parquet(basePath), indexPath, numBuckets = 3)
    assert(AnnIndexStore.storeVersion(indexPath).isDefined,
      "build must stamp a write-time version")
    // trusted: statements are pure index reads — no base-table jobs to
    // muddy the scan accounting
    AnnCatalog.register(basePath, indexPath, idCol = "id", vecCol = "vec",
      ef = 400, trusted = true)
    try {
      def stmt(qv: Array[Float]): Seq[Long] = {
        val df = spark.read.parquet(basePath)
          .orderBy(VectorFunctions.l2Sq(col("vec"), typedLit(qv)), col("id"))
          .select("id").limit(10)
        assert(df.queryExecution.executedPlan.toString.contains("AnnTopK"))
        df.collect().map(_.getLong(0)).toSeq
      }
      val qv1 = spark.read.parquet(basePath).filter(col("id") === 7L)
        .select("vec").head.getSeq[Float](0).toArray
      val qv2 = spark.read.parquet(basePath).filter(col("id") === 123L)
        .select("vec").head.getSeq[Float](0).toArray

      ServingCache.clear()
      val cold = stmt(qv1)
      val missesAfterCold = ServingCache.misses.get()
      assert(missesAfterCold >= 3, "first statement must cold-load every bucket")
      // ef=400 over ~133-row buckets: the walk is exhaustive-grade, so
      // the routed result must EQUAL the exact plan's
      assert(cold == exactTopK(basePath, qv1, 10))

      // warm: same rows, different query — zero new misses = zero blob reads
      val warm1 = stmt(qv1)
      val warm2 = stmt(qv2)
      assert(ServingCache.misses.get() == missesAfterCold,
        "warm statements must not miss (each miss = a blob read)")
      assert(ServingCache.hits.get() >= 6)
      assert(warm1 == cold, "warm result must equal the cold result")
      assert(warm2.nonEmpty)

      // rebuild the store at the SAME path from DIFFERENT data: the new
      // version token must miss the old entries and serve the new ids —
      // a fingerprint-less stale read would return ids < 1000 here
      mkBase(basePath, 400, idOffset = 1000L, seed = 11)
      AnnIndexStore.build(spark.read.parquet(basePath), indexPath, numBuckets = 3)
      val fresh = stmt(qv1)
      assert(fresh.forall(_ >= 1000L),
        s"rebuilt store must serve the new generation, got $fresh")
      assert(fresh == exactTopK(basePath, qv1, 10),
        "walk-all over a 3-bucket store at ef=400 is exhaustive-grade here")

      // stamp-crash window: a store whose version file is missing must
      // downgrade to the content-fingerprint path, never serve stale
      val verFile = new java.io.File(indexPath, AnnIndexStore.versionFileName)
      assert(verFile.delete())
      ServingCache.clear()
      val legacy = stmt(qv1)
      assert(legacy == fresh, "stampless store must serve identical results")
    } finally AnnCatalog.unregister(basePath)
  }

  test("label and range routes serve warm from cached attrs (no blob re-read)") {
    val root = Files.createTempDirectory("graft_servcache_rng").toFile
    root.deleteOnExit()
    val basePath = s"$root/base"
    val byLabel = s"$root/by_label"
    val byDecile = s"$root/by_decile"
    mkBase(basePath, 600, idOffset = 0L, seed = 17)
    val base = spark.read.parquet(basePath)
    AnnIndexStore.buildBy(base, byLabel, "label", attrCol = Some("ts"))
    AnnIndexStore.buildBy(
      base.withColumn("decile", floor(col("ts") * 10).cast("long")),
      byDecile, "decile", attrCol = Some("ts"))
    AnnCatalog.register(basePath, s"$root/unused", idCol = "id", vecCol = "vec",
      ef = 300, labelIndex = Some(("label", byLabel)),
      rangeIndex = Some(("ts", byDecile)), trusted = true)
    try {
      val qv = base.filter(col("id") === 42L).select("vec").head.getSeq[Float](0).toArray
      def t3(): Seq[Long] = {
        val df = base.filter(col("label") === 2L && col("ts") >= 0.1 && col("ts") <= 0.7)
          .orderBy(VectorFunctions.l2Sq(col("vec"), typedLit(qv)), col("id"))
          .select("id").limit(10)
        assert(df.queryExecution.executedPlan.toString.contains("bucket=2"))
        df.collect().map(_.getLong(0)).toSeq
      }
      def t2(): Seq[Long] = {
        val df = base.filter(col("ts") >= 0.2 && col("ts") <= 0.6)
          .orderBy(VectorFunctions.l2Sq(col("vec"), typedLit(qv)), col("id"))
          .select("id").limit(10)
        assert(df.queryExecution.executedPlan.toString.contains("ts=[0.2,0.6]"))
        df.collect().map(_.getLong(0)).toSeq
      }
      ServingCache.clear()
      val c3 = t3(); val c2 = t2()
      val missesCold = ServingCache.misses.get()
      assert(missesCold >= 2)
      val w3 = t3(); val w2 = t2()
      assert(ServingCache.misses.get() == missesCold,
        "warm ts-filtered statements must reuse cached graphs AND attrs")
      assert(w3 == c3 && w2 == c2)
      // semantics unchanged: every id obeys the predicate (label=id%4,
      // ts=(id%25)/25 by construction)
      assert(w3.forall(id => id % 4 == 2 && (id % 25) / 25.0 >= 0.1 && (id % 25) / 25.0 <= 0.7))
      assert(w2.forall(id => (id % 25) / 25.0 >= 0.2 && (id % 25) / 25.0 <= 0.6))
    } finally AnnCatalog.unregister(basePath)
  }

  test("a statement straddling a flip + GC retries onto the new generation") {
    // the corner the serving retry loop exists for: a statement
    // resolves (flat layout, v0); before its scan runs, a maintenance
    // fold flips the store to a generation AND a second maintenance op
    // GCs the flat files the statement planned against. The pass must
    // fail (its files are gone), re-resolve the NEW pair, and serve
    // the fresh generation — not propagate the IO error.
    val root = Files.createTempDirectory("graft_servcache_flip").toFile
    root.deleteOnExit()
    val basePath = s"$root/base"
    val indexPath = s"$root/index"
    mkBase(basePath, 400, idOffset = 0L, seed = 23)
    AnnIndexStore.build(spark.read.parquet(basePath), indexPath, numBuckets = 3)
    AnnCatalog.register(basePath, indexPath, idCol = "id", vecCol = "vec",
      ef = 400, trusted = true)
    try {
      def stmt(qv: Array[Float]): Seq[Long] = {
        val df = spark.read.parquet(basePath)
          .orderBy(VectorFunctions.l2Sq(col("vec"), typedLit(qv)), col("id"))
          .select("id").limit(10)
        assert(df.queryExecution.executedPlan.toString.contains("AnnTopK"))
        df.collect().map(_.getLong(0)).toSeq
      }
      val qv = spark.read.parquet(basePath).filter(col("id") === 99L)
        .select("vec").head.getSeq[Float](0).toArray
      ServingCache.clear()
      val before = stmt(qv)
      assert(before == exactTopK(basePath, qv, 10))
      val fired = new java.util.concurrent.atomic.AtomicInteger(0)
      AnnIndexStore.postResolveHook = () =>
        if (fired.getAndIncrement() == 0) {
          // two back-to-back folds: the first flips the store to the
          // generation layout (new version); the SECOND's entry GCs the
          // flat layout the in-flight statement resolved (appends never
          // GC — only a compaction entry does). Rows are unchanged, so
          // the retried statement must serve identical results.
          AnnIndexStore.compactDelta(spark, indexPath, numBuckets = 3)
          AnnIndexStore.compactDelta(spark, indexPath, numBuckets = 3)
        }
      val after =
        try stmt(qv)
        finally AnnIndexStore.postResolveHook = () => ()
      assert(fired.get() >= 2, "the statement must have re-resolved after the failure")
      assert(AnnIndexStore.resolveStore(indexPath) != indexPath,
        "the fold must have flipped the store")
      assert(after == before,
        "the retried statement must serve the new generation's identical rows")
    } finally AnnCatalog.unregister(basePath)
  }
}
