package graft.index

/** Executor-resident cache of DESERIALIZED store rows for the SQL
  * serving path — the fix for the read-on-hit tax: the previous cache
  * ([[HnswIndex.fromBytesCached]]) was keyed by a content fingerprint
  * of the blob bytes, so every served statement still had to SCAN the
  * probed rows' parquet blobs just to compute the key. Entries here are
  * keyed by (store path, write-time store version, bucket, sub) — all
  * four available from a scan of the store's TINY columns — so a warm
  * statement reads zero blob bytes (the reference keeps its index
  * resident across queries the same way, hybrid_graph.cpp:47-89 build
  * once / serve many).
  *
  * Invalidation: the version token is stamped by every store WRITE
  * ([[AnnIndexStore.stampVersion]] — a fresh UUID after the parquet
  * job commits), so a rebuilt store at the same path can never serve a
  * stale graph: its statements carry a new version and miss. Entries
  * under dead versions age out of the byte-budget LRU. A store with no
  * version file (legacy layout, or a writer that died between the
  * parquet commit and the stamp) falls back to the content-fingerprint
  * path, which is slower but can never serve stale bytes.
  *
  * Same concurrency design as the fingerprint cache (its A/B applies
  * unchanged): lock-free ConcurrentHashMap hits + a volatile access
  * tick; eviction only locks when an insert crosses the byte budget.
  * Per-JVM = per-executor on a cluster — each executor caches only the
  * rows its scan tasks touch, the locality a bucketed scan gives it.
  */
object ServingCache {

  /** One deserialized store row: the graph, its aligned external ids,
    * and (for stores built with `attrCol`) the aligned ts doubles. The
    * sorted-ts view is built once per entry and shared by every
    * statement that range-filters this row. */
  final class Entry(val index: HnswIndex, val ids: Array[Long],
      val attrs: Array[Double]) {
    @volatile private[ServingCache] var tick: Long = 0L
    private[ServingCache] val bytes: Long =
      index.approxRetainedBytes + 8L * ids.length +
        (if (attrs == null) 0L else 8L * attrs.length) + 64L
    lazy val tsIndex: TsIndex = new TsIndex(attrs)
  }

  private final case class Key(path: String, version: String,
      bucket: Long, sub: Int)

  private val MaxCachedBytes: Long = {
    val dflt = math.max(64L << 20,
      math.min(1L << 30, Runtime.getRuntime.maxMemory() / 8))
    java.lang.Long.getLong("graft.serving.cacheBytes", dflt)
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[Key, Entry]
  private val clock = new java.util.concurrent.atomic.AtomicLong()
  private val cachedBytes = new java.util.concurrent.atomic.AtomicLong()

  // observability for specs and the serving micro-bench: how often the
  // warm path hit, and how often a blob had to be read
  val hits = new java.util.concurrent.atomic.AtomicLong()
  val misses = new java.util.concurrent.atomic.AtomicLong()

  // sizing observability (the r11 t1_label 448-vs-59 ms discord was
  // undiagnosable because the bench reported latency with no view of
  // the cache state behind it): the effective byte budget, current
  // residency, and entry count, for the bench's serving_diag block
  def maxBytes: Long = MaxCachedBytes
  def usedBytes: Long = cachedBytes.get()
  def entryCount: Int = cache.size()

  def get(path: String, version: String, bucket: Long, sub: Int): Entry = {
    val e = cache.get(Key(path, version, bucket, sub))
    if (e != null) {
      e.tick = clock.incrementAndGet()
      hits.incrementAndGet()
    } else misses.incrementAndGet()
    e
  }

  /** Insert a freshly deserialized row (the cold pass). Returns the
    * winning entry when two tasks race the same key. */
  def put(path: String, version: String, bucket: Long, sub: Int,
      index: HnswIndex, ids: Array[Long], attrs: Array[Double]): Entry = {
    val e = new Entry(index, ids, attrs)
    if (MaxCachedBytes <= 0) return e
    val race = cache.putIfAbsent(Key(path, version, bucket, sub), e)
    if (race != null) {
      race.tick = clock.incrementAndGet()
      race
    } else {
      e.tick = clock.incrementAndGet()
      if (cachedBytes.addAndGet(e.bytes) > MaxCachedBytes) evictOver()
      e
    }
  }

  private def evictOver(): Unit = cache.synchronized {
    while (cachedBytes.get() > MaxCachedBytes && cache.size() > 1) {
      var worstK: Key = null
      var worst = Long.MaxValue
      val it = cache.entrySet().iterator()
      while (it.hasNext) {
        val en = it.next()
        val t = en.getValue.tick
        if (t < worst) { worst = t; worstK = en.getKey }
      }
      if (worstK == null) return
      val removed = cache.remove(worstK)
      if (removed != null) cachedBytes.addAndGet(-removed.bytes)
    }
  }

  /** Test hook: drop everything and reset the counters. */
  def clear(): Unit = cache.synchronized {
    cache.clear(); cachedBytes.set(0L); hits.set(0L); misses.set(0L)
  }
}
