package graft.tools

import graft.index.HnswIndex

/** Dev-only: single-index search throughput (no Spark).
  * Usage: runMain graft.tools.SearchBench [n] [nq] [ef] */
object SearchBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 100000
    val nq = if (args.length > 1) args(1).toInt else 2000
    val ef = if (args.length > 2) args(2).toInt else 150
    val dim = 100
    val rnd = new java.util.Random(7)
    val idx = new HnswIndex(dim, 16, 200)
    val t0 = System.nanoTime()
    var i = 0
    while (i < n) {
      idx.add(Array.fill(dim)(rnd.nextFloat()))
      i += 1
    }
    println(f"build: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val qs = Array.fill(nq)(Array.fill(dim)(rnd.nextFloat()))
    // warmup
    qs.take(200).foreach(q => idx.search(q, 100, ef))
    val t1 = System.nanoTime()
    var sink = 0L
    qs.foreach { q => sink += idx.search(q, 100, ef).length }
    val dt = (System.nanoTime() - t1) / 1e9
    println(f"search: $nq queries in $dt%.2f s = ${nq / dt}%.0f q/s (sink $sink)")
    // per-query serving cost of re-deserializing the stored graph —
    // what HnswIndex.fromBytesCached amortizes away across queries
    val bytes = idx.toBytes
    val t2 = System.nanoTime()
    val r1 = HnswIndex.fromBytes(bytes)
    val cold = (System.nanoTime() - t2) / 1e9
    HnswIndex.clearCache()
    HnswIndex.fromBytesCached(bytes) // populate untimed — time pure HITS
    val t3 = System.nanoTime()
    var j = 0
    while (j < 20) { HnswIndex.fromBytesCached(bytes); j += 1 }
    val warm = (System.nanoTime() - t3) / 1e9 / 20
    println(f"deserialize: cold ${cold}%.3f s/load, cached hit ${warm * 1e6}%.1f us/load " +
      f"(blob ${bytes.length / 1e6}%.1f MB, sink ${r1.size})")
  }
}
