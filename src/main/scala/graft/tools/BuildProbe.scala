package graft.tools

import graft.index.HnswIndex

/** Micro-probe: single-threaded HNSW build rate + where the time goes. */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 40000
    val dim = 100
    val rnd = new java.util.Random(7)
    val data = Array.fill(n)(Array.fill(dim)(rnd.nextFloat()))
    // warmup
    val w = new HnswIndex(dim, 16, 200)
    data.take(5000).foreach(w.add)
    val t0 = System.nanoTime()
    val idx = new HnswIndex(dim, 16, 200)
    data.foreach(idx.add)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"BUILD n=$n rate=${n / secs}%.0f rows/s total=$secs%.1f s")
    val t1 = System.nanoTime()
    var i = 0
    var acc = 0L
    while (i < 2000) { acc += idx.search(data(i), 10, 150).length; i += 1 }
    val qsecs = (System.nanoTime() - t1) / 1e9
    println(f"SEARCH 2000q rate=${2000 / qsecs}%.0f q/s ($acc)")
  }
}
