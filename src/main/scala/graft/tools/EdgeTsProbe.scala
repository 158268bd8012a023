package graft.tools

import graft.index.{HnswIndex, TsIndex}
import graft.operators.SearchParams

/** A/B for the per-edge-timestamp skip (reference graph.hpp:21,81-83
  * inline neighbor timestamps, checked before the distance at
  * searcher.hpp:343-344): measures the filtered-walk throughput and
  * recall of the node-ts in-filter walk with the predicate checked
  * AFTER the distance (compute-then-drop, round-3..6 shape) vs BEFORE
  * it on chain-cut neighbors (the reference's order,
  * HnswIndex.prefilterDisallowed). Single JVM, no Spark — the walk is
  * the unit under test.
  *
  * Measured (300k rows, dim 100, k=10, ef=150, 2026-08-13): the
  * predicate-first order is a recall-per-budget WIN, not just a cost
  * skip — dropped neighbors stop consuming the visit budget, so at
  * coverage 0.02/0.10/0.30/0.60 recall@10 goes 0.52→0.84 / 0.69→0.83 /
  * 0.74→0.78 / 0.65→0.66 at 163/251/354/759 q/s vs 333/301/384/768.
  * Landed as the default; the reference's inline edge-ts array is just
  * a memory-locality variant of the same check and stays skipped.
  *
  * Usage: runMain graft.tools.EdgeTsProbe [n] [nq] [k] [ef]
  */
object EdgeTsProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1000000
    val nq = if (args.length > 1) args(1).toInt else 200
    val k = if (args.length > 2) args(2).toInt else 10
    val ef = if (args.length > 3) args(3).toInt else 150
    val dim = 100
    val rnd = new java.util.Random(7)

    println(s"building HNSW over $n rows (dim $dim)...")
    val vecs = Array.fill(n)(Array.fill(dim)(rnd.nextFloat()))
    val ts = Array.tabulate(n)(i => ((i * 2654435761L) % 1000003L).toDouble / 1000003.0)
    val t0 = System.nanoTime()
    val idx = HnswIndex.buildOn(dim, 16, 200, vecs.iterator,
      HnswIndex.maxAbsOf(vecs.iterator))
    println(f"build: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val tsIdx = new TsIndex(ts)
    val queries = Array.fill(nq)(Array.fill(dim)(rnd.nextFloat()))

    val coverages = Seq(0.02, 0.1, 0.3, 0.6)
    for (cover <- coverages) {
      val l = 0.2
      val r = l + cover
      val allowed: Int => Boolean = i => ts(i) >= l && ts(i) <= r
      val seeds = tsIdx.seeds(l, r, SearchParams.FilterSeeds)
      val wEf = SearchParams.inFilterEf(ef, cover)
      // exact oracle for recall (brute force over the slice)
      val exact = queries.map(q => idx.exactOver(q, tsIdx.inRange(l, r), k).map(_._1).toSet)
      for (prefilter <- Seq(false, true)) {
        HnswIndex.prefilterDisallowed = prefilter
        // warmup
        queries.take(20).foreach(q => idx.search(q, k, wEf, allowed, seeds))
        val t1 = System.nanoTime()
        var reps = 0
        var hits = 0L
        while (reps < 3) {
          var qi = 0
          while (qi < nq) {
            val got = idx.search(queries(qi), k, wEf, allowed, seeds)
            if (reps == 0) hits += got.map(_._1).count(exact(qi).contains)
            qi += 1
          }
          reps += 1
        }
        val dt = (System.nanoTime() - t1) / 1e9
        val recall = hits.toDouble / (nq.toLong * k)
        println(f"cover=$cover%.2f prefilter=$prefilter%-5s  ${3 * nq / dt}%8.0f q/s  recall@$k=$recall%.4f")
      }
    }
  }
}
