package graft.index

/** Sorted-timestamp view over a sub-index's aligned `ts` array, built
  * once per sub-index and shared by every query against it.
  *
  * Replaces the per-query O(N) coverage scans with O(log N) binary
  * search — the reference computes range coverage the same way, by
  * binary search on its sorted replica (hybrid_graph.cpp:181-199) — and
  * provides the two things a filtered walk wants from the range:
  *  - evenly spaced in-range entry seeds (the reference seeds its
  *    filtered beam with points inside the predicate slice,
  *    searcher.hpp:301-317, so the walk doesn't start outside it);
  *  - the full in-range node list for SMALL slices, where an exact scan
  *    beats any graph walk (hybrid_graph.cpp:356-364).
  */
final class TsIndex(ts: Array[Double]) extends Serializable {

  // permutation of node ids ordered by (ts, id) — id tiebreak keeps
  // every downstream selection deterministic
  private val perm: Array[Int] = {
    val p = Array.tabulate(ts.length)(identity)
    val boxed = p.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, (a: Integer, b: Integer) => {
      val c = java.lang.Double.compare(ts(a), ts(b))
      if (c != 0) c else Integer.compare(a, b)
    })
    boxed.map(_.intValue())
  }
  private val sortedTs: Array[Double] = perm.map(ts)

  def length: Int = ts.length

  // first position with sortedTs(pos) >= bound
  private def lowerBound(bound: Double): Int = {
    var lo = 0
    var hi = sortedTs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sortedTs(mid) < bound) lo = mid + 1 else hi = mid
    }
    lo
  }

  // first position with sortedTs(pos) > bound
  private def upperBound(bound: Double): Int = {
    var lo = 0
    var hi = sortedTs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sortedTs(mid) <= bound) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Number of nodes with l <= ts <= r, O(log N). */
  def count(l: Double, r: Double): Int =
    math.max(0, upperBound(r) - lowerBound(l))

  /** In-range fraction of the sub-index, O(log N). */
  def coverage(l: Double, r: Double): Double =
    if (ts.length == 0) 1.0 else count(l, r).toDouble / ts.length

  /** Up to `n` evenly spaced in-range node ids — filtered-walk entry
    * seeds. Deterministic: positions are fixed fractions of the range. */
  def seeds(l: Double, r: Double, n: Int): Array[Int] = {
    val lo = lowerBound(l)
    val hi = upperBound(r)
    val cnt = hi - lo
    if (cnt <= 0) return Array.emptyIntArray
    if (cnt <= n) return java.util.Arrays.copyOfRange(perm, lo, hi)
    Array.tabulate(n)(i => perm(lo + (i.toLong * cnt / n).toInt))
  }

  /** All in-range node ids (ascending id order irrelevant — callers
    * rank by distance), for exact SMALL-slice scans. */
  def inRange(l: Double, r: Double): Array[Int] = {
    val lo = lowerBound(l)
    val hi = upperBound(r)
    if (hi <= lo) Array.emptyIntArray
    else java.util.Arrays.copyOfRange(perm, lo, hi)
  }
}
