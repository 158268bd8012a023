package graft.index

/** Primitive-array heaps for the HNSW beam search — no boxing, no
  * per-operation allocation (the JVM analog of the reference's
  * array-backed pools, pyglass/glass/neighbor.hpp:125-303). */

/** Growable min-heap on (dist, id). */
private[index] final class MinDistHeap(initCap: Int) {
  private var d = new Array[Double](math.max(initCap, 8))
  private var id = new Array[Int](math.max(initCap, 8))
  private var n = 0

  def size: Int = n
  def nonEmpty: Boolean = n > 0
  def clear(): Unit = n = 0
  def minDist: Double = d(0)
  def minId: Int = id(0)

  def push(dist: Double, node: Int): Unit = {
    if (n == d.length) {
      d = java.util.Arrays.copyOf(d, n * 2)
      id = java.util.Arrays.copyOf(id, n * 2)
    }
    var i = n
    d(i) = dist; id(i) = node
    n += 1
    while (i > 0) {
      val p = (i - 1) >> 1
      if (d(i) < d(p)) {
        val td = d(i); d(i) = d(p); d(p) = td
        val ti = id(i); id(i) = id(p); id(p) = ti
        i = p
      } else i = 0
    }
  }

  /** Remove the min; call minDist/minId BEFORE popping. */
  def pop(): Unit = {
    n -= 1
    d(0) = d(n); id(0) = id(n)
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < n && d(l) < d(m)) m = l
      if (r < n && d(r) < d(m)) m = r
      if (m == i) done = true
      else {
        val td = d(i); d(i) = d(m); d(m) = td
        val ti = id(i); id(i) = id(m); id(m) = ti
        i = m
      }
    }
  }
}

/** Bounded max-heap keeping the `cap` smallest (dist, id); root = worst kept. */
private[index] final class BoundedMaxHeap(val cap: Int) {
  private val d = new Array[Double](math.max(cap, 1))
  private val id = new Array[Int](math.max(cap, 1))
  private var n = 0

  def size: Int = n
  def isFull: Boolean = n >= cap
  def worstDist: Double = d(0)
  def clear(): Unit = n = 0

  /** Returns true if the element was kept. */
  def offer(dist: Double, node: Int): Boolean = {
    if (n < cap) {
      var i = n
      d(i) = dist; id(i) = node
      n += 1
      while (i > 0) {
        val p = (i - 1) >> 1
        if (d(i) > d(p)) {
          val td = d(i); d(i) = d(p); d(p) = td
          val ti = id(i); id(i) = id(p); id(p) = ti
          i = p
        } else i = 0
      }
      true
    } else if (dist < d(0)) {
      d(0) = dist; id(0) = node
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < n && d(l) > d(m)) m = l
        if (r < n && d(r) > d(m)) m = r
        if (m == i) done = true
        else {
          val td = d(i); d(i) = d(m); d(m) = td
          val ti = id(i); id(i) = id(m); id(m) = ti
          i = m
        }
      }
      true
    } else false
  }

  /** (dist, id) pairs, unsorted. */
  def toPairs: Array[(Double, Int)] = Array.tabulate(n)(i => (d(i), id(i)))

  /** Packed (floatBits(dist) << 32 | id) longs, unsorted — sorting these
    * as plain longs is (dist, id) order (dists non-negative). */
  def toPacked: Array[Long] = Array.tabulate(n)(i =>
    (java.lang.Float.floatToIntBits(d(i).toFloat).toLong << 32) | (id(i).toLong & 0xffffffffL))

  /** [[toPacked]] into a reusable buffer (grown on demand); returns the
    * element count. Removes the per-insert allocation in the build's
    * hot loop. */
  def toPackedInto(buf: Array[Long]): (Array[Long], Int) = {
    val out = if (buf != null && buf.length >= n) buf else new Array[Long](math.max(n, 64))
    var i = 0
    while (i < n) {
      out(i) = (java.lang.Float.floatToIntBits(d(i).toFloat).toLong << 32) |
        (id(i).toLong & 0xffffffffL)
      i += 1
    }
    (out, n)
  }
}

/** Bounded max-heap keeping the `cap` LEXICOGRAPHICALLY smallest
  * (dist, id) pairs at full double precision — the selection the
  * exact-slice scan needs: its contract is strict (dist, id) ascending
  * order, so distance ties must evict by id, not by arrival order
  * (BoundedMaxHeap) or by float-rounded dist (toPacked). O(n log k)
  * with zero boxing, replacing the full-slice sortBy that TimSort'd
  * tens of thousands of boxed tuples per query. */
private[index] final class BoundedTieHeap(val cap: Int) {
  private val d = new Array[Double](math.max(cap, 1))
  private val id = new Array[Int](math.max(cap, 1))
  private var n = 0

  def size: Int = n

  // (d1, i1) lexicographically worse (greater) than (d2, i2)?
  @inline private def worse(d1: Double, i1: Int, d2: Double, i2: Int): Boolean =
    d1 > d2 || (d1 == d2 && i1 > i2)

  def offer(dist: Double, node: Int): Unit = {
    if (n < cap) {
      var i = n
      d(i) = dist; id(i) = node
      n += 1
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(d(i), id(i), d(p), id(p))) {
          val td = d(i); d(i) = d(p); d(p) = td
          val ti = id(i); id(i) = id(p); id(p) = ti
          i = p
        } else i = 0
      }
    } else if (worse(d(0), id(0), dist, node)) {
      d(0) = dist; id(0) = node
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < n && worse(d(l), id(l), d(m), id(m))) m = l
        if (r < n && worse(d(r), id(r), d(m), id(m))) m = r
        if (m == i) done = true
        else {
          val td = d(i); d(i) = d(m); d(m) = td
          val ti = id(i); id(i) = id(m); id(m) = ti
          i = m
        }
      }
    }
  }

  /** Drain destructively into (id, dist) pairs ascending by (dist, id). */
  def drainSortedPairs(): Array[(Int, Double)] = {
    val out = new Array[(Int, Double)](n)
    var i = n - 1
    while (i >= 0) {
      out(i) = (id(0), d(0))
      // remove the root (current worst kept)
      n -= 1
      d(0) = d(n); id(0) = id(n)
      var j = 0
      var done = false
      while (!done) {
        val l = 2 * j + 1; val r = l + 1
        var m = j
        if (l < n && worse(d(l), id(l), d(m), id(m))) m = l
        if (r < n && worse(d(r), id(r), d(m), id(m))) m = r
        if (m == j) done = true
        else {
          val td = d(j); d(j) = d(m); d(m) = td
          val ti = id(j); id(j) = id(m); id(m) = ti
          j = m
        }
      }
      i -= 1
    }
    out
  }
}
