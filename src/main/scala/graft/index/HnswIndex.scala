package graft.index

import scala.collection.mutable

/** In-memory HNSW graph for squared-L2 ANN search.
  *
  * Implements the published HNSW algorithm (Malkov & Yashunin 2016,
  * arXiv:1603.09320): exponential level assignment, greedy descent
  * through upper layers, beam search (`ef`) at level 0, and the
  * diversity-pruning neighbor-selection heuristic. The reference uses
  * the same algorithm family (vendored hnswlib,
  * pyglass/glass/hnswlib/hnswalg.h:1087-1202 insert,
  * pyglass/glass/searcher.hpp:262-299 filtered walk) — this is a clean
  * re-implementation of the published algorithm, not a port.
  *
  * Deterministic: single-threaded build, seeded level RNG, id-ordered
  * tie-breaks. Optional `allowed` predicate supports the reference's
  * filtered search (predicate applied at result collection; the walk
  * itself stays unfiltered so connectivity is preserved).
  */
final class HnswIndex(
    val dim: Int,
    val m: Int = 16,
    val efConstruction: Int = 200,
    seed: Long = 42L) extends Serializable {

  private val maxM = m
  private val maxM0 = 2 * m
  private val pruneSlack = 8
  private val levelMult = 1.0 / math.log(m.toDouble)
  private val rng = new java.util.Random(seed)

  private val vecs = mutable.ArrayBuffer.empty[Array[Float]]
  private val nodeLevel = mutable.ArrayBuffer.empty[Int]
  // links(node)(level) = neighbor ids (primitive int lists, no boxing)
  private val links = mutable.ArrayBuffer.empty[Array[IntList]]
  private var entry = -1
  private var topLevel = -1

  def size: Int = vecs.length

  // SIMD squared-L2 via the Panama Vector API when the incubator module
  // is enabled, 4-lane-unrolled scalar otherwise (graft.simd
  // VectorKernels.Holder picks at class-load). Float accumulation is
  // fine here — the index is the approximate path (exact re-ranking
  // uses the Catalyst expressions).
  @transient private lazy val kernel = graft.simd.VectorKernels.Holder.KERNEL

  @inline private def dist(a: Array[Float], b: Array[Float]): Double =
    kernel.l2sq(a, b)

  @inline private def distTo(q: Array[Float], node: Int): Double = dist(q, vecs(node))

  /** Greedy single-entry descent at one level. */
  private def greedyStep(q: Array[Float], start: Int, level: Int): Int = {
    var cur = start
    var curD = distTo(q, cur)
    var improved = true
    while (improved) {
      improved = false
      val nbrs = links(cur)(level)
      var i = 0
      while (i < nbrs.length) {
        val c = nbrs(i)
        val d = distTo(q, c)
        if (d < curD) { cur = c; curD = d; improved = true }
        i += 1
      }
    }
    cur
  }

  // generation-stamped visited set — amortizes clearing across searches,
  // the reference's lazy-clearing bitset (pyglass/glass/neighbor.hpp:41-102)
  @transient private var visitedMark: Array[Int] = _
  @transient private var visitedGen = 0

  private def nextVisitedGen(): Int = {
    if (visitedMark == null || visitedMark.length < vecs.length) {
      visitedMark = new Array[Int](math.max(vecs.length * 2, 1024))
      visitedGen = 0
    }
    visitedGen += 1
    visitedGen
  }

  // build-path scratch heaps (single-threaded insert loop): searchLayer
  // runs once per level per insert — reusing the two heaps removes the
  // dominant allocation churn of the build (the reference's pools are
  // likewise reused across searches, pyglass/glass/neighbor.hpp:125-303)
  @transient private var scratchCand: MinDistHeap = _
  @transient private var scratchRes: BoundedMaxHeap = _

  /** Beam search at one level; returns the ≤ ef best (dist, id) pairs.
    * NOTE the returned heap is scratch when ef == efConstruction —
    * consume it before the next searchLayer call (single-threaded). */
  private def searchLayer(q: Array[Float], start: Int, ef: Int, level: Int): BoundedMaxHeap = {
    val gen = nextVisitedGen()
    val seen = visitedMark
    val reuse = ef == efConstruction
    if (reuse && scratchRes == null) {
      scratchCand = new MinDistHeap(ef + 1)
      scratchRes = new BoundedMaxHeap(ef)
    }
    val cand = if (reuse) { scratchCand.clear(); scratchCand } else new MinDistHeap(ef + 1)
    val res = if (reuse) { scratchRes.clear(); scratchRes } else new BoundedMaxHeap(ef)
    val d0 = distTo(q, start)
    cand.push(d0, start); res.offer(d0, start); seen(start) = gen
    while (cand.nonEmpty) {
      val cd = cand.minDist
      val c = cand.minId
      if (cd > res.worstDist && res.isFull) {
        cand.clear()
      } else {
        cand.pop()
        val nbrs = links(c)(level)
        var i = 0
        while (i < nbrs.length) {
          val nb = nbrs(i)
          if (seen(nb) != gen) {
            seen(nb) = gen
            val d = distTo(q, nb)
            if (!res.isFull || d < res.worstDist) {
              cand.push(d, nb)
              res.offer(d, nb)
            }
          }
          i += 1
        }
      }
    }
    res
  }

  /** Diversity heuristic (Malkov alg. 4): keep candidate c only if it is
    * closer to q than to every already-kept neighbor. Candidates arrive
    * packed as (floatBits(dist) << 32 | id) longs — a plain long sort is
    * (dist, id) order with zero boxing (dists are non-negative).
    * The diversity loop only considers the closest `4·count` candidates
    * (the tail of a 200-wide beam almost never survives pruning but
    * would cost O(tail · kept) distance calls per insert). */
  private def selectNeighbors(packed: Array[Long], count: Int): IntList = {
    java.util.Arrays.sort(packed)
    val window = math.min(packed.length, count * 4)
    val kept = new IntList(count)
    val keptD = new Array[Array[Float]](count)
    var i = 0
    while (i < window && kept.length < count) {
      val dq = java.lang.Float.intBitsToFloat((packed(i) >>> 32).toInt).toDouble
      val c = (packed(i) & 0xffffffffL).toInt
      val cv = vecs(c)
      var ok = true
      var j = 0
      while (ok && j < kept.length) {
        if (dist(cv, keptD(j)) < dq) ok = false
        j += 1
      }
      if (ok) { keptD(kept.length) = cv; kept += c }
      i += 1
    }
    // backfill with closest pruned if underfull
    if (kept.length < count) {
      i = 0
      while (i < packed.length && kept.length < count) {
        val c = (packed(i) & 0xffffffffL).toInt
        if (!kept.contains(c)) kept += c
        i += 1
      }
    }
    kept
  }

  @inline private def pack(d: Double, id: Int): Long =
    (java.lang.Float.floatToIntBits(d.toFloat).toLong << 32) | (id.toLong & 0xffffffffL)

  def add(vec: Array[Float]): Int = {
    val id = vecs.length
    val level = math.min((-math.log(rng.nextDouble()) * levelMult).toInt, 32)
    vecs += vec
    nodeLevel += level
    links += Array.fill(level + 1)(new IntList(if (level == 0) maxM0 + 1 else maxM + 1))
    if (entry < 0) {
      entry = id; topLevel = level
      return id
    }
    var cur = entry
    // descend levels above the node's level greedily
    var l = topLevel
    while (l > level) {
      cur = greedyStep(vec, cur, l)
      l -= 1
    }
    // insert at each level from min(topLevel, level) down to 0
    l = math.min(topLevel, level)
    while (l >= 0) {
      val found = searchLayer(vec, cur, efConstruction, l).toPacked
      val cap = if (l == 0) maxM0 else maxM
      // selectNeighbors sorts `found` in place — afterwards found(0) is
      // the closest candidate, reused as the next level's entry point
      val nbrs = selectNeighbors(found, cap)
      links(id)(l) = nbrs
      // bidirectional links with pruning — lists may overshoot `cap` by
      // a small slack before being pruned back, amortizing the O(deg²)
      // re-selection over several inserts (degree stays ≤ cap + slack)
      var i = 0
      while (i < nbrs.length) {
        val nb = nbrs(i)
        val nbLinks = links(nb)(l)
        nbLinks += id
        if (nbLinks.length > cap + pruneSlack) {
          val nbv = vecs(nb)
          val withD = new Array[Long](nbLinks.length)
          var t = 0
          while (t < nbLinks.length) {
            withD(t) = pack(dist(nbv, vecs(nbLinks(t))), nbLinks(t)); t += 1
          }
          links(nb)(l) = selectNeighbors(withD, cap)
        }
        i += 1
      }
      if (found.nonEmpty) cur = (found(0) & 0xffffffffL).toInt
      l -= 1
    }
    if (level > topLevel) { topLevel = level; entry = id }
    id
  }

  /** Compact binary serialization (dim, params, entry, levels, vectors,
    * adjacency) — the persisted form of the batch index-build job. */
  def toBytes: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(new java.util.zip.DeflaterOutputStream(bos))
    out.writeInt(dim); out.writeInt(m); out.writeInt(efConstruction)
    out.writeInt(size); out.writeInt(entry); out.writeInt(topLevel)
    var i = 0
    while (i < size) {
      out.writeInt(nodeLevel(i))
      val v = vecs(i)
      var d = 0
      while (d < v.length) { out.writeFloat(v(d)); d += 1 }
      val ls = links(i)
      var l = 0
      while (l < ls.length) {
        out.writeInt(ls(l).length)
        var j = 0
        while (j < ls(l).length) { out.writeInt(ls(l)(j)); j += 1 }
        l += 1
      }
      i += 1
    }
    out.close()
    bos.toByteArray
  }

  private[index] def restore(n: Int, e: Int, tl: Int,
      in: java.io.DataInputStream): Unit = {
    entry = e; topLevel = tl
    var i = 0
    while (i < n) {
      val lvl = in.readInt()
      nodeLevel += lvl
      val v = new Array[Float](dim)
      var d = 0
      while (d < dim) { v(d) = in.readFloat(); d += 1 }
      vecs += v
      val ls = Array.fill(lvl + 1)(new IntList(4))
      var l = 0
      while (l <= lvl) {
        val cnt = in.readInt()
        var j = 0
        while (j < cnt) { ls(l) += in.readInt(); j += 1 }
        l += 1
      }
      links += ls
      i += 1
    }
  }

  /** In-filter beam search at level 0: the walk's frontier expands over
    * ALL nodes (distance-ordered, unfiltered — disallowed nodes still
    * route), but the result pool only accepts `allowed` nodes. The
    * reference's in-filter walk shape (searcher.hpp:415-491,
    * SearchRangeFilterSubTime) without the 2-hop budget heuristic. */
  private def searchLayerFiltered(q: Array[Float], start: Int, ef: Int,
      allowed: Int => Boolean): BoundedMaxHeap = {
    val gen = nextVisitedGen()
    val seen = visitedMark
    val cand = new MinDistHeap(ef + 1)
    val res = new BoundedMaxHeap(ef)
    val d0 = distTo(q, start)
    cand.push(d0, start)
    if (allowed(start)) res.offer(d0, start)
    seen(start) = gen
    while (cand.nonEmpty) {
      val cd = cand.minDist
      val c = cand.minId
      if (cd > res.worstDist && res.isFull) {
        cand.clear()
      } else {
        cand.pop()
        val nbrs = links(c)(0)
        var i = 0
        while (i < nbrs.length) {
          val nb = nbrs(i)
          if (seen(nb) != gen) {
            seen(nb) = gen
            val d = distTo(q, nb)
            if (!res.isFull || d < res.worstDist) {
              cand.push(d, nb)
              if (allowed(nb)) res.offer(d, nb)
            }
          }
          i += 1
        }
      }
    }
    res
  }

  /** Top-k (internal id, dist) by squared L2, ascending (dist, id).
    * With `allowed`, runs the in-filter walk ([[searchLayerFiltered]] —
    * the reference's SearchFilter/SearchRangeFilter dispatch,
    * searcher.hpp:262-374). */
  def search(q: Array[Float], k: Int, ef: Int,
      allowed: Int => Boolean = null): Array[(Int, Double)] = {
    if (entry < 0) return Array.empty
    var cur = entry
    var l = topLevel
    while (l > 0) {
      cur = greedyStep(q, cur, l)
      l -= 1
    }
    val effEf = math.max(ef, k)
    val res =
      if (allowed == null) searchLayer(q, cur, effEf, 0)
      else searchLayerFiltered(q, cur, effEf, allowed)
    res.toPairs.map(t => (t._2, t._1)).sortBy(t => (t._2, t._1)).take(k)
  }
}

object HnswIndex {
  def fromBytes(bytes: Array[Byte]): HnswIndex = {
    val in = new java.io.DataInputStream(
      new java.util.zip.InflaterInputStream(new java.io.ByteArrayInputStream(bytes)))
    val dim = in.readInt(); val m = in.readInt(); val efC = in.readInt()
    val n = in.readInt(); val entry = in.readInt(); val topLevel = in.readInt()
    val idx = new HnswIndex(dim, m, efC)
    idx.restore(n, entry, topLevel, in)
    in.close()
    idx
  }
}
