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
  private val levelMult = 1.0 / math.log(m.toDouble)
  private val rng = new java.util.Random(seed)

  private val vecs = mutable.ArrayBuffer.empty[Array[Float]]
  private val nodeLevel = mutable.ArrayBuffer.empty[Int]
  // links(node)(level) = neighbor ids
  private val links = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
  private var entry = -1
  private var topLevel = -1

  def size: Int = vecs.length

  @inline private def dist(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      val d = a(i).toDouble - b(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

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

  /** Beam search at one level; returns up to ef (dist, id) pairs. */
  private def searchLayer(q: Array[Float], start: Int, ef: Int, level: Int): mutable.PriorityQueue[(Double, Int)] = {
    val visited = mutable.HashSet.empty[Int]
    // candidates: min-heap by dist (negate for PQ); results: max-heap by dist
    val cand = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(t => -t._1))
    val res = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(t => t._1))
    val d0 = distTo(q, start)
    cand.enqueue((d0, start)); res.enqueue((d0, start)); visited += start
    while (cand.nonEmpty) {
      val (cd, c) = cand.dequeue()
      if (cd > res.head._1 && res.size >= ef) {
        cand.clear()
      } else {
        val nbrs = links(c)(level)
        var i = 0
        while (i < nbrs.length) {
          val nb = nbrs(i)
          if (!visited.contains(nb)) {
            visited += nb
            val d = distTo(q, nb)
            if (res.size < ef || d < res.head._1) {
              cand.enqueue((d, nb))
              res.enqueue((d, nb))
              if (res.size > ef) res.dequeue()
            }
          }
          i += 1
        }
      }
    }
    res
  }

  /** Diversity heuristic (Malkov alg. 4): keep candidate c only if it is
    * closer to q than to every already-kept neighbor. */
  private def selectNeighbors(q: Array[Float], cands: Seq[(Double, Int)], count: Int): mutable.ArrayBuffer[Int] = {
    val sorted = cands.sortBy(t => (t._1, t._2))
    val kept = mutable.ArrayBuffer.empty[Int]
    val keptD = mutable.ArrayBuffer.empty[Array[Float]]
    var i = 0
    while (i < sorted.length && kept.length < count) {
      val (dq, c) = sorted(i)
      val cv = vecs(c)
      var ok = true
      var j = 0
      while (ok && j < keptD.length) {
        if (dist(cv, keptD(j)) < dq) ok = false
        j += 1
      }
      if (ok) { kept += c; keptD += cv }
      i += 1
    }
    // backfill with closest pruned if underfull
    if (kept.length < count) {
      i = 0
      while (i < sorted.length && kept.length < count) {
        if (!kept.contains(sorted(i)._2)) kept += sorted(i)._2
        i += 1
      }
    }
    kept
  }

  def add(vec: Array[Float]): Int = {
    val id = vecs.length
    val level = math.min((-math.log(rng.nextDouble()) * levelMult).toInt, 32)
    vecs += vec
    nodeLevel += level
    links += Array.fill(level + 1)(mutable.ArrayBuffer.empty[Int])
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
      val found = searchLayer(vec, cur, efConstruction, l).toSeq
      val cap = if (l == 0) maxM0 else maxM
      val nbrs = selectNeighbors(vec, found, cap)
      links(id)(l) = nbrs
      // bidirectional links with pruning
      var i = 0
      while (i < nbrs.length) {
        val nb = nbrs(i)
        val nbLinks = links(nb)(l)
        nbLinks += id
        if (nbLinks.length > cap) {
          val pruned = selectNeighbors(vecs(nb),
            nbLinks.map(x => (dist(vecs(nb), vecs(x)), x)).toSeq, cap)
          links(nb)(l) = pruned
        }
        i += 1
      }
      cur = if (found.nonEmpty) found.minBy(t => (t._1, t._2))._2 else cur
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
        ls(l).foreach(out.writeInt)
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
      val ls = Array.fill(lvl + 1)(mutable.ArrayBuffer.empty[Int])
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

  /** Top-k (internal id, dist) by squared L2, ascending (dist, id).
    * `allowed` filters results post-walk (reference SearchFilter shape). */
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
    val res = searchLayer(q, cur, effEf, 0).toArray
    val filtered = if (allowed == null) res else res.filter(t => allowed(t._2))
    filtered.map(t => (t._2, t._1)).sortBy(t => (t._2, t._1)).take(k)
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
