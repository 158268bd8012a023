package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k heap: keeps the k smallest `(dist, id)` pairs under the
  * total order `(dist asc, id asc)`.
  *
  * Same contract as the reference's `ResultMaxHeap` (utils.h:35-78) and
  * `maxPQIFCS` (bruteforce.h:51-117): a size-k max-heap where a new
  * element replaces the root iff it is better. The id tiebreak makes
  * results deterministic under distance ties.
  */
final class TopKHeap(val k: Int) extends Serializable {
  private var n = 0
  private val ds = new Array[Double](math.max(k, 1))
  private val is = new Array[Long](math.max(k, 1))

  def size: Int = n

  // (d1,i1) orders strictly after (d2,i2) — i.e. is "worse"
  @inline private def worse(d1: Double, i1: Long, d2: Double, i2: Long): Boolean =
    d1 > d2 || (d1 == d2 && i1 > i2)

  def insert(d: Double, id: Long): Unit = {
    if (k == 0) return
    if (n < k) {
      var i = n
      ds(i) = d; is(i) = id
      n += 1
      // sift up
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(ds(i), is(i), ds(p), is(p))) {
          val td = ds(i); ds(i) = ds(p); ds(p) = td
          val ti = is(i); is(i) = is(p); is(p) = ti
          i = p
        } else i = 0
      }
    } else if (worse(ds(0), is(0), d, id)) {
      ds(0) = d; is(0) = id
      // sift down
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < n && worse(ds(l), is(l), ds(m), is(m))) m = l
        if (r < n && worse(ds(r), is(r), ds(m), is(m))) m = r
        if (m == i) done = true
        else {
          val td = ds(i); ds(i) = ds(m); ds(m) = td
          val ti = is(i); is(i) = is(m); is(m) = ti
          i = m
        }
      }
    }
  }

  def mergeFrom(o: TopKHeap): Unit = {
    var i = 0
    while (i < o.n) { insert(o.ds(i), o.is(i)); i += 1 }
  }

  /** (dist, id) pairs sorted ascending by (dist, id). */
  def sortedPairs: Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](n)
    var i = 0
    while (i < n) { out(i) = (ds(i), is(i)); i += 1 }
    scala.util.Sorting.stableSort(out, (a: (Double, Long), b: (Double, Long)) =>
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2))
    out
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(ds(i)); bb.putLong(is(i)); i += 1 }
    bb.array()
  }
}

object TopKHeap {
  def deserialize(k: Int, bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) {
      val d = bb.getDouble; val id = bb.getLong
      h.insert(d, id)
      i += 1
    }
    h
  }
}

/** `topk_ids(dist, id, k)` aggregate: array of the k ids with smallest
  * `(dist, id)`, ascending. A `TypedImperativeAggregate`, so Spark runs
  * it with map-side partial aggregation — each input partition reduces
  * to at most k entries before any shuffle, exactly the property that
  * makes a 10⁶-query × 10⁷-row top-k join feasible at scale (vs. a
  * Window, which shuffles and sorts the entire joined relation).
  */
case class TopKIdsAgg(
    dist: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(dist, id)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "topk_ids"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val d = dist.eval(input)
    val i = id.eval(input)
    if (d != null && i != null) {
      buf.insert(d.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: TopKHeap): Any =
    new GenericArrayData(buf.sortedPairs.map(_._2))

  override def serialize(buf: TopKHeap): Array[Byte] = buf.serialize()

  override def deserialize(storage: Array[Byte]): TopKHeap =
    TopKHeap.deserialize(k, storage)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKIdsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKIdsAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(dist = newChildren(0), id = newChildren(1))
}

/** `topk_pairs(dist, id, k)`: [[TopKIdsAgg]]'s heap, but the eval keeps
  * the distances — array of `struct<dist, id>` sorted ascending by
  * `(dist, id)`. The dist-carrying form exists for TWO-LEVEL top-k
  * merges (list-major IVF batches): each partial scope reduces to its
  * own k best pairs map-side, and a later global `topk_ids` over the
  * exploded pairs merges scopes exactly — the id-only form would drop
  * the key the outer merge orders by. */
case class TopKPairsAgg(
    dist: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(dist, id)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("dist", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val d = dist.eval(input)
    val i = id.eval(input)
    if (d != null && i != null) {
      buf.insert(d.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: TopKHeap): Any =
    new GenericArrayData(buf.sortedPairs.map { case (d, i) =>
      InternalRow(d, i)
    })

  override def serialize(buf: TopKHeap): Array[Byte] = buf.serialize()

  override def deserialize(storage: Array[Byte]): TopKHeap =
    TopKHeap.deserialize(k, storage)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(dist = newChildren(0), id = newChildren(1))
}

