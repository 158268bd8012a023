package org.apache.spark.sql.graft

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary: at most `capacity` counters,
  * every counter an UNDERCOUNT of its item's true frequency by at most
  * N/(capacity+1) (N = stream length). The mergeable-summaries form
  * (Agarwal/Cormode/Huang/Phillips/Wei/Yi, PODS 2012): two summaries
  * merge by pointwise count addition followed by subtracting the
  * (capacity+1)-largest count from everything and dropping the
  * non-positives — the bound stays N_total/(capacity+1) after any merge
  * tree, which is exactly what a map-side-partial Spark aggregation
  * needs. Consequence used by the heavy-hitter operator: any item with
  * true count > N/(capacity+1) is GUARANTEED present in the final
  * summary, so a sketch pass + exact recount of the ≤ capacity
  * candidates computes "all items above the threshold" exactly — no
  * full-domain shuffle, deterministic output, SQL-replayable.
  */
final class MgSummary(val capacity: Int) extends Serializable {
  val counts = new java.util.HashMap[String, Long](capacity * 2)

  def add(item: String): Unit = {
    val cur = counts.get(item)
    if (cur != 0L) counts.put(item, cur + 1L)
    else if (counts.size < capacity) counts.put(item, 1L)
    else {
      // full and item absent: decrement all counters, drop zeros —
      // the classic MG step (amortized O(1): each decrement pass is
      // paid for by the capacity inserts that preceded it)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue - 1L
        if (c == 0L) it.remove() else e.setValue(c)
      }
    }
  }

  /** Mergeable-summaries merge: pointwise add, then trim back to
    * `capacity` by subtracting the (capacity+1)-largest count. */
  def mergeFrom(o: MgSummary): Unit = {
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, cur + e.getValue)
    }
    if (counts.size > capacity) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vi = counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      // subtract the (capacity+1)-th largest => at most capacity survive
      val cut = vals(vals.length - capacity - 1)
      val ei = counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        val c = e.getValue - cut
        if (c <= 0L) ei.remove() else e.setValue(c)
      }
    }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(counts.size)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }
}

object MgSummary {
  def deserialize(capacity: Int, bytes: Array[Byte]): MgSummary = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val s = new MgSummary(capacity)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      s.counts.put(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    s
  }
}

/** `mg_candidates(item, capacity)` aggregate: the Misra–Gries candidate
  * set (array of strings, sorted for determinism) — every item whose
  * true frequency exceeds N/(capacity+1) is guaranteed included.
  * Runs with map-side partial aggregation: each input partition reduces
  * to ≤ capacity counters before the (single-row) shuffle, so the
  * exchange is capacity-bounded however large the scanned domain.
  */
case class MgCandidatesAgg(
    item: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSummary] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(item)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "mg_candidates"

  override def createAggregationBuffer(): MgSummary = new MgSummary(capacity)

  override def update(buf: MgSummary, input: InternalRow): MgSummary = {
    val v = item.eval(input)
    // UTF8String may alias a reused scan buffer — materialize to String
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MgSummary, other: MgSummary): MgSummary = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: MgSummary): Any = {
    val keys = buf.counts.keySet().toArray(new Array[String](buf.counts.size))
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(UTF8String.fromString(_)))
  }

  override def serialize(buf: MgSummary): Array[Byte] = buf.serialize()

  override def deserialize(storage: Array[Byte]): MgSummary =
    MgSummary.deserialize(capacity, storage)

  override def withNewMutableAggBufferOffset(newOffset: Int): MgCandidatesAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MgCandidatesAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0))
}
