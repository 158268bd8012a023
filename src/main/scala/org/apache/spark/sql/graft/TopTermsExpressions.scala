package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k buffer over `(tf desc, df asc, token asc)` — the
  * tf-idf ranking order. Entries are kept SORTED best-first in plain
  * arrays (k is user-facing top-terms-per-doc, single digits; an O(k)
  * shifting insert beats heap bookkeeping at that size), so eval is a
  * straight copy-out with ranks = positions.
  *
  * The token comparison is UTF8String.compareTo — binary/unsigned byte
  * order, exactly the order Spark's SortOrder gives a StringType
  * (and DuckDB's default collation), so replacing a
  * `row_number() OVER (ORDER BY tf DESC, df ASC, token)` window with
  * this aggregate is rank-identical.
  */
final class TopTermsBuf(val k: Int) extends Serializable {
  private var n = 0
  private val tfs = new Array[Long](math.max(k, 1))
  private val dfs = new Array[Long](math.max(k, 1))
  private val toks = new Array[UTF8String](math.max(k, 1))

  def size: Int = n

  // (tf1,df1,t1) orders strictly after (tf2,df2,t2) in the ranking
  @inline private def worse(tf1: Long, df1: Long, t1: UTF8String,
      tf2: Long, df2: Long, t2: UTF8String): Boolean =
    tf1 < tf2 || (tf1 == tf2 && (df1 > df2 ||
      (df1 == df2 && t1.compareTo(t2) > 0)))

  /** Insert; caller must pass an OWNED UTF8String (clone any buffer-
    * backed value before calling — the bytes are retained). */
  def insert(tf: Long, df: Long, tok: UTF8String): Unit = {
    if (k == 0) return
    if (n == k && worse(tf, df, tok, tfs(n - 1), dfs(n - 1), toks(n - 1))) return
    var i = if (n < k) n else n - 1 // position being vacated
    while (i > 0 && worse(tfs(i - 1), dfs(i - 1), toks(i - 1), tf, df, tok)) {
      tfs(i) = tfs(i - 1); dfs(i) = dfs(i - 1); toks(i) = toks(i - 1)
      i -= 1
    }
    tfs(i) = tf; dfs(i) = df; toks(i) = tok
    if (n < k) n += 1
  }

  def mergeFrom(o: TopTermsBuf): Unit = {
    var i = 0
    while (i < o.n) { insert(o.tfs(i), o.dfs(i), o.toks(i)); i += 1 }
  }

  /** Rows best-first: struct<tf, df, token> at rank = index + 1. */
  def toArrayData: GenericArrayData = {
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = InternalRow(tfs(i), dfs(i), toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  def serialize(): Array[Byte] = {
    var bytes = 4
    var i = 0
    while (i < n) { bytes += 20 + toks(i).numBytes(); i += 1 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(n)
    i = 0
    while (i < n) {
      bb.putLong(tfs(i)); bb.putLong(dfs(i))
      val tb = toks(i).getBytes
      bb.putInt(tb.length); bb.put(tb)
      i += 1
    }
    bb.array()
  }
}

object TopTermsBuf {
  def deserialize(k: Int, bytes: Array[Byte]): TopTermsBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopTermsBuf(k)
    var i = 0
    while (i < n) {
      val tf = bb.getLong; val df = bb.getLong
      val len = bb.getInt
      val tb = new Array[Byte](len)
      bb.get(tb)
      b.insert(tf, df, UTF8String.fromBytes(tb))
      i += 1
    }
    b
  }
}

/** `top_terms(tf, df, token, k)` aggregate: array of the k best
  * `struct<tf, df, token>` rows under `(tf desc, df asc, token asc)`,
  * best-first. A `TypedImperativeAggregate`, so Spark runs it with
  * map-side partial aggregation — each partition reduces to at most k
  * entries per group before the shuffle, replacing the full
  * partition-sort a rank-filter Window pays over the whole (doc,
  * token) relation (guide §2.3/§2.4: aggregate before you shuffle; no
  * Window re-sort of data already grouped by the aggregation key). */
case class TopTermsAgg(
    tf: Expression,
    df: Expression,
    token: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopTermsBuf] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(tf, df, token)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType, StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("tf", LongType, nullable = false),
      StructField("df", LongType, nullable = false),
      StructField("token", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_terms"

  override def createAggregationBuffer(): TopTermsBuf = new TopTermsBuf(k)

  override def update(buf: TopTermsBuf, input: InternalRow): TopTermsBuf = {
    val t = tf.eval(input)
    val d = df.eval(input)
    val s = token.eval(input)
    if (t != null && d != null && s != null) {
      // clone: the UTF8String may be backed by a reused row buffer,
      // and the buffer retains it across input rows
      buf.insert(t.asInstanceOf[Long], d.asInstanceOf[Long],
        s.asInstanceOf[UTF8String].clone())
    }
    buf
  }

  override def merge(buf: TopTermsBuf, other: TopTermsBuf): TopTermsBuf = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: TopTermsBuf): Any = buf.toArrayData

  override def serialize(buf: TopTermsBuf): Array[Byte] = buf.serialize()

  override def deserialize(storage: Array[Byte]): TopTermsBuf =
    TopTermsBuf.deserialize(k, storage)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopTermsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopTermsAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(tf = newChildren(0), df = newChildren(1), token = newChildren(2))
}
