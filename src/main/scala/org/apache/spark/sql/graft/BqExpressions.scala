package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 1-bit binary quantization: the extreme end of the quantizer ladder
  * (SQ8 sym/asym → SQ4 → PQ → 1-bit). Each dimension keeps only its
  * sign — bit d = x_d > 0 — giving 32× compression over fp32 and a
  * Hamming-distance candidate scan that is pure integer popcount (no
  * floating point anywhere in stage 1, so candidate ranking is exactly
  * reproducible by any engine). This is the sign-random-projection LSH
  * bound applied at identity projection: for unit vectors,
  * P[bit differs] = angle/π, so Hamming distance is a monotone estimate
  * of angular distance and an exact fp32 re-rank of the top candidates
  * recovers kNN quality (same two-stage shape as the reference's SQ8
  * refine path, hybrid_graph.cpp:206-229/465-494 — only the code domain
  * changes).
  *
  * Threshold is a strict `> 0` per component (zero quantizes to bit 0),
  * mirrored verbatim by the DuckDB oracle's `(x > 0) <> (y > 0)`
  * comparison — float-vs-zero compares carry no rounding subtleties.
  */
case class BqEncode(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bq_encode"

  override def nullSafeEval(vec: Any): Any =
    BqEncode.encode(vec.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.graft.BqEncode.encode($v);")

  override protected def withNewChildInternal(newChild: Expression): BqEncode =
    copy(child = newChild)
}

object BqEncode {
  /** Sign bits packed little-endian: dimension d lives in byte d>>3,
    * bit d&7. Tail bits of the last byte stay 0 on both sides of a
    * Hamming compare, so unequal-dim inputs simply never match there. */
  def encode(vec: ArrayData): Array[Byte] = {
    val n = vec.numElements()
    val out = new Array[Byte]((n + 7) >> 3)
    var d = 0
    while (d < n) {
      if (vec.getFloat(d) > 0f) out(d >> 3) = (out(d >> 3) | (1 << (d & 7))).toByte
      d += 1
    }
    out
  }
}

/** `bq_hamming(a, b)` — popcount of the XOR of two packed sign-bit
  * codes; the stage-1 candidate metric for binary-quantized kNN. */
case class BqHamming(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bq_hamming"

  override def nullSafeEval(a: Any, b: Any): Any =
    BqHamming.hamming(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.BqHamming.hamming($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BqHamming {
  /** XOR-popcount over the common prefix, 8 bytes at a time; length
    * mismatch contributes each unpaired byte's own popcount (a code vs
    * an implicit all-zeros pad — keeps the metric total and symmetric
    * rather than silently truncating). */
  def hamming(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var h = 0
    var i = 0
    while (i + 8 <= n) {
      var x = 0L
      var j = 0
      while (j < 8) { x |= ((a(i + j) ^ b(i + j)) & 0xFFL) << (j << 3); j += 1 }
      h += java.lang.Long.bitCount(x)
      i += 8
    }
    while (i < n) { h += Integer.bitCount((a(i) ^ b(i)) & 0xFF); i += 1 }
    val longer = if (a.length >= b.length) a else b
    while (i < longer.length) { h += Integer.bitCount(longer(i) & 0xFF); i += 1 }
    h
  }
}
