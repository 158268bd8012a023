package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** SQ8 symmetric scalar quantization, following the reference semantics
  * (pyglass/glass/quant/sq8_sym_quant.hpp:32-74): train α = max |x| over
  * the corpus, encode each component to round(clamp(x/α, ±1) · 127) as a
  * signed byte, compare codes with an integer Σ(a-b)² kernel
  * (pyglass/glass/simd/distance.hpp:329-366). Integer distances make the
  * candidate stage fully deterministic and 4× smaller to scan/shuffle.
  *
  * Rounding is half-away-from-zero to match SQL `round` in both Spark
  * and DuckDB (Java's Math.round is half-up and differs on negatives).
  */
case class Sq8Encode(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType), DoubleType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_encode"

  override def nullSafeEval(vec: Any, alpha: Any): Any = {
    val x = vec.asInstanceOf[ArrayData]
    val a = alpha.asInstanceOf[Double]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = Sq8Encode.encodeOne(x.getFloat(i), a)
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, alpha) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = $vec.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = org.apache.spark.sql.graft.Sq8Encode.encodeOne($vec.getFloat($i), $alpha);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Sq8Encode {
  /** round(clamp(x/α, [-1,1]) · 127), half away from zero. */
  def encodeOne(x: Float, alpha: Double): Byte = {
    var d = x.toDouble / alpha
    if (d > 1.0) d = 1.0
    if (d < -1.0) d = -1.0
    d *= 127.0
    val r = if (d >= 0) math.floor(d + 0.5) else math.ceil(d - 0.5)
    r.toByte
  }
}

/** Σ (a_i - b_i)² over signed-byte codes, 64-bit integer accumulator. */
case class Sq8L2Squared(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_l2_sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var s = 0L
    var i = 0
    while (i < n) {
      val d = x(i) - y(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  int $d = (int) $a[$i] - (int) $b[$i];
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
