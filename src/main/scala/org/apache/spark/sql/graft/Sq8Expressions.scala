package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, QuaternaryExpression, TernaryExpression}
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

/** SQ4 asymmetric quantization (reference X5, pyglass/glass/quant/
  * sq4_quant.hpp + distance.hpp:399-436): per-dimension (min, dif)
  * training like asymmetric SQ8, but codes are 4-bit — two dimensions
  * packed per byte (8× compression), compared by a dequantizing
  * distance against raw query floats. Unused at the reference's runtime
  * but part of its operator surface; here it completes the quantizer
  * family with the same train/encode/distance contract. */
case class Sq4Encode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq4_encode"

  override def nullSafeEval(vec: Any, mins: Any, difs: Any): Any =
    Sq4Encode.encodeAll(vec.asInstanceOf[ArrayData],
      mins.asInstanceOf[ArrayData], difs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, mn, df) =>
      s"${ev.value} = org.apache.spark.sql.graft.Sq4Encode.encodeAll($v, $mn, $df);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object Sq4Encode {
  /** code_d = round(clamp((x_d - min_d)/dif_d, [0,1]) · 15); dims 2j
    * (low nibble) and 2j+1 (high nibble) share byte j. */
  def encodeAll(vec: ArrayData, mins: ArrayData, difs: ArrayData): Array[Byte] = {
    // bound by ALL inputs: sq4_encode is SQL-registered, and an
    // UnsafeArrayData read past difs' element count is an unchecked
    // Platform.getDouble — nondeterministic garbage codes, no exception
    val n = math.min(vec.numElements(),
      math.min(mins.numElements(), difs.numElements()))
    val out = new Array[Byte]((n + 1) / 2)
    var d = 0
    while (d < n) {
      var v = (vec.getFloat(d).toDouble - mins.getDouble(d)) / difs.getDouble(d)
      if (v > 1.0) v = 1.0
      if (v < 0.0) v = 0.0
      val c = math.floor(v * 15.0 + 0.5).toInt
      out(d >> 1) = (out(d >> 1) | (if ((d & 1) == 0) c else c << 4)).toByte
      d += 1
    }
    out
  }
}

/** Dequantizing squared-L2 over packed 4-bit codes: raw query floats vs
  * x̂_d = code_d/15 · dif_d + min_d (float-rounded, then double math —
  * mirrored op-for-op by the DuckDB oracle). */
case class Sq4AsymL2Sq(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), BinaryType, ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq4_asym_l2_sq"

  override def nullSafeEval(q: Any, code: Any, mins: Any, difs: Any): Any =
    Sq4AsymL2Sq.distance(q.asInstanceOf[ArrayData], code.asInstanceOf[Array[Byte]],
      mins.asInstanceOf[ArrayData], difs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c, mn, df) =>
      s"${ev.value} = org.apache.spark.sql.graft.Sq4AsymL2Sq.distance($q, $c, $mn, $df);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, fo: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = fo)
}

object Sq4AsymL2Sq {
  def distance(q: ArrayData, code: Array[Byte], mins: ArrayData, difs: ArrayData): Double = {
    // bound by every input: a short code or difs array from hand-written
    // SQL must not read past its end (AIOOBE on the byte array, silent
    // unchecked read on UnsafeArrayData)
    val n = math.min(math.min(q.numElements(), 2 * code.length),
      math.min(mins.numElements(), difs.numElements()))
    var s = 0.0
    var d = 0
    while (d < n) {
      val nib = if ((d & 1) == 0) code(d >> 1) & 0xF else (code(d >> 1) >> 4) & 0xF
      val xhat = (nib.toDouble / 15.0 * difs.getDouble(d) + mins.getDouble(d)).toFloat
      val diff = q.getFloat(d).toDouble - xhat.toDouble
      s += diff * diff
      d += 1
    }
    s
  }
}

/** Dequantizing squared-L2 over asymmetric SQ8 int codes (reference X4,
  * pyglass/glass/quant/sq8_quant.hpp:30-63 + distance.hpp:268-301): raw
  * query floats vs x̂_d = code_d/255 · dif_d + min_d (float-rounded, then
  * double math — the exact op order of the interpreted
  * `Quantization.asymDequantize`/`l2Sq` chain it replaces, so results
  * stay bit-identical to the DuckDB oracle). Codes are `ARRAY<INT>` in
  * [0, 255] as produced by `Quantization.asymEncode`. */
case class Sq8AsymL2Sq(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(IntegerType), ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_asym_l2_sq"

  override def nullSafeEval(q: Any, code: Any, mins: Any, difs: Any): Any =
    Sq8AsymL2Sq.distance(q.asInstanceOf[ArrayData], code.asInstanceOf[ArrayData],
      mins.asInstanceOf[ArrayData], difs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c, mn, df) =>
      s"${ev.value} = org.apache.spark.sql.graft.Sq8AsymL2Sq.distance($q, $c, $mn, $df);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, fo: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = fo)
}

object Sq8AsymL2Sq {
  def distance(q: ArrayData, code: ArrayData, mins: ArrayData, difs: ArrayData): Double = {
    // bound by every input — same out-of-bounds hole as the SQ4 form
    val n = math.min(math.min(q.numElements(), code.numElements()),
      math.min(mins.numElements(), difs.numElements()))
    var s = 0.0
    var d = 0
    while (d < n) {
      val xhat = (code.getInt(d).toDouble / 255.0 * difs.getDouble(d) + mins.getDouble(d)).toFloat
      val diff = q.getFloat(d).toDouble - xhat.toDouble
      s += diff * diff
      d += 1
    }
    s
  }
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
