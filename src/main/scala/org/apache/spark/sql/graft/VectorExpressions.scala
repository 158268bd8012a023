package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Distance kernels over `ARRAY<FLOAT>` embedding columns.
  *
  * Semantics follow the reference's scalar kernels:
  *   - squared L2: `L2SqrRef`, pyglass/glass/simd/distance.hpp:165-173
  *   - inner product: `IPRef`, pyglass/glass/simd/distance.hpp:175-183
  *
  * Implemented as native Catalyst expressions with whole-stage codegen —
  * the Spark analog of the reference's SIMD kernels (the JIT
  * autovectorizes the generated tight loop; accumulation is in double
  * for deterministic, order-stable results).
  */
abstract class FloatVecBinaryExpression extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
}

/** Σ (a_i - b_i)^2 with double accumulation. */
case class L2SquaredDistance(left: Expression, right: Expression)
    extends FloatVecBinaryExpression {
  override def prettyName: String = "l2_sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
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
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ a_i * b_i with double accumulation. */
case class InnerProduct(left: Expression, right: Expression)
    extends FloatVecBinaryExpression {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot(a,b) / (||a|| * ||b||); 0.0 when either norm is 0. Single pass. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends FloatVecBinaryExpression {
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ||a||_2 (double). */
case class VectorNorm(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}


/** Indices of the `k` nearest centroids (squared L2, ties by index
  * ascending) for a vector against a flattened centroid matrix literal
  * (`nlist · dim` floats, row-major). One expression replaces the
  * nlist-way literal-struct trees an expression-composed IVF quantizer
  * would need — O(nlist) codegen size instead of O(nlist · dim), and a
  * tight primitive loop at runtime. Used by
  * [[graft.operators.SimilaritySearch.ivfKnn]] for both the base-side
  * list assignment (k = 1) and the query-side probes (k = nprobe). */
case class NearestCentroids(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType), IntegerType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroids"

  override def nullSafeEval(vec: Any, cents: Any, k: Any): Any =
    NearestCentroids.topk(vec.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c, k) =>
      s"${ev.value} = org.apache.spark.sql.graft.NearestCentroids.topk($v, $c, $k);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Per-query PQ asymmetric-distance table: entry `j·ksub + c` is the
  * squared L2 between the j-th subspace slice of `qvec` and the j-th
  * slice of centroid `c` in the flattened `ksub × dim` codebook.
  *
  * One expression replaces the `m·ksub`-way tree of
  * `l2_sq(slice(qvec,…), literal)` subexpressions a composed table
  * would need. That tree is not a style nit: at the PQ operating point
  * (m=4, ksub=256) the composed form generates > 64 KB of Java in one
  * method, Janino refuses it ("Code grows beyond 64 KB"), and the whole
  * query-side stage silently drops out of whole-stage codegen into
  * interpreted evaluation (measured: the 2M-row PQ probe crawled for
  * 35 min before dying). The arithmetic here is bit-identical to the
  * composed form — sequential double accumulation, ascending index —
  * so the `pq_adc_knn` oracle hash is unchanged. */
case class PqAdcTable(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType), IntegerType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_table"

  override def nullSafeEval(qvec: Any, cents: Any, m: Any): Any =
    PqAdc.table(qvec.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData],
      m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c, m) =>
      s"${ev.value} = org.apache.spark.sql.graft.PqAdc.table($q, $c, $m);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** ADC distance of one code row against a query's PQ table:
  * `Σ_j table[j·ksub + codes[j]]`, summed in ascending subspace order
  * (the same left-associated order as the composed
  * `element_at(...) + element_at(...)` chain it replaces — IEEE-double
  * equal, so oracle hashes are stable). This is the hot inner loop of
  * the ADC scan (runs once per query × base-code pair); one static call
  * keeps the pair stage inside whole-stage codegen at any `m`. */
case class PqAdcSum(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(DoubleType), IntegerType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_sum"

  override def nullSafeEval(codes: Any, table: Any, ksub: Any): Any =
    PqAdc.sum(codes.asInstanceOf[ArrayData], table.asInstanceOf[ArrayData],
      ksub.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cd, t, k) =>
      s"${ev.value} = org.apache.spark.sql.graft.PqAdc.sum($cd, $t, $k);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object PqAdc {
  /** `m × ksub` table, row-major by subspace. `cents` is the flattened
    * `ksub × dim` codebook (row-major full vectors, the same layout the
    * seed pick collects); `ksub` is derived as `cents.length / dim` and
    * the subspace width as `dim / m`. */
  def table(qvec: ArrayData, cents: ArrayData, m: Int): ArrayData = {
    val dim = qvec.numElements()
    val ksub = if (dim == 0) 0 else cents.numElements() / dim
    val sub = if (m == 0) 0 else dim / m
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val qoff = j * sub
      var c = 0
      while (c < ksub) {
        val coff = c * dim + qoff
        var s = 0.0
        var i = 0
        while (i < sub) {
          val d = qvec.getFloat(qoff + i).toDouble - cents.getFloat(coff + i).toDouble
          s += d * d
          i += 1
        }
        out(j * ksub + c) = s
        c += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def sum(codes: ArrayData, table: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    var s = 0.0
    var j = 0
    while (j < m) {
      s += table.getDouble(j * ksub + codes.getInt(j))
      j += 1
    }
    s
  }
}

object NearestCentroids {
  /** Row-path form: reads the centroid ArrayData IN PLACE — this runs
    * once per base row during writeIvf's list assignment and once per
    * query row on the probe route, so copying the flattened table
    * (nlist×dim floats, ~1 MB at lifecycle scale) per evaluation would
    * be pure allocation churn. Must stay value-identical to
    * [[topkArr]] (same distance accumulation order, same
    * (dist, index)-ascending selection) — the nprobe tuner's
    * driver-side routing relies on the twins never diverging
    * (NprobeTunerEquivalenceSpec pins it transitively). */
  def topk(vec: ArrayData, cents: ArrayData, k: Int): ArrayData = {
    val dim = vec.numElements()
    val n = if (dim == 0) 0 else cents.numElements() / dim
    val q = new Array[Float](dim)
    var d = 0
    while (d < dim) { q(d) = vec.getFloat(d); d += 1 }
    val dist = new Array[Double](n)
    var c = 0
    while (c < n) {
      var s = 0.0
      var i = 0
      val off = c * dim
      while (i < dim) {
        val df = q(i).toDouble - cents.getFloat(off + i).toDouble
        s += df * df
        i += 1
      }
      dist(c) = s
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(selectK(dist, k))
  }

  /** The same (dist, index)-ascending selection on plain arrays — the
    * driver-side routing twin (nprobe tuner): float-identical to the
    * expression route (same accumulation, same [[selectK]]), so a probe
    * SET derived here can never diverge from one the
    * [[NearestCentroids]] expression would select. */
  def topkArr(q: Array[Float], centsFlat: Array[Float], k: Int): Array[Int] = {
    val dim = q.length
    val n = if (dim == 0) 0 else centsFlat.length / dim
    val dist = new Array[Double](n)
    var c = 0
    while (c < n) {
      var s = 0.0
      var i = 0
      val off = c * dim
      while (i < dim) {
        val df = q(i).toDouble - centsFlat(off + i).toDouble
        s += df * df
        i += 1
      }
      dist(c) = s
      c += 1
    }
    selectK(dist, k)
  }

  /** ONE definition of the tie-break: kk smallest by (dist, index)
    * ascending — shared by the row path and the driver twin so the
    * selection rule cannot drift between them. */
  private def selectK(dist: Array[Double], k: Int): Array[Int] = {
    val n = dist.length
    val kk = math.min(math.max(k, 0), n)
    val idx = Array.range(0, n)
    // selection of kk smallest by (dist, index) — nlist is small
    var sel = 0
    while (sel < kk) {
      var best = sel
      var j = sel + 1
      while (j < n) {
        if (dist(idx(j)) < dist(idx(best)) ||
          (dist(idx(j)) == dist(idx(best)) && idx(j) < idx(best))) best = j
        j += 1
      }
      val t = idx(sel); idx(sel) = idx(best); idx(best) = t
      sel += 1
    }
    java.util.Arrays.copyOfRange(idx, 0, kk)
  }
}
