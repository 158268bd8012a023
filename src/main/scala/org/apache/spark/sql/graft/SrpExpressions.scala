package org.apache.spark.sql.graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native signed-random-projection signature kernel.
  *
  * Replaces the typed `Dataset.map` signature passes of the SRP-LSH
  * pipelines (`sim_lsh_topk` / `neardup_lsh_pairs`): a typed map
  * deserializes every whole row of the base table per call, which at
  * 100 TB is the pipeline's bottleneck — the same pattern the SimHash
  * path fixed with [[TextHashExpressions]]. Values are IDENTICAL to
  * `SimilaritySearch.srpBits` over `hashPlanes` (sequential double dot
  * per plane, md5-derived plane components), so the DuckDB oracle
  * mirrors are unchanged.
  */
object SrpUtil {

  // Plane tables are deterministic in (numPlanes, dim): built once per
  // JVM (per executor) on first use and shared across tasks — no
  // driver-side dim probe, no broadcast, no per-task rebuild. A handful
  // of (numPlanes, dim) combos ever exist, each ≤ 60·dim doubles.
  private val planeCache = new ConcurrentHashMap[Long, Array[Double]]

  /** Row-major numPlanes·dim plane matrix; component (j, d) =
    * `hash60("plane_j_d") / 2^59 - 1.0` ∈ [-1, 1) — the exact
    * `SimilaritySearch.hashPlanes` formula the oracles replay. */
  def planesFor(numPlanes: Int, dim: Int): Array[Double] = {
    val key = (numPlanes.toLong << 32) | (dim & 0xffffffffL)
    var p = planeCache.get(key)
    if (p == null) {
      p = new Array[Double](numPlanes * dim)
      var j = 0
      while (j < numPlanes) {
        var d = 0
        while (d < dim) {
          p(j * dim + d) =
            graft.functions.TextFunctions.hash60Jvm(s"plane_${j}_${d}").toDouble /
              576460752303423488.0 - 1.0
          d += 1
        }
        j += 1
      }
      val race = planeCache.putIfAbsent(key, p)
      if (race != null) p = race
    }
    p
  }

  /** Signature bits: bit j = (v · plane_j) > 0, the dot accumulated
    * SEQUENTIALLY in double — bit-identical to the oracle's `list_sum`
    * mirror. The plane table is sized to THIS row's dimension, so mixed
    * dims each get their own (deterministic) table. */
  def srpBits(v: ArrayData, numPlanes: Int): Long = {
    val dim = v.numElements()
    val planes = planesFor(numPlanes, dim)
    var s = 0L
    var j = 0
    while (j < numPlanes) {
      val off = j * dim
      var dot = 0.0
      var d = 0
      while (d < dim) { dot += v.getFloat(d).toDouble * planes(off + d); d += 1 }
      if (dot > 0) s |= 1L << j
      j += 1
    }
    s
  }
}

/** `srp_bits(vec)` — numPlanes-bit SRP signature of a float vector
  * (see [[SrpUtil.srpBits]]). */
case class SrpBits(child: Expression, numPlanes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numPlanes > 0 && numPlanes <= 60, "signature must fit a long")
  override def prettyName: String = "srp_bits"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    SrpUtil.srpBits(v.asInstanceOf[ArrayData], numPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.graft.SrpUtil.srpBits($v, $numPlanes);")

  override protected def withNewChildInternal(newChild: Expression): SrpBits =
    copy(child = newChild)
}
