package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.{CosineSimilarity, ExprBridge, InnerProduct, L2SquaredDistance, NearestCentroids, PqAdcSum, PqAdcTable, SrpBits, VectorNorm}

/** Column-level API over the native Catalyst vector expressions in
  * [[org.apache.spark.sql.graft.VectorExpressions]]. */
object VectorFunctions {
  def l2Sq(a: Column, b: Column): Column =
    ExprBridge.column(L2SquaredDistance(ExprBridge.expression(a), ExprBridge.expression(b)))

  /** The engine-canonical squared-L2 for DRIVER-side re-distancing:
    * sequential double accumulation over float components, op-for-op
    * identical to the [[L2SquaredDistance]] expression and
    * `HnswIndex.exactDistTo` (which keep their own loops for their own
    * input layouts — ArrayData codegen and the flat matrix — mirrored
    * by spec). The routed SQL plan's bit-equality contract with the
    * exact plan depends on every copy of this arithmetic staying
    * identical; driver-side call sites share THIS definition. */
  def l2SqJvm(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    s
  }

  /** [[l2SqJvm]] over a Row's Seq view (O(1) apply on the wrapped
    * array — no copy per call). */
  def l2SqJvm(a: Seq[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    s
  }

  def dot(a: Column, b: Column): Column =
    ExprBridge.column(InnerProduct(ExprBridge.expression(a), ExprBridge.expression(b)))

  def cosineSim(a: Column, b: Column): Column =
    ExprBridge.column(CosineSimilarity(ExprBridge.expression(a), ExprBridge.expression(b)))

  def norm2(a: Column): Column =
    ExprBridge.column(VectorNorm(ExprBridge.expression(a)))

  /** Indices of the k nearest centroids; `centroidsFlat` is the
    * row-major nlist·dim matrix (usually a literal). */
  def nearestCentroids(vec: Column, centroidsFlat: Column, k: Column): Column =
    ExprBridge.column(NearestCentroids(ExprBridge.expression(vec),
      ExprBridge.expression(centroidsFlat), ExprBridge.expression(k)))

  /** `m × ksub` PQ asymmetric-distance table for a query vector against
    * a flattened `ksub × dim` codebook literal (one native loop — the
    * composed `l2_sq(slice…)` tree blows the 64 KB codegen method limit
    * at ksub=256). */
  def pqAdcTable(qvec: Column, codebookFlat: Column, m: Column): Column =
    ExprBridge.column(PqAdcTable(ExprBridge.expression(qvec),
      ExprBridge.expression(codebookFlat), ExprBridge.expression(m)))

  /** ADC distance: Σ_j table[j·ksub + codes[j]] in subspace order. */
  def pqAdcSum(codes: Column, table: Column, ksub: Column): Column =
    ExprBridge.column(PqAdcSum(ExprBridge.expression(codes),
      ExprBridge.expression(table), ExprBridge.expression(ksub)))

  /** numPlanes-bit signed-random-projection signature of a float vector
    * (native codegen kernel — see [[org.apache.spark.sql.graft.SrpUtil]]). */
  def srpBits(vec: Column, numPlanes: Int): Column =
    ExprBridge.column(SrpBits(ExprBridge.expression(vec), numPlanes))

  /** Make `l2_sq`, `vec_dot`, `cosine_sim`, `vec_norm`, `pq_adc_table`,
    * `pq_adc_sum`, `srp_bits` usable in SQL text. */
  def register(spark: SparkSession): Unit = {
    ExprBridge.registerFunction(spark, "l2_sq", es => L2SquaredDistance(es(0), es(1)))
    ExprBridge.registerFunction(spark, "vec_dot", es => InnerProduct(es(0), es(1)))
    ExprBridge.registerFunction(spark, "cosine_sim", es => CosineSimilarity(es(0), es(1)))
    ExprBridge.registerFunction(spark, "vec_norm", es => VectorNorm(es(0)))
    ExprBridge.registerFunction(spark, "pq_adc_table", es => PqAdcTable(es(0), es(1), es(2)))
    ExprBridge.registerFunction(spark, "pq_adc_sum", es => PqAdcSum(es(0), es(1), es(2)))
    ExprBridge.registerFunction(spark, "srp_bits", es => SrpBits(es(0), es(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"srp_bits numPlanes must be an integer literal, got $other")
    }))
  }
}
