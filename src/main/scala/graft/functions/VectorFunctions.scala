package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.{CosineSimilarity, ExprBridge, InnerProduct, L2SquaredDistance, NearestCentroids, VectorNorm}

/** Column-level API over the native Catalyst vector expressions in
  * [[org.apache.spark.sql.graft.VectorExpressions]]. */
object VectorFunctions {
  def l2Sq(a: Column, b: Column): Column =
    ExprBridge.column(L2SquaredDistance(ExprBridge.expression(a), ExprBridge.expression(b)))

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

  /** Make `l2_sq`, `vec_dot`, `cosine_sim`, `vec_norm` usable in SQL text. */
  def register(spark: SparkSession): Unit = {
    ExprBridge.registerFunction(spark, "l2_sq", es => L2SquaredDistance(es(0), es(1)))
    ExprBridge.registerFunction(spark, "vec_dot", es => InnerProduct(es(0), es(1)))
    ExprBridge.registerFunction(spark, "cosine_sim", es => CosineSimilarity(es(0), es(1)))
    ExprBridge.registerFunction(spark, "vec_norm", es => VectorNorm(es(0)))
  }
}
