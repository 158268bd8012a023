package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `org.apache.spark.sql` namespace.
  *
  * Spark 4 made the Column <-> Expression conversions `private[sql]`
  * (columnNodeSupport.scala); an extension library that defines native
  * Catalyst expressions needs them to expose those expressions as
  * user-facing `Column`s. This object is the single place where we
  * reach across that boundary.
  */
object ExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply the function injections of a SparkSessionExtensions setup to
    * an ALREADY-RUNNING session (builder-time `withExtensions` is a
    * no-op once a session exists — getOrCreate returns the live one). */
  def applyExtensionFunctions(
      spark: SparkSession,
      ext: org.apache.spark.sql.SparkSessionExtensions => Unit): Unit = {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext(e)
    e.registerFunctions(spark.sessionState.functionRegistry)
  }

  /** Register a named expression builder in the session's function
    * registry so the function is usable from `spark.sql(...)` text.
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
  }
}
