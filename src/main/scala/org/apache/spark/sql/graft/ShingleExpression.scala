package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object ShingleUtil {
  private val Space = UTF8String.fromString(" ")
  private val Empty: ArrayData = new GenericArrayData(Array.empty[Any])

  /** Space-joined word n-grams of a token array — value-identical to the
    * HOF composition `transform(sequence(1, size-n+1), i -> concat_ws(" ",
    * element_at(toks, i), ..., element_at(toks, i+n-1)))` with the
    * `size >= n` guard (fewer than n tokens, or a null array, yields an
    * empty array; null elements are skipped by the join, concat_ws's
    * contract). One pass, O(len·n) — the HOF form re-evaluates the token
    * subtree per element (Catalyst performs no CSE inside lambda
    * bodies), which is O(len²) per document when the tokens are an
    * inline expression (measured 11× on the gate corpus at n=1). */
  def wordShingles(toks: ArrayData, n: Int): ArrayData = {
    if (toks == null) return Empty
    val len = toks.numElements()
    if (len < n) return Empty
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i < out.length) {
      if (n == 1) {
        val t = toks.getUTF8String(i)
        // concat_ws of a single null = "" (concat_ws skips nulls)
        out(i) = if (t == null) UTF8String.EMPTY_UTF8 else t
      } else {
        val parts = new Array[UTF8String](n)
        var k = 0
        while (k < n) { parts(k) = toks.getUTF8String(i + k); k += 1 }
        out(i) = UTF8String.concatWs(Space, parts: _*)
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native word n-gram shingles of an `ARRAY<STRING>` token column (see
  * [[ShingleUtil.wordShingles]]): one codegen call per row instead of a
  * per-element interpreted lambda over a re-evaluated token subtree.
  * Never null (empty array for null/short inputs — the `when/otherwise`
  * guard of the HOF form folded in). */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"word_shingles: n ($n) must be >= 1")
  override def prettyName: String = "word_shingles"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    ShingleUtil.wordShingles(
      child.eval(input).asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          org.apache.spark.sql.graft.ShingleUtil.wordShingles(
            ${c.isNull} ? null : ${c.value}, $n);
      """, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
