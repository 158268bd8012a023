package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-merge token counting — the subword half of `token_count`
  * (whitespace and regex pre-tokens approximate a budget; training
  * pipelines budget in BPE tokens).
  *
  * The merge SEMANTICS are one deterministic left-to-right fold per
  * merge rank, chosen for exact cross-engine replay (the DuckDB oracle
  * runs the identical fold as a `list_reduce` lambda): scan the word's
  * symbol sequence once per (left, right) merge, and whenever the
  * accumulator's LAST symbol equals `left` and the incoming symbol
  * equals `right`, fuse them into `left+right`; a fused symbol can
  * immediately fuse again only as the LEFT operand of the same rule
  * (equality re-tested against the new last symbol). Applying the
  * merge table in rank order to a raw word reproduces, by induction,
  * the word's training-time final state — which is what lets the
  * oracle SCORE by joining each word to its trained final state
  * instead of re-implementing the fold per document.
  *
  * Symbols are Java chars (UTF-16 units) on this side and code points
  * on the DuckDB side — identical for the BMP text the corpus
  * contract guarantees (the trainer rejects words containing the
  * U+001F join separator for the same reason). */
object BpeUtil {

  /** Apply one (left, right) merge to a symbol sequence — the shared
    * fold (training iterations and scoring both run exactly this). */
  def applyMerge(symbols: Array[String], left: String, right: String): Array[String] = {
    if (symbols.length < 2) return symbols
    val out = new java.util.ArrayList[String](symbols.length)
    var i = 0
    while (i < symbols.length) {
      val x = symbols(i)
      val n = out.size()
      if (n > 0 && x == right && out.get(n - 1) == left)
        out.set(n - 1, left + right)
      else out.add(x)
      i += 1
    }
    out.toArray(new Array[String](out.size()))
  }

  /** A word's initial symbol sequence: its UTF-16 units as strings. */
  def symbolsOf(word: String): Array[String] = {
    val out = new Array[String](word.length)
    var i = 0
    while (i < word.length) { out(i) = String.valueOf(word.charAt(i)); i += 1 }
    out
  }

  /** BPE token count of one word under the rank-ordered merge table. */
  def countWord(word: String, lefts: Array[String], rights: Array[String]): Int = {
    var symbols = symbolsOf(word)
    var m = 0
    while (m < lefts.length && symbols.length > 1) {
      symbols = applyMerge(symbols, lefts(m), rights(m))
      m += 1
    }
    symbols.length
  }

  /** Whole-document BPE token count: Σ over the engine's canonical
    * pre-tokenization (ONE definition —
    * [[graft.functions.TextFunctions.tokenizeJvm]], the exact
    * `TextFunctions.tokens` split; a hand-rolled twin here would
    * silently diverge the day the canonical split changes) of
    * [[countWord]]. */
  def countDoc(text: UTF8String, lefts: Array[String], rights: Array[String]): Long = {
    val toks = graft.functions.TextFunctions.tokenizeJvm(text.toString)
    var total = 0L
    var i = 0
    while (i < toks.length) {
      total += countWord(toks(i), lefts, rights)
      i += 1
    }
    total
  }
}

/** `bpe_token_count(text)`: whole-document subword count under a
  * trained merge table riding the plan as a reference object (one copy
  * per executor — the [[ClassifierMilliSumWeights]] broadcast-weights
  * shape). Codegen-reachable: the scan stays one WholeStageCodegen
  * pass, the per-word fold runs in a tight JVM loop. */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "bpe_token_count"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  require(merges.length <= (1 << 16),
    s"bpe_token_count: merge table (${merges.length}) must be plan-resident (<= 2^16)")

  @transient private lazy val lefts: Array[String] = merges.map(_._1).toArray
  @transient private lazy val rights: Array[String] = merges.map(_._2).toArray

  override def nullSafeEval(text: Any): Any =
    BpeUtil.countDoc(text.asInstanceOf[UTF8String], lefts, rights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("bpeLefts", lefts, "java.lang.String[]")
    val r = ctx.addReferenceObj("bpeRights", rights, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = org.apache.spark.sql.graft.BpeUtil.countDoc($text, $l, $r);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}
