package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Gopher-rule statistics kernel.
  *
  * The corpus quality filter (Rae et al. 2021 §A1.1) is a primary
  * 100-TB scan, and its original form ran the per-token rule arithmetic
  * in Catalyst's interpreted higher-order-function evaluator —
  * `aggregate`/`transform`/`filter` lambdas are excluded from
  * whole-stage codegen (the audited-plan finding in PLANS.md; the same
  * pattern's native rewrite bought 32× on the SimHash fingerprint path
  * in round 7). This expression computes EVERY per-document statistic
  * the rule bundle needs in tight byte loops over the UTF-8 payload,
  * reachable from whole-stage codegen, with value-for-value parity to
  * the SQL compositions (property-asserted in GopherStatsSpec; the
  * DuckDB oracle mirrors are unchanged).
  *
  * Output: `ARRAY<BIGINT>` of 9 slots (see [[GopherStatsUtil]] slot
  * constants):
  *
  *   0 n_words          tokens of `split(text, ' ')` with empties removed
  *   1 sum_wlen         Σ code-point lengths of those tokens
  *   2 n_alpha_words    tokens containing an ASCII letter (rlike "[a-zA-Z]")
  *   3 n_stop           tokens ASCII-case-folding to one of the 8 Gopher
  *                      stopwords (the, of, and, to, in, a, is, that)
  *   4 n_hash           '#' characters
  *   5 n_ellipsis       non-overlapping "..." occurrences (replace()
  *                      semantics) + '…' (U+2026) occurrences
  *   6 n_lines          `split(text, '\n')` length = newline count + 1
  *   7 n_bullet_lines   lines starting with "- ", "* ", or "• " (U+2022)
  *   8 n_ellipsis_lines lines ending with "..." or '…'
  */
object GopherStatsUtil {
  val Slots = 9
  val NWords = 0; val SumWlen = 1; val NAlphaWords = 2; val NStop = 3
  val NHash = 4; val NEllipsis = 5; val NLines = 6; val NBulletLines = 7
  val NEllipsisLines = 8

  /** The Gopher stopword list, lowercase ASCII, longest is 4 bytes. */
  private val StopWords: Array[Array[Byte]] =
    Array("the", "of", "and", "to", "in", "a", "is", "that")
      .map(_.getBytes("US-ASCII"))

  private def toLowerAscii(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  def gopherStats(s: UTF8String): ArrayData = {
    val n = s.numBytes()
    val out = new Array[Long](Slots)
    // token state
    var tokChars = 0L      // code points in the current token
    var tokBytes = 0       // bytes in the current token
    var tokHasAlpha = false
    val stopBuf = new Array[Byte](4) // ASCII-lowered first 4 bytes
    // line state
    var lineStart = 0
    var newlines = 0L
    // "..." non-overlap state: bytes still owned by a counted match
    var dotSkip = 0

    def endToken(): Unit = {
      if (tokBytes > 0) {
        out(NWords) += 1
        out(SumWlen) += tokChars
        if (tokHasAlpha) out(NAlphaWords) += 1
        if (tokBytes <= 4) {
          var w = 0
          while (w < StopWords.length) {
            val sw = StopWords(w)
            if (sw.length == tokBytes) {
              var j = 0
              while (j < tokBytes && stopBuf(j) == sw(j)) j += 1
              if (j == tokBytes) { out(NStop) += 1; w = StopWords.length }
              else w += 1
            } else w += 1
          }
        }
      }
      tokChars = 0L; tokBytes = 0; tokHasAlpha = false
    }

    def endLine(ls: Int, le: Int): Unit = {
      val len = le - ls
      if (len >= 2 &&
          ((s.getByte(ls) == '-' || s.getByte(ls) == '*') && s.getByte(ls + 1) == ' '))
        out(NBulletLines) += 1
      else if (len >= 4 && (s.getByte(ls) & 0xff) == 0xe2 &&
          (s.getByte(ls + 1) & 0xff) == 0x80 && (s.getByte(ls + 2) & 0xff) == 0xa2 &&
          s.getByte(ls + 3) == ' ')
        out(NBulletLines) += 1
      if (len >= 3) {
        val a = s.getByte(le - 3); val b = s.getByte(le - 2); val c = s.getByte(le - 1)
        if ((a == '.' && b == '.' && c == '.') ||
            ((a & 0xff) == 0xe2 && (b & 0xff) == 0x80 && (c & 0xff) == 0xa6))
          out(NEllipsisLines) += 1
      }
    }

    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b == ' ') endToken()
      else {
        if ((b & 0xc0) != 0x80) tokChars += 1 // leading byte of a code point
        if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) tokHasAlpha = true
        if (tokBytes < 4) stopBuf(tokBytes) = toLowerAscii(b)
        tokBytes += 1
      }
      if (b == '\n') { newlines += 1; endLine(lineStart, i); lineStart = i + 1 }
      if (b == '#') out(NHash) += 1
      if (b == '.') {
        if (dotSkip > 0) dotSkip -= 1
        else if (i + 2 < n && s.getByte(i + 1) == '.' && s.getByte(i + 2) == '.') {
          out(NEllipsis) += 1; dotSkip = 2
        }
      } else dotSkip = 0
      if ((b & 0xff) == 0xe2 && i + 2 < n &&
          (s.getByte(i + 1) & 0xff) == 0x80 && (s.getByte(i + 2) & 0xff) == 0xa6)
        out(NEllipsis) += 1
      i += 1
    }
    endToken()
    endLine(lineStart, n)
    out(NLines) = newlines + 1
    new GenericArrayData(out)
  }
}

/** Per-document Gopher-rule statistics as a 9-slot `ARRAY<BIGINT>`
  * (see [[GopherStatsUtil]]). */
case class GopherStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "gopher_stats"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    GopherStatsUtil.gopherStats(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.GopherStatsUtil.gopherStats($s);")

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}
