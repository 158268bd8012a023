package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class GopherStatsSpec extends SparkSpec {
  import spark.implicits._

  /** Straight-line reference implementation over java Strings — the
    * split/filter/HOF semantics the kernel must reproduce slot for
    * slot. Code points counted via codePointCount (= Spark length /
    * DuckDB len). */
  private def reference(text: String): Array[Long] = {
    val stop = Set("the", "of", "and", "to", "in", "a", "is", "that")
    val toks = text.split(" ", -1).filter(_.nonEmpty)
    val nWords = toks.length.toLong
    val sumWlen = toks.map(t => t.codePointCount(0, t.length).toLong).sum
    val nAlpha = toks.count(_.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toLong
    val nStop = toks.count(t => stop.contains(t.toLowerCase(java.util.Locale.ROOT))).toLong
    val nHash = text.count(_ == '#').toLong
    // replace() semantics: left-to-right non-overlapping
    val nEll = (text.length - text.replace("...", "").length) / 3 +
      text.count(_ == '…').toLong
    val lines = text.split("\n", -1)
    val nLines = lines.length.toLong
    val nBullet = lines.count(l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• ")).toLong
    val nEllLines = lines.count(l => l.endsWith("...") || l.endsWith("…")).toLong
    Array(nWords, sumWlen, nAlpha, nStop, nHash, nEll, nLines, nBullet, nEllLines)
  }

  private def kernel(text: String): Array[Long] =
    org.apache.spark.sql.graft.GopherStatsUtil
      .gopherStats(UTF8String.fromString(text)).toLongArray()

  test("kernel ≡ reference on crafted edge cases") {
    val cases = Seq(
      "",
      " ",
      "the The THE tHe of  and", // stop case-folding + double space
      "a b c",
      "one\ntwo\nthree\n",       // trailing newline = trailing empty line
      "- bullet one\n* bullet two\n• dot bullet\nplain",
      "ends with dots...\nand unicode…\nneither",
      "....",                    // 4 dots = ONE non-overlapping '...'
      "......",                  // 6 dots = two
      ".......",                 // 7 dots = two
      "#tag ## x#y",
      "word... mid...dle ...lead",
      "…",                  // lone unicode ellipsis (line + symbol)
      "café naïve résumé", // multi-byte letters, no ASCII-alpha miss
      "世界 wide 世界",        // CJK tokens: no alpha, 2 chars each
      "that is in to of and a the", // all 8 stopwords
      "That\nis in\nto",
      "- \n* \n",
      "x".repeat(300) + " " + "y" // long token
    )
    cases.foreach { c =>
      assert(kernel(c).toSeq == reference(c).toSeq, s"mismatch on ${c.take(40)}")
    }
  }

  test("kernel ≡ reference on generated corpora (property sweep)") {
    val rnd = new scala.util.Random(421)
    val atoms = Array("the", "The", "of", "and", "word", "a", "is", "that",
      "x#y", "#", "...", "....", "…", "-", "- ", "*", "•", "café",
      "123", "A", "zzz...", "\n", " ", "  ", "世界", "th", "at")
    (1 to 500).foreach { _ =>
      val n = rnd.nextInt(40)
      val s = Seq.fill(n)(atoms(rnd.nextInt(atoms.length)))
        .mkString(if (rnd.nextBoolean()) " " else "")
      assert(kernel(s).toSeq == reference(s).toSeq, s"mismatch on [$s]")
    }
  }

  test("kernel ≡ the interpreted HOF composition through Spark (the swap's parity)") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and then some",
      "short",
      "UPPER case THE and Of tokens... with # symbols\n- a bullet line\nplain tail…",
      "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val hof = df.select(col("id"),
        filter(split(col("text"), " "), x => x =!= lit("")).as("toks"))
      .select(col("id"),
        size(col("toks")).cast("long").as("n_words"),
        coalesce(aggregate(transform(col("toks"), t => length(t).cast("long")),
          lit(0L), _ + _), lit(0L)).as("sum_wlen"),
        size(filter(col("toks"), t => t.rlike("[a-zA-Z]"))).cast("long").as("n_alpha"),
        size(filter(col("toks"), t => lower(t).isin(
          Seq("the", "of", "and", "to", "in", "a", "is", "that").map(x => x: Any): _*)))
          .cast("long").as("n_stop"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val nat = df.select(col("id"), TextFunctions.gopherStats(col("text")).as("st"))
      .select(col("id"), element_at(col("st"), 1), element_at(col("st"), 2),
        element_at(col("st"), 3), element_at(col("st"), 4))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(nat == hof)
  }

  test("gopher_stats is SQL-registered and codegen-reachable") {
    val got = spark.sql(
      "SELECT gopher_stats('the cat... sat\\n- on the mat') AS st").head().getSeq[Long](0)
    // tokens (split on space): the, cat..., sat\n-, on, the, mat
    assert(got(0) == 6L)   // n_words
    assert(got(3) == 2L)   // n_stop: the, the
    assert(got(5) == 1L)   // one '...' occurrence
    assert(got(6) == 2L)   // two lines
    assert(got(7) == 1L)   // one bullet line ("- on the mat")
  }
}
