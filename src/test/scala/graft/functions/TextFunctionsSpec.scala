package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Guards the JVM↔SQL twin contract: the typed-flatMap fast paths
  * (tokenizeJvm/shinglesJvm/hash28Jvm) must produce exactly what the
  * SQL expressions (and therefore the DuckDB oracle) produce. */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(23)
  private val words = Seq("the", "a", "spark", "query", "row", "data", "join", "scan")
  private def randText(): String = {
    val n = rnd.nextInt(12)
    val toks = Seq.fill(n)(words(rnd.nextInt(words.length)))
    // random extra/leading/trailing spaces
    val sep = if (rnd.nextBoolean()) " " else "  "
    val body = toks.mkString(sep)
    (if (rnd.nextBoolean()) " " else "") + body + (if (rnd.nextBoolean()) " " else "")
  }

  test("tokenizeJvm equals the SQL tokens expression on adversarial whitespace") {
    val texts = Seq.fill(200)(randText()) ++ Seq("", " ", "   ", "a", " a ", "a  b")
    val viaSql = texts.toDF("text")
      .select(col("text"), TextFunctions.tokens(col("text")).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    texts.distinct.foreach { t =>
      assert(TextFunctions.tokenizeJvm(t).toList == viaSql(t), s"text='$t'")
    }
  }

  test("shinglesJvm equals the SQL shingles expression") {
    val texts = Seq.fill(200)(randText())
    val viaSql = texts.toDF("text")
      .select(col("text"),
        TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sh"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    texts.distinct.foreach { t =>
      val jvm = TextFunctions.shinglesJvm(TextFunctions.tokenizeJvm(t), 3).toList
      assert(jvm == viaSql(t), s"text='$t'")
    }
  }

  test("hash28Jvm / md5Hex equal the SQL conv(md5) path") {
    val ss = Seq("abc", "", "the quick fox", "ünïcodé ✓", "a b c")
    val viaSql = ss.toDF("s")
      .select(col("s"), md5(col("s").cast("binary")).as("h"),
        conv(substring(md5(col("s").cast("binary")), 1, 7), 16, 10).cast("long").as("h28"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    ss.foreach { s =>
      assert(TextFunctions.md5Hex(s) == viaSql(s)._1, s"md5 of '$s'")
      assert(TextFunctions.hash28Jvm(s) == viaSql(s)._2, s"hash28 of '$s'")
    }
  }

  test("native hash60 / simhashFromHashes equal the SQL composition they replaced") {
    val ss = Seq("abc", "", "the quick fox", "ünïcodé ✓", "a b c", "w123 w45 m9")
    // original forms, verbatim from before the native-expression swap
    def sqlHash60(c: org.apache.spark.sql.Column, seed: Int) =
      conv(substring(md5(concat(lit(s"$seed:"), c).cast("binary")), 1, 15), 16, 10)
        .cast("long")
    for (bits <- Seq(48, 60)) {
      val rows = ss.toDF("s")
        .select(col("s"),
          TextFunctions.hash60(col("s"), 97).as("native_h"),
          sqlHash60(col("s"), 97).as("sql_h"),
          transform(array_distinct(TextFunctions.tokens(col("s"))),
            t => TextFunctions.hash60(t, 97)).as("hs"))
        .withColumn("native_sh", TextFunctions.simhashFromHashes(col("hs"), bits))
        .withColumn("sql_sh", expr(
          s"""aggregate(
             |  transform(sequence(0, ${bits - 1}), b ->
             |    if(aggregate(hs, 0L,
             |         (a, h) -> a + ((shiftright(h, b) & 1) * 2 - 1)) > 0,
             |       shiftleft(1L, b), 0L)),
             |  0L, (a, x) -> a + x)""".stripMargin))
        .collect()
      rows.foreach { r =>
        assert(r.getLong(1) == r.getLong(2), s"hash60 of '${r.getString(0)}'")
        assert(r.getLong(4) == r.getLong(5), s"simhash($bits) of '${r.getString(0)}'")
      }
    }
  }

  test("text-hash kernels are SQL-callable through GraftExtensions") {
    val r = spark.sql(
      """SELECT md5_hash60('abc', 97) h,
        |       simhash_from_hashes(array(md5_hash60('abc', 97)), 60) sh,
        |       array_eq_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) c""".stripMargin).head
    val expected = Seq(("abc")).toDF("s")
      .select(TextFunctions.hash60(col("s"), 97)).head.getLong(0)
    assert(r.getLong(0) == expected)
    assert(r.getLong(1) == expected) // majority of a single hash = the hash
    assert(r.getInt(2) == 2)
    val r2 = spark.sql(
      """SELECT simhash_blocks(array(md5_hash60('abc', 97)), 120, 6) blk,
        |       block_hamming(array(0L, 15L), array(1L, 15L)) bh""".stripMargin).head
    // majority of a single hash: low 60 fingerprint bits = the hash
    // itself, so the first three 20-bit blocks re-pack to it
    val blk = r2.getSeq[Long](0)
    assert(blk.length == 6)
    assert((blk(0) | (blk(1) << 20) | (blk(2) << 40)) == expected)
    assert(r2.getLong(1) == 1L)
  }

  test("native arrayEqCount equals the zip_with/aggregate composition") {
    val pairs = Seq(
      (Array(1L, 2L, 3L, 4L), Array(1L, 9L, 3L, 4L)),
      (Array(7L, 7L), Array(7L, 7L)),
      (Array(-1L, Long.MaxValue, 0L), Array(-1L, Long.MinValue, 0L)),
      (Array.empty[Long], Array.empty[Long]))
    val rows = pairs.toDF("a", "b")
      .select(
        TextFunctions.arrayEqCount(col("a"), col("b")).as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> if(x = y, 1, 0)), 0, (acc, x) -> acc + x)").as("sql"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("native classifierScoreMilli equals the HOF composition it replaced") {
    val dim = 4096
    val texts = Seq.fill(120)(randText()) ++ Seq("", " ", "one", "the the the")
    val df = texts.toDF("text")
      .withColumn("toks", TextFunctions.tokens(col("text")))
    // the interpreted HOF twin (the scaladoc'd equivalence and the
    // DuckDB oracle's exact shape)
    def wm(t: org.apache.spark.sql.Column) = {
      val idx = pmod(TextFunctions.hash60(t, 131), lit(dim.toLong))
      pmod(TextFunctions.hash60(idx.cast("string"), 137), lit(2001L)) - lit(1000L)
    }
    val got = df.select(
      TextFunctions.classifierScoreMilli(col("toks"), dim).as("native"),
      aggregate(col("toks"), lit(0L), (acc, t) => acc + wm(t)).as("hof"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native ${r.getLong(0)} != hof ${r.getLong(1)}"))
    // a null ELEMENT nulls the sum — the HOF twin's acc + NULL = NULL
    // semantics, not an NPE and not a silently-skipped token
    val withNull = spark.sql(
      "SELECT classifier_milli_sum(array('a', CAST(NULL AS STRING)), 4096)")
      .head
    assert(withNull.isNullAt(0), "null token must null the sum, not crash")
    // SQL-registered and codegen-reachable
    val viaSql = spark.sql(
      "SELECT classifier_milli_sum(array('the', 'a', 'spark'), 4096)")
      .head.getLong(0)
    val viaCol = Seq(Seq("the", "a", "spark")).toDF("toks")
      .select(TextFunctions.classifierScoreMilli(col("toks"), 4096))
      .head.getLong(0)
    assert(viaSql == viaCol)
  }

  test("minhash universal-hash constants are in range and distinct") {
    val as = (0 until 16).map(TextFunctions.minhashA)
    val bs = (0 until 16).map(TextFunctions.minhashB)
    assert(as.forall(a => a > 0 && a < TextFunctions.MinhashP))
    assert(bs.forall(b => b >= 0 && b < TextFunctions.MinhashP))
    assert(as.distinct.size == 16 && bs.distinct.size == 16)
  }
}
