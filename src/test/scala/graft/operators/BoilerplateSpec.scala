package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val footer = "copyright acme corp all rights reserved"  // 6 tokens
  private def doc(body: String) = body + " " + footer

  test("segments are non-overlapping width-token windows with positions") {
    val df = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val segs = Boilerplate.segments(df, "doc_id", "text", width = 3)
      .orderBy("pos").as[(Long, Int, String)].collect()
    assert(segs.toSeq == Seq((1L, 0, "a b c"), (1L, 1, "d e f"), (1L, 2, "g h")))
  }

  test("segments repeated across >= minDocs docs are dropped, others kept") {
    val df = Seq(
      (1L, doc("alpha beta gamma delta epsilon zeta")),
      (2L, doc("one two three four five six")),
      (3L, doc("red orange yellow green blue indigo")),
      (4L, "unique words only nothing shared here at all"))
      .toDF("doc_id", "text")
    val out = Boilerplate.removeBoilerplate(df, "doc_id", "text", width = 6, minDocs = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()

    // docs 1-3: 2 segments each (body + footer), footer dropped
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 1L), (4L, 2L, 2L)))

    // kept_md5 = md5 of surviving segments joined in position order
    def m(s: String) = TF.md5Hex(s)
    assert(out(0)._4 == m("alpha beta gamma delta epsilon zeta"))
    assert(out(3)._4 == m("unique words only nothing shared here at all"))
  }

  test("doc whose every segment is boilerplate keeps md5 of empty string") {
    val df = Seq(
      (1L, footer), (2L, footer), (3L, footer))
      .toDF("doc_id", "text")
    val out = Boilerplate.removeBoilerplate(df, "doc_id", "text", width = 6, minDocs = 3)
      .as[(Long, Long, Long, String)].collect()
    assert(out.forall(r => r._2 == 1L && r._3 == 0L && r._4 == TF.md5Hex("")))
  }

  test("redactPii masks emails, ips, phones in order and leaves text intact") {
    val df = Seq(
      (1L, "write to bob.smith+x@mail.co.uk or ping 192.168.0.1 then call 555-0142"),
      (2L, "no pii here just words"))
      .toDF("id", "s")
    val out = df.select(col("id"), TF.redactPii(col("s")).as("r"))
      .orderBy("id").as[(Long, String)].collect()
    assert(out(0)._2 == "write to <email> or ping <ip> then call <phone>")
    assert(out(1)._2 == "no pii here just words")
  }
}
