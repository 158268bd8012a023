package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    (0L, "fake-jpeg-payload-abc".getBytes),
    (1L, "fake-jpeg-payload-abc".getBytes),  // identical content
    (2L, "other-payload".getBytes),
    (3L, Array.empty[Byte])
  ).toDF("media_id", "bytes")

  test("withFeatures: deterministic fixed-dim features, identical bytes → identical features") {
    val f = Multimodal.withFeatures(media, "media_id", "bytes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(f.values.forall(_.size == Multimodal.FeatureDim))
    assert(f(0L) == f(1L))
    assert(f(0L) != f(2L))
    assert(f.values.flatten.forall(x => x >= -1f && x < 1f))
  }

  test("withFeatures reports payload sizes") {
    val sizes = Multimodal.withFeatures(media, "media_id", "bytes")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes(0L) == 21L && sizes(3L) == 0L)
  }

  test("withFrameSamples emits n rows per item with monotone offsets") {
    val frames = Multimodal.withFrameSamples(media.filter($"media_id" < 3), "media_id", "bytes", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(frames.length == 12)
    frames.groupBy(_._1).values.foreach { fs =>
      val offs = fs.sortBy(_._2).map(_._3)
      assert(offs.zip(offs.tail).forall { case (a, b) => a <= b })
    }
  }

  test("features survive a similarity-search round trip (pipeline plumbing)") {
    val feats = Multimodal.withFeatures(media, "media_id", "bytes")
      .select($"media_id".as("id"), $"features".as("vec"))
    val pairs = graft.operators.Dedup.cosineNearDupPairs(feats, "id", "vec", 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))  // identical payloads are near-dups
  }
}
