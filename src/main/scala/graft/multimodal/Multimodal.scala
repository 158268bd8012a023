package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media as opaque `BINARY` columns + typed metadata, with
  * decode / feature-extraction / frame-sampling run batch-wise inside
  * `mapPartitions` (the JVM analog of `mapInPandas` batching: one codec
  * init per partition, streaming over rows).
  *
  * ==== STUB BOUNDARY ====
  * This container ships no image/audio codecs, so [[decodeFeaturesStub]]
  * and [[frameOffsetsStub]] are clearly-marked deterministic fakes keyed
  * on content bytes. They honor the exact contract a real decoder would
  * (fixed feature dim, n-frame sampling) — swap the kernel, keep the
  * Spark plumbing (schema, batching, partitioning) unchanged.
  */
object Multimodal {

  val FeatureDim = 32

  /** Deterministic fake "decoder features": FeatureDim floats in [-1,1)
    * derived from the md5 of the payload. STUB — replace with a real
    * codec + model forward pass. */
  def decodeFeaturesStub(bytes: Array[Byte]): Array[Float] = {
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Float](FeatureDim)
    var block = md.digest(bytes)
    var produced = 0
    var round = 0
    while (produced < FeatureDim) {
      var i = 0
      while (i < block.length && produced < FeatureDim) {
        out(produced) = (block(i).toInt & 0xff) / 128.0f - 1.0f
        produced += 1
        i += 1
      }
      round += 1
      block = md.digest(block ++ Array(round.toByte))
    }
    out
  }

  /** Deterministic fake frame sampler: n byte offsets spread over the
    * payload (a real implementation returns decoded frames). STUB. */
  def frameOffsetsStub(bytes: Array[Byte], n: Int): Array[Long] =
    if (bytes.isEmpty) Array.fill(n)(0L)
    else Array.tabulate(n)(i => (bytes.length.toLong * i) / n)

  /** Attach decoded features to a media DataFrame.
    * df must have (idCol LONG-castable, bytesCol BINARY). Returns
    * (media_id, n_bytes, features ARRAY<FLOAT>). Batched per partition —
    * the expensive "codec" is initialized once per task, not per row. */
  def withFeatures(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init point (real impl: load codec/model here)
        it.map { case (id, bytes) =>
          (id, bytes.length.toLong, decodeFeaturesStub(bytes))
        }
      }
      .toDF("media_id", "n_bytes", "features")
  }

  /** Frame-sample a video-like payload: (media_id, frame_index, offset). */
  def withFrameSamples(df: DataFrame, idCol: String, bytesCol: String,
      framesPerItem: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          frameOffsetsStub(bytes, framesPerItem).zipWithIndex.map {
            case (off, i) => (id, i.toLong, off)
          }
        }
      }
      .toDF("media_id", "frame_index", "offset")
  }
}
