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
  * IMAGES are decoded for real via `javax.imageio` (pure JVM — PNG,
  * JPEG, BMP, GIF per the runtime's registered readers):
  * [[decodeImageFeatures]] produces (width, height, channels, features)
  * with a 5×5 luminance thumbnail + per-channel statistics + aspect —
  * see [[withImageFeatures]].
  *
  * AUDIO is decoded for real via `javax.sound.sampled` (pure JVM —
  * WAV, AIFF, AU per the JDK's built-in providers):
  * [[decodeAudioFeatures]] produces (duration, sample rate, channels,
  * features) with a 25-bin RMS envelope + RMS/ZCR/peak statistics —
  * see [[withAudioFeatures]].
  *
  * ==== STUB BOUNDARY (video only) ====
  * No video codec ships in a bare JVM, so [[decodeFeaturesStub]] and
  * [[frameOffsetsStub]] remain clearly-marked deterministic fakes keyed
  * on content bytes, used for frame sampling and as the fallback for
  * payloads neither imageio nor the audio providers can decode. They
  * honor the exact contract a real decoder would (fixed feature dim,
  * n-frame sampling) — swap the kernel, keep the Spark plumbing
  * (schema, batching, partitioning) unchanged.
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

  /** REAL image decode (javax.imageio): None when the payload is not a
    * decodable image. Features ([[FeatureDim]] = 32 floats, all in
    * [-1, 1]):
    *   [0..24]  5×5 mean-luminance thumbnail (row-major), 0.299R+0.587G+0.114B
    *   [25..27] mean R, G, B
    *   [28..30] stddev R, G, B
    *   [31]     aspect = min(w/h, h/w)
    * each scaled from its natural range into [-1, 1]. One bulk getRGB —
    * a single pass over the pixels. */
  def decodeImageFeatures(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Float])] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      val channels = img.getColorModel.getNumComponents
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val grid = 5
      val cellSum = new Array[Double](grid * grid)
      val cellCnt = new Array[Long](grid * grid)
      var sr = 0.0; var sg = 0.0; var sb = 0.0
      var sr2 = 0.0; var sg2 = 0.0; var sb2 = 0.0
      var y = 0
      while (y < h) {
        val cy = math.min(y * grid / h, grid - 1)
        var x = 0
        while (x < w) {
          val p = px(y * w + x)
          val r = (p >> 16) & 0xff
          val g = (p >> 8) & 0xff
          val b = p & 0xff
          val lum = 0.299 * r + 0.587 * g + 0.114 * b
          val cell = cy * grid + math.min(x * grid / w, grid - 1)
          cellSum(cell) += lum
          cellCnt(cell) += 1
          sr += r; sg += g; sb += b
          sr2 += r.toDouble * r; sg2 += g.toDouble * g; sb2 += b.toDouble * b
          x += 1
        }
        y += 1
      }
      val n = w.toDouble * h
      val out = new Array[Float](FeatureDim)
      var c = 0
      while (c < grid * grid) {
        val mean = if (cellCnt(c) == 0) 0.0 else cellSum(c) / cellCnt(c)
        out(c) = (mean / 255.0 * 2.0 - 1.0).toFloat
        c += 1
      }
      def meanStd(s: Double, s2: Double): (Double, Double) = {
        val m = s / n
        (m, math.sqrt(math.max(0.0, s2 / n - m * m)))
      }
      val (mr, dr) = meanStd(sr, sr2)
      val (mg, dg) = meanStd(sg, sg2)
      val (mb, db) = meanStd(sb, sb2)
      out(25) = (mr / 255.0 * 2.0 - 1.0).toFloat
      out(26) = (mg / 255.0 * 2.0 - 1.0).toFloat
      out(27) = (mb / 255.0 * 2.0 - 1.0).toFloat
      out(28) = (dr / 127.5 - 1.0).toFloat
      out(29) = (dg / 127.5 - 1.0).toFloat
      out(30) = (db / 127.5 - 1.0).toFloat
      out(31) = (math.min(w.toDouble / h, h.toDouble / w) * 2.0 - 1.0).toFloat
      Some((w, h, channels, out))
    } catch {
      case _: Throwable => None
    }
  }

  /** REAL audio decode (javax.sound.sampled — WAV/AIFF/AU per the JDK's
    * built-in providers): None when the payload is not decodable audio.
    * The stream is converted to 16-bit signed PCM and mixed down to
    * mono; one pass computes the features ([[FeatureDim]] = 32 floats,
    * all in [-1, 1]):
    *   [0..24]  25-bin RMS energy envelope over time (each bin's RMS of
    *            the mono signal in [0,1], scaled)
    *   [25]     global RMS
    *   [26]     zero-crossing rate (sign flips / samples)
    *   [27]     peak |amplitude|
    *   [28]     mean |amplitude|
    *   [29]     duration, min(seconds/60, 1)
    *   [30]     sample rate, min(rate/48000, 1)
    *   [31]     channels, min(n/2, 1)
    * each scaled from its natural range into [-1, 1].
    * Returns (durationMs, sampleRate, channels, features). */
  def decodeAudioFeatures(bytes: Array[Byte]): Option[(Long, Int, Int, Array[Float])] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val src = in.getFormat
      val channels = src.getChannels
      val rate = src.getSampleRate
      if (channels <= 0 || rate <= 0) return None
      val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        rate, 16, channels, 2 * channels, rate, false)
      val pcm = AudioSystem.getAudioInputStream(pcmFmt, in)
      val raw = pcm.readAllBytes()
      pcm.close()
      val frameBytes = 2 * channels
      val nFrames = raw.length / frameBytes
      if (nFrames == 0) return None
      val grid = 25
      val binSum2 = new Array[Double](grid)
      val binCnt = new Array[Long](grid)
      var s2 = 0.0
      var sAbs = 0.0
      var peak = 0.0
      var flips = 0L
      var lastSign = 0
      var f = 0
      while (f < nFrames) {
        // mono mixdown: mean over channels, little-endian 16-bit
        var acc = 0.0
        var c = 0
        while (c < channels) {
          val o = f * frameBytes + 2 * c
          val s = ((raw(o) & 0xff) | (raw(o + 1) << 8)).toShort
          acc += s / 32768.0
          c += 1
        }
        val v = acc / channels
        val bin = math.min(f * grid / nFrames, grid - 1)
        binSum2(bin) += v * v
        binCnt(bin) += 1
        s2 += v * v
        sAbs += math.abs(v)
        if (math.abs(v) > peak) peak = math.abs(v)
        val sign = if (v > 0) 1 else if (v < 0) -1 else 0
        if (sign != 0) {
          if (lastSign != 0 && sign != lastSign) flips += 1
          lastSign = sign
        }
        f += 1
      }
      val out = new Array[Float](FeatureDim)
      var b = 0
      while (b < grid) {
        val rms = if (binCnt(b) == 0) 0.0 else math.sqrt(binSum2(b) / binCnt(b))
        out(b) = (math.min(rms, 1.0) * 2.0 - 1.0).toFloat
        b += 1
      }
      val durSec = nFrames / rate.toDouble
      out(25) = (math.min(math.sqrt(s2 / nFrames), 1.0) * 2.0 - 1.0).toFloat
      out(26) = (flips.toDouble / nFrames * 2.0 - 1.0).toFloat
      out(27) = (math.min(peak, 1.0) * 2.0 - 1.0).toFloat
      out(28) = (math.min(sAbs / nFrames, 1.0) * 2.0 - 1.0).toFloat
      out(29) = (math.min(durSec / 60.0, 1.0) * 2.0 - 1.0).toFloat
      out(30) = (math.min(rate / 48000.0, 1.0) * 2.0 - 1.0).toFloat
      out(31) = (math.min(channels / 2.0, 1.0) * 2.0 - 1.0).toFloat
      Some(((durSec * 1000).toLong, rate.toInt, channels, out))
    } catch {
      case _: Throwable => None
    }
  }

  /** Attach decoded features to a media DataFrame.
    * df must have (idCol LONG-castable, bytesCol BINARY). Returns
    * (media_id, n_bytes, features ARRAY<FLOAT>). Batched per partition —
    * the expensive codec is initialized once per task, not per row.
    * Decodable images get the REAL [[decodeImageFeatures]] features,
    * decodable audio the REAL [[decodeAudioFeatures]] features;
    * everything else falls back to the deterministic hash stub. */
  def withFeatures(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init point (audio/video impl: load codec here)
        it.map { case (id, bytes) =>
          val feats = decodeImageFeatures(bytes).map(_._4)
            .orElse(decodeAudioFeatures(bytes).map(_._4))
            .getOrElse(decodeFeaturesStub(bytes))
          (id, bytes.length.toLong, feats)
        }
      }
      .toDF("media_id", "n_bytes", "features")
  }

  /** Attach REAL image features: (media_id, n_bytes, width, height,
    * channels, features). Payloads imageio cannot decode fall back to
    * the deterministic hash features with width/height/channels = -1,
    * so the pipeline is total over mixed corpora. Batched per partition
    * like [[withFeatures]]. */
  def withImageFeatures(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeImageFeatures(bytes) match {
            case Some((w, h, c, f)) => (id, bytes.length.toLong, w, h, c, f)
            case None => (id, bytes.length.toLong, -1, -1, -1, decodeFeaturesStub(bytes))
          }
        }
      }
      .toDF("media_id", "n_bytes", "width", "height", "channels", "features")
  }

  /** Attach REAL audio features: (media_id, n_bytes, duration_ms,
    * sample_rate, channels, features). Payloads the JDK's audio
    * providers cannot decode fall back to the deterministic hash
    * features with duration_ms/sample_rate/channels = -1, so the
    * pipeline is total over mixed corpora. Batched per partition. */
  def withAudioFeatures(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeAudioFeatures(bytes) match {
            case Some((ms, rate, ch, f)) => (id, bytes.length.toLong, ms, rate, ch, f)
            case None => (id, bytes.length.toLong, -1L, -1, -1, decodeFeaturesStub(bytes))
          }
        }
      }
      .toDF("media_id", "n_bytes", "duration_ms", "sample_rate", "channels", "features")
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
