package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** CCNet-style line-level boilerplate removal (Wenzek et al., "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
  * segments repeated verbatim across many documents (headers, footers,
  * navigation chrome) are dropped from every document that carries them.
  *
  * The corpus here has no newlines, so the "line" unit is a
  * non-overlapping `width`-token window — the same fixed segmentation
  * both sides of the oracle can reproduce.
  *
  * Scale shape: one explode (narrow — `width` tokens per row), one
  * map-side-combined groupBy for the hot-segment census, and a broadcast
  * left-anti-style join back. The hot set is bounded by the `minDocs`
  * floor (segments repeated across >= minDocs docs), which at corpus
  * scale is tiny relative to the segment stream — never a shuffle join.
  */
object Boilerplate {

  /** Non-overlapping `width`-token segments: (id, pos, seg). */
  def segments(df: DataFrame, idCol: String, textCol: String, width: Int): DataFrame =
    df.withColumn("toks", TF.tokens(col(textCol)))
      .filter(size(col("toks")) >= 1)
      .select(col(idCol),
        posexplode(transform(sequence(lit(1), size(col("toks")), lit(width)),
          st => concat_ws(" ", slice(col("toks"), st, lit(width))))).as(Seq("pos", "seg")))

  /** Per-document boilerplate removal: a segment is boilerplate when its
    * exact text occurs in >= `minDocs` distinct documents. Returns one
    * row per doc: (id, n_segments, n_kept, kept_md5) where kept_md5
    * fingerprints the surviving segments re-joined in position order. */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
                        width: Int = 6, minDocs: Int = 3): DataFrame = {
    val segs = segments(df, idCol, textCol, width)
    val hot = segs.groupBy("seg")
      .agg(countDistinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("seg"), lit(1L).as("is_bp"))
    segs.join(broadcast(hot), Seq("seg"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("is_bp").isNull, 1L).otherwise(0L)).as("n_kept"),
        md5(concat_ws(" ",
          transform(
            sort_array(collect_list(when(col("is_bp").isNull,
              struct(col("pos"), col("seg"))))),
            x => x.getField("seg"))).cast("binary")).as("kept_md5"))
  }
}
