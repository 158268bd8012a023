package graft.operators

import java.io.File

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered layout — multi-dimensional pruning
  * from ONE physical copy.
  *
  * The reference keeps two sorted replicas of the base table so that a
  * label predicate prunes on one and a timestamp predicate on the other
  * (`utils.h:403-434`, layouts O1/O3). At 100 TB every extra replica is
  * a full storage copy and a full rewrite on ingest. Interleaving the
  * bits of both key columns into one Morton value and range-writing on
  * it gives each file a tight RECTANGLE in (c1, c2) space, so Parquet
  * min/max stats prune files/row-groups for selective predicates on
  * EITHER column — a point predicate on one dimension of an n-file
  * layout overlaps ~sqrt(n) files instead of all of them, from a single
  * copy. (The trade: per-dimension pruning is ~sqrt(n) rather than the
  * dedicated replica's ~1 — z-order replaces two replicas when storage,
  * not last-2× scan latency, is the binding constraint.)
  *
  * The z-value is pure codegen arithmetic (shift/mask spreads — no UDF),
  * 16 bits per dimension after min/max normalization; bounds come from
  * one bounded agg job and fold into the expression as literals. The
  * layout lives under a generation-fingerprinted path, same staleness
  * contract as the bucketed/ANN stores.
  */
object Zorder {

  /** Spread the low 16 bits of `x` so a zero bit separates each data
    * bit (the classic Morton magic-number ladder, codegen-friendly). */
  private def spread16(x: Column): Column = {
    var v = x.cast("long")
    v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
    v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x33333333L))
    v = v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x55555555L))
    v
  }

  /** 16-bit bucket of `c` over fixed [lo, hi] bounds (literal-folded). */
  private def bucket16(c: Column, lo: Double, hi: Double): Column = {
    val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
    least(greatest(floor((c.cast("double") - lit(lo)) / lit(span) * lit(65536.0)),
      lit(0.0)), lit(65535.0)).cast("long")
  }

  /** Morton value of (c1, c2) with both dimensions normalized over the
    * frame's own min/max (one agg job, folded into literals). */
  def zvalue(df: DataFrame, c1: String, c2: String): Column = {
    val b = df.agg(min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).head()
    // empty frame / all-null column → null aggregates; any fixed bounds
    // give a constant z-value, which is correct (nothing to order)
    def d(i: Int): Double = if (b.isNullAt(i)) 0.0 else b.getDouble(i)
    spread16(bucket16(col(c1), d(0), d(1)))
      .bitwiseOR(shiftleft(spread16(bucket16(col(c2), d(2), d(3))), 1))
  }

  /** Write `df` z-order clustered on (c1, c2) into `files` range
    * partitions of the Morton value; idempotent per source generation.
    * `gcPrefix`, when given, names the generation-independent part of
    * the path's final segment ([[graft.sources.ParquetMeta.storePrefix]])
    * and a fresh generation GCs stale fingerprint-suffixed siblings of
    * the same source first (generation-fingerprinted paths would
    * otherwise accumulate one full copy per source regeneration —
    * ADVICE r9). It is opt-in because only the CALLER knows the path is
    * tag-structured: inferring the prefix from an arbitrary path (e.g.
    * by its last '_') would turn layout() into a destructive sweep of
    * unrelated sibling directories. */
  def layout(df: DataFrame, c1: String, c2: String, path: String,
             files: Int = 32, gcPrefix: Option[String] = None): Unit = {
    if (!new File(path, "_SUCCESS").exists()) {
      val dir = new File(path)
      for (prefix <- gcPrefix; parent <- Option(dir.getParentFile))
        graft.sources.ParquetMeta.gcSiblingStores(parent, dir.getName, prefix)
      df.withColumn("zval", zvalue(df, c1, c2))
        .repartitionByRange(files, col("zval"))
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite").parquet(path)
    }
  }

  /** Per-file (min, max) of a column in a written layout — the same
    * stats Parquet pruning consults, surfaced for audit/spec use. */
  def fileStats(spark: SparkSession, path: String, c: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(c)).cast("double").as("lo"), max(col(c)).cast("double").as("hi"))
}
