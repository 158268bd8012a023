package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Reader for the `events` table that normalizes `ts` to integer epoch
  * NANOSECONDS regardless of how the corpus generation encoded it:
  *
  *  - parquet INT64 TIMESTAMP(NANOS) corpora arrive as long ns via the
  *    `nanosAsLong` legacy conf (Spark 4 cannot represent ns timestamps
  *    otherwise);
  *  - parquet TIMESTAMP(MICROS) corpora arrive as TIMESTAMP_NTZ and are
  *    scaled µs → ns with timezone-independent NTZ arithmetic
  *    (`timestampdiff` over two NTZ operands never consults the session
  *    zone — the exact semantics of DuckDB's `epoch_us` on a naive
  *    TIMESTAMP, so the oracles' `epoch_us(ts)` sees the same instants).
  *
  * Downstream event-time arithmetic stays integer ns everywhere
  * (`ts div 1000` = µs), so a corpus re-generation that flips the
  * encoding cannot silently shift query semantics.
  */
object Events {
  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  def read(s: SparkSession, dir: String): DataFrame = {
    // The conf must be set BEFORE schema inference to know which
    // encoding the corpus uses. If the corpus turns out NOT to be
    // nanos-encoded, restore the caller's previous value — leaving it
    // set would silently change how every later parquet read in the
    // session decodes TIMESTAMP(NANOS) columns. A genuinely
    // nanos-encoded corpus needs the conf at SCAN time too (the read
    // is lazy), so for that one case it stays set — the session-wide
    // requirement Spark 4 imposes for ns data, documented here.
    val prev = s.conf.getOption(NanosConf)
    s.conf.set(NanosConf, "true")
    def restore(): Unit = prev match {
      case Some(v) => s.conf.set(NanosConf, v)
      case None    => s.conf.unset(NanosConf)
    }
    // restore on the THROW path too: a missing events.parquet or a
    // schema without `ts` would otherwise leave the conf set
    // session-wide — the exact side effect this dance exists to avoid
    val raw =
      try s.read.parquet(s"$dir/events.parquet")
      catch { case t: Throwable => restore(); throw t }
    val tsType =
      try raw.schema("ts").dataType
      catch { case t: Throwable => restore(); throw t }
    tsType match {
      case LongType =>
        // a long `ts` is either TIMESTAMP(NANOS) decoded as long BY the
        // conf (which must then stay set for the lazy scan) or a
        // genuinely int64-encoded column the conf is irrelevant to —
        // the inferred schema cannot tell them apart, so without this
        // check a plain-int64 corpus would leave the conf set
        // session-wide and every later read would silently decode
        // TIMESTAMP(NANOS) columns as longs. The parquet footer's
        // logical type disambiguates; a footer-read failure keeps the
        // conf set (conservative: the scan still decodes correctly
        // either way, only the session-wide hygiene is lost).
        val nanosEncoded =
          try ParquetMeta.logicalType(s, s"$dir/events.parquet", "ts")
            .exists(t => t.startsWith("TIMESTAMP") && t.contains("NANOS"))
          catch { case scala.util.control.NonFatal(_) => true }
        if (!nanosEncoded) restore()
        raw
      case TimestampNTZType =>
        restore()
        raw.withColumn("ts",
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000"))
      case TimestampType =>
        // isAdjustedToUTC=true micros (what Spark itself writes for
        // TimestampType): the value is an instant, so unix_micros is the
        // epoch directly — session-zone-independent by construction.
        // The NTZ timestampdiff form above would be WRONG here: the NTZ
        // literal gets zone-coerced against a TZ operand.
        restore()
        raw.withColumn("ts", unix_micros(col("ts")) * 1000)
      case other =>
        restore()
        throw new IllegalStateException(
          s"events.ts: unsupported encoding $other — extend Events.read")
    }
  }
}
