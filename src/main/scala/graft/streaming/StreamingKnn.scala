package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.operators.KnnJoin

/** Continuous kNN serving: a stream of queries joined against a static
  * base table. The reference is strictly batch; this extends the same
  * exact kNN join to streaming ingestion (SURVEY §7.5) via foreachBatch
  * — each micro-batch of queries runs the identical broadcast-join plan
  * against the (cached) base, so streaming and batch results are
  * byte-identical by construction.
  *
  * At scale the base would be the persisted [[graft.index.AnnIndexStore]]
  * table for the approximate path; exact per-micro-batch joins are the
  * oracle configuration.
  */
object StreamingKnn {

  /** Wire a streaming query DataFrame (qid, qtype, v, l, r, qvec) to the
    * exact kNN join against `base`, delivering each micro-batch's flat
    * results (qid, rank, nid) to `sink`. Caller starts the returned
    * writer (choosing trigger/checkpoint). */
  def exactWriter(base: DataFrame, queryStream: DataFrame, k: Int)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val cachedBase = base.cache()
    queryStream.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(KnnJoin.exactFlat(cachedBase, batch, k), batchId)
      }
  }

  /** Streaming INGEST into a stored ANN index — the write half of the
    * LSM loop (the read half is [[graft.index.AnnIndexStore.searchWithDelta]]):
    * each micro-batch of (id, vec) rows appends to the store's delta
    * (searchable immediately at exact recall, no graph touched), and
    * when the accumulated delta crosses `compactAt` of the indexed
    * size, the batch triggers a fold into rebuilt graphs — amortized
    * maintenance driven by data volume, not wall clock. Graph builds
    * happen at most once per crossing; between crossings every batch is
    * a plain parquet append. Caller starts the returned writer
    * (trigger/checkpoint). Exactly-once-EFFECTIVE under foreachBatch's
    * at-least-once replay: each micro-batch lands via
    * [[graft.index.AnnIndexStore.appendDeltaBatch]] — its own
    * eid=<epoch>/bid=<batchId> subdirectory written with overwrite, so
    * a replayed batch rewrites the same rows rather than
    * double-appending, and a batch its epoch's fold watermark records
    * as already compacted into the graphs is skipped outright.
    *
    * `checkpointLocation`, when given, is set on the writer AND enables
    * the stream EPOCH (one argument for both, so they cannot drift):
    * batch ids are only meaningful within one checkpoint's lifetime,
    * and the epoch is what lets the store distinguish a replay (same
    * epoch, skip) from a NEW stream whose ids restart at 0 (different
    * epoch — its own delta subtree and its own watermark, written
    * beside the old stream's batches) instead
    * of silently dropping or double-serving rows. The epoch is the
    * PERSISTENT query id, read per batch from the stream-execution
    * thread's local property (see the body comment); [[checkpointEpoch]]
    * reads the same uuid from the checkpoint metadata as the off-thread
    * fallback. */
  def deltaIngestWriter(vectorStream: DataFrame, indexPath: String,
      numBuckets: Int, compactAt: Double = 0.25,
      checkpointLocation: Option[String] = None): DataStreamWriter[Row] = {
    // The epoch is re-resolved in EVERY batch, deliberately: the query
    // id belongs to the checkpoint CONTENTS, not this writer object — a
    // multi-start writer (AvailableNow is designed for repeated runs)
    // restarted after its checkpoint was cleared carries a new id, and
    // a memoized epoch would miss the change and let the new stream's
    // bid overwrites destroy the old stream's acknowledged rows.
    // Resolution is in-process first: foreachBatch runs on the stream
    // execution thread, where Spark publishes the PERSISTENT query id
    // as the local property `sql.streaming.queryId`
    // (StreamExecution.QUERY_ID_KEY — the same uuid the checkpoint
    // metadata carries, so the two sources can never disagree). That is
    // free and immune to checkpoint-store flicker; the metadata read
    // remains as the fallback for exotic callers that invoke the batch
    // function off-thread.
    val w = vectorStream.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val epoch = checkpointLocation.map { loc =>
          Option(spark.sparkContext.getLocalProperty(
              org.apache.spark.sql.execution.streaming.runtime.StreamExecution.QUERY_ID_KEY))
            .getOrElse(checkpointEpoch(spark, loc))
        }
        graft.index.AnnIndexStore.appendDeltaBatch(batch, indexPath, batchId, epoch)
        if (graft.index.AnnIndexStore.deltaFraction(spark, indexPath) >= compactAt)
          graft.index.AnnIndexStore.compactDelta(spark, indexPath, numBuckets)
      }
    checkpointLocation.fold(w)(loc => w.option("checkpointLocation", loc))
  }

  /** The stream epoch of a checkpoint: its PERSISTENT query id (the
    * `metadata` file Structured Streaming writes at the checkpoint
    * root). The id, not the path, is the stream's identity — it
    * survives the checkpoint directory being MOVED (same stream, batch
    * ids still meaningful: a replay must still skip, not reset the
    * fold watermark and double-append) and is regenerated when the
    * contents are cleared (a genuinely new stream even at the same
    * path). Resolved through the Hadoop filesystem — checkpoints live
    * wherever Spark can put them (`file:` URIs, distributed stores),
    * and a local-file read would silently miss them and degrade the
    * epoch to the raw string. Falls back to the fs-QUALIFIED path
    * (spelling-normalized: `/x` ≡ `file:/x`) only when the metadata is
    * genuinely ABSENT; a read error PROPAGATES and fails the batch —
    * an error fallback would return a different epoch string than
    * steady state, and one flickering fs call would then masquerade as
    * a new stream writing under a fresh watermark-less epoch, letting
    * a replayed folded batch append twice. Failing the batch is safe:
    * the stream retries and resolution runs again. The fallback
    * spelling is part of epoch identity — keep it byte-stable across
    * versions. */
  def checkpointEpoch(spark: org.apache.spark.sql.SparkSession,
      location: String): String = {
    val p = new org.apache.hadoop.fs.Path(location)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val meta = new org.apache.hadoop.fs.Path(p, "metadata")
    val parsed =
      if (!fs.exists(meta)) None
      else {
        val in = fs.open(meta)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        "\"id\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(s).map(_.group(1))
      }
    parsed.getOrElse(fs.makeQualified(p).toString)
  }
}
