package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Crash-point property over the delta-ingest lifecycle: the process is
  * "killed" (an injected throw) at EVERY fs-visible boundary of every
  * maintenance op in an append → fold → append → epoch-switch → fold
  * script, recovery runs implicitly at the next maintenance entry (plus
  * the at-least-once replay rule for appends), and the final serve set
  * must equal the acknowledged row set EXACTLY — no row lost, none
  * served twice. This upgrades the hand-picked crash-window tests
  * (half-swap, stale fold, replay) to an enumeration of all named
  * boundaries ([[AnnIndexStore.crashHook]] call sites), with a coverage
  * assert so a new boundary cannot ship uninstrumented-and-untested. */
class DeltaCrashPropertySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val rnd = new scala.util.Random(17)
  private def vec(): Array[Float] = Array.fill(dim)(rnd.nextFloat())
  private def rows(tag: Int, n: Int): Seq[(Long, Array[Float])] =
    Seq.tabulate(n)(i => ((tag * 10000 + i).toLong, vec()))

  private case class CrashSim(point: String) extends RuntimeException(point)

  /** The lifecycle script: name → (op, replayable). `replayable` ops
    * (appends — checkpointed sources resend an unacknowledged batch)
    * are ALWAYS re-run after a crash; non-replayable ones (compactions)
    * alternate between retry and skip, since the serve set must be
    * right either way. */
  private def script(dir: String): Seq[(String, () => Unit, Boolean)] = Seq(
    ("append_b0_e1", () => AnnIndexStore.appendDeltaBatch(
      rows(1, 30).toDF("id", "vec"), dir, 0, Some("E1")), true),
    ("append_b1_e1", () => AnnIndexStore.appendDeltaBatch(
      rows(2, 30).toDF("id", "vec"), dir, 1, Some("E1")), true),
    // legacy bridge: fabricate a ROOT-layout micro-batch (the
    // pre-epoch-scoped streaming layout — an epoch-less append plus the
    // _stream_epoch file its old writer would have left) …
    ("legacy_root_b2", () => {
      AnnIndexStore.appendDeltaBatch(rows(6, 30).toDF("id", "vec"), dir, 2)
      val dp = new java.io.File(AnnIndexStore.deltaPath(dir))
      dp.mkdirs()
      Files.write(new java.io.File(dp, AnnIndexStore.streamEpochName).toPath,
        "E1".getBytes("UTF-8"))
    }, true),
    // … then replay the SAME batch under the new layout: the root copy
    // must die before the epoch-scoped overwrite lands (rows exactly
    // once, whichever side a crash leaves committed)
    ("replay_b2_e1", () => AnnIndexStore.appendDeltaBatch(
      rows(6, 30).toDF("id", "vec"), dir, 2, Some("E1")), true),
    ("compact_1", () => AnnIndexStore.compactDelta(spark, dir, 2), false),
    // replaceDelta REPLACES the flat layout by contract, so the script
    // places it where the flat layout is empty under EVERY crash
    // outcome of the prior steps (committed bid/eid dirs survive a
    // replace)
    ("replace_flat", () => AnnIndexStore.replaceDelta(
      rows(5, 30).toDF("id", "vec"), dir), true),
    ("append_b3_e1", () => AnnIndexStore.appendDeltaBatch(
      rows(3, 30).toDF("id", "vec"), dir, 3, Some("E1")), true),
    // bid 0 under a NEW epoch while bid 3 is committed-but-unfolded and
    // flat rows coexist: the new stream writes BESIDE the old one (its
    // own eid= subtree) — nothing demoted or relocated
    ("append_b0_e2", () => AnnIndexStore.appendDeltaBatch(
      rows(4, 30).toDF("id", "vec"), dir, 0, Some("E2")), true),
    // folds mixed flat AND two epochs' batch dirs
    ("compact_2", () => AnnIndexStore.compactDelta(spark, dir, 2), false)
  )

  private val expectedIds: Set[Long] =
    (rows(0, 80) ++ rows(1, 30) ++ rows(2, 30) ++ rows(3, 30) ++ rows(4, 30) ++
      rows(5, 30) ++ rows(6, 30)).map(_._1).toSet

  private def freshStore(): String = {
    val dir = Files.createTempDirectory("graft-crashprop").toString + "/index"
    AnnIndexStore.build(rows(0, 80).toDF("id", "vec"), dir, numBuckets = 2)
    dir
  }

  /** Final-state assertion: one clean compaction (a maintenance entry =
    * full recovery), then the folded store must hold EXACTLY the
    * acknowledged ids — set equality catches lost rows, the count
    * equality catches a row folded twice. */
  private def assertServeSet(dir: String, ctx: String): Unit = {
    AnnIndexStore.compactDelta(spark, dir, numBuckets = 2)
    assert(AnnIndexStore.deltaFraction(spark, dir) == 0.0, s"[$ctx] delta not cleared")
    val served = spark.read.parquet(AnnIndexStore.resolveStore(dir))
      .select(explode(col("ids")).as("id"))
      .collect().map(_.getLong(0))
    assert(served.length == expectedIds.size,
      s"[$ctx] ${served.length} rows served, expected ${expectedIds.size} " +
        s"(dups: ${served.groupBy(identity).filter(_._2.length > 1).keys.take(5).toSeq})")
    assert(served.toSet == expectedIds,
      s"[$ctx] lost ${expectedIds.diff(served.toSet).take(5)}, " +
        s"phantom ${served.toSet.diff(expectedIds).take(5)}")
  }

  test("every fs-visible maintenance boundary recovers to the exact serve set") {
    // discovery pass: which (step, point) pairs does the script visit?
    val visited = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
    val dir0 = freshStore()
    script(dir0).foreach { case (step, op, _) =>
      AnnIndexStore.crashHook = p => visited += ((step, p))
      try op() finally AnnIndexStore.crashHook = _ => ()
    }
    assertServeSet(dir0, "no-crash baseline")
    // the enumeration itself is asserted: every instrumented boundary
    // must be exercised by the script (a renamed/added point fails here)
    val expectedPoints = Set(
      "append.root_replay_cleared", "replace.swept",
      "compact.entry_swept", "compact.built", "compact.marked",
      "flip.tmp_written", "compact.flipped")
    assert(visited.map(_._2).toSet == expectedPoints,
      s"script does not exercise: ${expectedPoints.diff(visited.map(_._2).toSet)}; " +
        s"unexpected: ${visited.map(_._2).toSet.diff(expectedPoints)}")

    // property pass: one run per (step, point), crash there, recover,
    // finish the script, assert the serve set
    visited.toSeq.zipWithIndex.foreach { case ((crashStep, crashAt), i) =>
      val dir = freshStore()
      val steps = script(dir)
      val idx = steps.indexWhere(_._1 == crashStep)
      steps.take(idx).foreach(_._2())
      val (_, op, replayable) = steps(idx)
      AnnIndexStore.crashHook = p => if (p == crashAt) throw CrashSim(p)
      val crashed =
        try { op(); false }
        catch { case CrashSim(_) => true }
        finally { AnnIndexStore.crashHook = _ => () }
      assert(crashed, s"[$crashStep/$crashAt] expected the injected crash to fire")
      // "never neither": at EVERY crash point — including mid-flip —
      // a reader must resolve a complete generation (old until the
      // manifest rename, new after), never an absent or partial store
      val probe = spark.read.parquet(AnnIndexStore.resolveStore(dir))
      assert(probe.count() > 0,
        s"[$crashStep/$crashAt] store unreadable right after the crash")
      // at-least-once replay for appends; compactions alternate between
      // a retry and skipping straight to the next op (recovery must not
      // depend on the crashed op being re-run)
      if (replayable || i % 2 == 0) op()
      steps.drop(idx + 1).foreach(_._2())
      assertServeSet(dir, s"$crashStep/$crashAt")
    }
  }

  test("band-tuning sidecar writes recover at every crash point (torn pair never validates)") {
    // a buildBy store with real attrs, the banded-arm shape tuneBands needs
    val base = Seq.tabulate(600)(i => (i.toLong, (i % 100) / 100.0, vec()))
      .toDF("id", "ts", "vec")
    val queries = Seq.tabulate(40)(i =>
      (i.toLong, 2, (i % 3) / 10.0, (i % 3) / 10.0 + 0.5, vec()))
      .toDF("qid", "qtype", "l", "r", "qvec")
    Seq("bands.params_deleted", "bands.written").foreach { crashAt =>
      val dir = Files.createTempDirectory("graft-crashbands").toString + "/by_decile"
      AnnIndexStore.buildBy(
        base.withColumn("bucket", floor(col("ts") * 10).cast("long")),
        dir, "bucket", attrCol = Some("ts"))
      AnnIndexStore.crashHook = p => if (p == crashAt) throw CrashSim(p)
      val crashed =
        try { EfTuner.tuneAndPersistBands(spark, dir, queries, k = 10, ef = 128); false }
        catch { case CrashSim(_) => true }
        finally { AnnIndexStore.crashHook = _ => () }
      assert(crashed, s"[$crashAt] expected the injected crash to fire")
      // post-crash serving: the sidecar resolution must yield a VALID
      // table or the defaults — never throw, never a torn pair taken
      // as authoritative
      AnnIndexStore.efBandsOf(dir) // parses or None; must not throw
      // recovery = the next tuning entry: a torn pair cannot validate
      // (params deleted first / written last), so it must RE-TUNE …
      val retuned = EfTuner.tuneAndPersistBands(spark, dir, queries, k = 10, ef = 128)
      assert(retuned.isDefined,
        s"[$crashAt] post-crash entry must re-tune, not trust a torn pair")
      // … and leave a coherent pair a further entry recognizes as done
      assert(AnnIndexStore.efBandsOf(dir).contains(retuned.get),
        s"[$crashAt] recovered sidecar must hold the re-tuned table")
      assert(EfTuner.tuneAndPersistBands(spark, dir, queries, k = 10, ef = 128).isEmpty,
        s"[$crashAt] a matching pair must be reused, not re-tuned forever")
    }
  }

  test("nprobe sidecar writes recover at every crash point (torn pair never validates)") {
    val base = Seq.tabulate(600)(i => (i.toLong, vec())).toDF("id", "vec")
    val queries = Seq.tabulate(20)(i =>
      (i.toLong, 0, 0.0, 1.0, vec())).toDF("qid", "qtype", "l", "r", "qvec")
    Seq("nprobe.params_deleted", "nprobe.written").foreach { crashAt =>
      val dir = Files.createTempDirectory("graft-crashnprobe").toString + "/by_ivf"
      AnnIndexStore.buildIvfSeeded(base, dir, nlist = 4)
      AnnIndexStore.crashHook = p => if (p == crashAt) throw CrashSim(p)
      val crashed =
        try { EfTuner.tuneAndPersistNprobe(spark, dir, queries, k = 10, ef = 128); false }
        catch { case CrashSim(_) => true }
        finally { AnnIndexStore.crashHook = _ => () }
      assert(crashed, s"[$crashAt] expected the injected crash to fire")
      // post-crash serving must never see a torn pair as authoritative:
      // nprobeOf parses a valid value or None, and AutoNprobe resolution
      // always yields a servable positive count
      AnnIndexStore.nprobeOf(dir)
      assert(AnnIndexStore.resolveNprobe(dir, AnnIndexStore.AutoNprobe) > 0,
        s"[$crashAt] AutoNprobe resolution must stay servable after a crash")
      // recovery = the next tuning entry re-tunes (params deleted first /
      // written last — a torn pair cannot validate) …
      val retuned = EfTuner.tuneAndPersistNprobe(spark, dir, queries, k = 10, ef = 128)
      assert(retuned.isDefined,
        s"[$crashAt] post-crash entry must re-tune, not trust a torn pair")
      // … leaves the re-tuned value where the serving arms load it …
      assert(AnnIndexStore.nprobeOf(dir).contains(retuned.get.chosen),
        s"[$crashAt] recovered sidecar must hold the re-tuned value")
      assert(AnnIndexStore.resolveNprobe(dir, AnnIndexStore.AutoNprobe) ==
        retuned.get.chosen,
        s"[$crashAt] AutoNprobe must resolve to the recovered value")
      // … and a matching pair is reused, not re-tuned forever
      assert(EfTuner.tuneAndPersistNprobe(spark, dir, queries, k = 10, ef = 128).isEmpty,
        s"[$crashAt] a matching pair must be reused, not re-tuned forever")
    }
  }

  test("ivf-ef sidecar writes recover at every crash point (torn pair never validates)") {
    val base = Seq.tabulate(600)(i => (i.toLong, vec())).toDF("id", "vec")
    val queries = Seq.tabulate(20)(i =>
      (i.toLong, 0, 0.0, 1.0, vec())).toDF("qid", "qtype", "l", "r", "qvec")
    Seq("ivfef.params_deleted", "ivfef.written").foreach { crashAt =>
      val dir = Files.createTempDirectory("graft-crashivfef").toString + "/by_ivf"
      AnnIndexStore.buildIvfSeeded(base, dir, nlist = 4)
      AnnIndexStore.crashHook = p => if (p == crashAt) throw CrashSim(p)
      val crashed =
        try { EfTuner.tuneAndPersistIvfEf(spark, dir, base, queries, k = 10); false }
        catch { case CrashSim(_) => true }
        finally { AnnIndexStore.crashHook = _ => () }
      assert(crashed, s"[$crashAt] expected the injected crash to fire")
      // a torn value never parses as authoritative: the reader either
      // sees nothing or a valid positive ef — never garbage, never a throw
      AnnIndexStore.ivfEfOf(dir).foreach(v => assert(v > 0,
        s"[$crashAt] torn _ivf_ef parsed to non-positive $v"))
      val retuned = EfTuner.tuneAndPersistIvfEf(spark, dir, base, queries, k = 10)
      assert(retuned.isDefined,
        s"[$crashAt] post-crash entry must re-tune, not trust a torn pair")
      assert(AnnIndexStore.ivfEfOf(dir).contains(retuned.get.chosenEf),
        s"[$crashAt] recovered sidecar must hold the re-tuned value")
      assert(EfTuner.tuneAndPersistIvfEf(spark, dir, base, queries, k = 10).isEmpty,
        s"[$crashAt] a matching pair must be reused, not re-tuned forever")
    }
  }
}
