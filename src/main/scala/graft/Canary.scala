package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fixed-work machine canary for the bench JSON.
  *
  * Two consecutive rounds of gate-bench discord (r10 +11%, r11 +56%
  * driver-vs-builder on identical trees) were each bisected to
  * ENVIRONMENT by manually re-running old trees on the current
  * machine. The canary embeds that control in every bench run: two
  * workloads whose work is pinned forever, so their times measure the
  * machine, never the code under test.
  *
  *  - `canary_cpu_sec`: a single-thread FNV-1a loop over a fixed
  *    iteration count — pure ALU, no allocation, no I/O. Tracks CPU
  *    clock/steal/thermal state.
  *  - `canary_scan_sec`: a 32-task Spark aggregate over a pinned
  *    deterministic parquet table (generated once under /tmp,
  *    regenerated if missing — generation is untimed). Tracks the
  *    scheduler + parquet + page-cache path the query suite actually
  *    exercises.
  *
  * Interpretation rule (BASELINE.md): query movement the canary moves
  * WITH is machine; movement it doesn't is code. Both are min-of-3,
  * same as the query timings.
  */
object Canary {

  // Per-user path under the JVM's tmpdir: a world-shared fixed /tmp
  // path collides across users on shared hosts (one user's table is
  // unreadable/unwritable by the next) — derive from user.name so each
  // user owns their pinned table. Times stay comparable per-machine
  // because the work is pinned, not the absolute path.
  private val ScanPath = {
    val tmp = System.getProperty("java.io.tmpdir", "/tmp").stripSuffix("/")
    val user = Option(System.getProperty("user.name")).filter(_.nonEmpty).getOrElse("anon")
    s"$tmp/graft_canary_v1_$user"
  }
  private val ScanRows = 8L * 1000 * 1000
  private val ScanTasks = 32
  private val CpuIters = 400 * 1000 * 1000

  // the expected aggregate over the pinned table — doubles as a
  // corruption check on the canary table itself (a half-written table
  // would make scan times incomparable)
  private def expectedSum: Long = ScanRows * (ScanRows - 1) / 2

  private def cpuOnce(): Double = {
    val t0 = System.nanoTime()
    var h = 1469598103934665603L
    var i = 0
    while (i < CpuIters) { h = (h ^ i) * 1099511628211L; i += 1 }
    val dt = (System.nanoTime() - t0) / 1e9
    // data-dependent side effect so the loop cannot be dead-code
    // eliminated (the hash of a fixed range is a constant, but the JIT
    // cannot prove it)
    if (h == 42L) System.err.println("[canary] improbable hash")
    dt
  }

  private def ensureTable(s: SparkSession): Unit = {
    if (!new java.io.File(s"$ScanPath/_SUCCESS").exists())
      s.range(0L, ScanRows, 1L, ScanTasks)
        .select(col("id"), (col("id") % 97).as("k"),
          (col("id") * 31 % 1000003).cast("double").as("v"))
        .write.mode("overwrite").parquet(ScanPath)
  }

  private def scanOnce(s: SparkSession): Double = {
    val t0 = System.nanoTime()
    val got = s.read.parquet(ScanPath)
      .agg(sum("id").cast("long"), count(lit(1)))
      .head
    val dt = (System.nanoTime() - t0) / 1e9
    if (got.getLong(0) != expectedSum || got.getLong(1) != ScanRows) {
      // a corrupt pinned table silently poisons every future
      // cross-round comparison — rebuild it and report this run's scan
      // as unusable rather than wrong
      System.err.println(s"[canary] pinned table corrupt (sum=${got.getLong(0)}), rebuilding")
      graft.sources.ParquetMeta.deleteRecursively(new java.io.File(ScanPath))
      ensureTable(s)
      return -1.0
    }
    dt
  }

  def run(s: SparkSession): Seq[(String, Double)] = {
    ensureTable(s)
    val cpu = (1 to 3).map(_ => cpuOnce()).min
    val scans = (1 to 3).map(_ => scanOnce(s)).filter(_ >= 0)
    // An all-corrupt run previously emitted -1.0 as a sentinel mixed
    // into the bench JSON's seconds, which naive round-over-round
    // diffing ingests as a timing. Omit the metric instead — a missing
    // key is unambiguous to every consumer.
    Seq("canary_cpu_sec" -> cpu) ++
      (if (scans.nonEmpty) Seq("canary_scan_sec" -> scans.min) else Nil)
  }
}
