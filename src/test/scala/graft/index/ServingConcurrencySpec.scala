package graft.index

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AnnCatalog

import graft.SparkSpec
import graft.functions.VectorFunctions

/** Sustained concurrency property for the generation-dir store layout:
  * reader threads serve SQL statements CONTINUOUSLY while a maintenance
  * thread appends and folds the same store in a loop. Every statement
  * must return the exact top-k of SOME completed fold state — never a
  * half-fold, never a mix of two generations' rows, never an error —
  * and the final post-maintenance statement must serve the last fold.
  *
  * This generalizes ServingCacheSpec's deterministic single-point race
  * (the postResolveHook flip+GC corner) to uncontrolled interleavings:
  * statements here land at arbitrary points inside
  * append→fold→flip→GC cycles, exercising the immutable-generation
  * scan, the version-keyed cache under churn, and the failed-pass
  * retry, whichever the timing produces. The correctness bar is the
  * layout's core claim: a reader always observes one complete,
  * committed generation. */
class ServingConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 12
  private val k = 10

  test("statements racing live append+fold maintenance always serve one complete fold state") {
    val root = Files.createTempDirectory("graft_serv_conc").toFile
    root.deleteOnExit()
    val basePath = s"$root/base"
    val indexPath = s"$root/index"

    val rnd = new scala.util.Random(41)
    val baseRows = Seq.tabulate(300)(i => (i.toLong, Array.fill(dim)(rnd.nextFloat())))
    baseRows.map { case (id, v) => (id, (id % 4), (id % 25) / 25.0, v) }
      .toDF("id", "label", "ts", "vec").write.mode("overwrite").parquet(basePath)
    AnnIndexStore.build(spark.read.parquet(basePath), indexPath, numBuckets = 3)

    // query sits at the centroid of the vector cube; each fold f adds
    // one id whose vector is within ~0.001·(f+1) of it per coordinate —
    // distance ~1e-5 vs the base rows' ~1.0, so every appended id
    // enters the top-k the moment its fold commits and the k expected
    // sets are pairwise distinct
    val qv = Array.fill(dim)(0.5f)
    val folds = 4
    val appendedRows = Seq.tabulate(folds)(f =>
      (10000L + f, qv.map(x => x + 0.001f * (f + 1))))

    def exactTopK(rows: Seq[(Long, Array[Float])]): Seq[Long] =
      rows.map { case (id, v) =>
        var d = 0.0; var i = 0
        while (i < dim) { val x = (v(i) - qv(i)).toDouble; d += x * x; i += 1 }
        (d, id)
      }.sorted.take(k).map(_._2)

    // expected(f) = the exact top-k after fold f committed (f = 0 is
    // the freshly built store; un-folded delta rows are invisible to
    // the SQL store path by design)
    val expected: IndexedSeq[Seq[Long]] =
      (0 to folds).map(f => exactTopK(baseRows ++ appendedRows.take(f)))
    assert(expected.distinct.length == expected.length,
      "fold states must be distinguishable for the property to bite")

    AnnCatalog.register(basePath, indexPath, idCol = "id", vecCol = "vec",
      ef = 600, trusted = true)
    try {
      def stmt(): Seq[Long] = {
        val df = spark.read.parquet(basePath)
          .orderBy(VectorFunctions.l2Sq(col("vec"), typedLit(qv)), col("id"))
          .select("id").limit(k)
        df.collect().map(_.getLong(0)).toSeq
      }
      // plan-assert once, outside the race: every statement below uses
      // the identical shape
      ServingCache.clear()
      val probe = spark.read.parquet(basePath)
        .orderBy(VectorFunctions.l2Sq(col("vec"), typedLit(qv)), col("id"))
        .select("id").limit(k)
      assert(probe.queryExecution.executedPlan.toString.contains("AnnTopK"))
      assert(stmt() == expected(0))

      val done = new AtomicBoolean(false)
      val maintErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val maintenance = new Thread(() => {
        try {
          appendedRows.foreach { case (id, v) =>
            AnnIndexStore.appendDelta(Seq((id, v)).toDF("id", "vec"), indexPath)
            AnnIndexStore.compactDelta(spark, indexPath, numBuckets = 3)
          }
        } catch { case t: Throwable => maintErr.set(t) }
        finally done.set(true)
      }, "graft-conc-maintenance")

      val readerErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val observed = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
      val readers = Seq.tabulate(2)(r => new Thread(() => {
        try {
          var n = 0
          while (!done.get() && n < 200) { observed.add(stmt()); n += 1 }
        } catch { case t: Throwable => readerErr.set(t) }
      }, s"graft-conc-reader-$r"))

      maintenance.start(); readers.foreach(_.start())
      maintenance.join(300000); readers.foreach(_.join(300000))
      assert(maintErr.get() == null, s"maintenance failed: ${maintErr.get()}")
      assert(readerErr.get() == null,
        s"a racing statement failed instead of retrying: ${readerErr.get()}")

      import scala.jdk.CollectionConverters._
      val results = observed.asScala.toSeq
      assert(results.nonEmpty, "readers must have raced the maintenance loop")
      val legal = expected.toSet
      results.zipWithIndex.foreach { case (res, i) =>
        assert(legal.contains(res),
          s"racing statement $i served a result matching NO completed fold " +
            s"state (a torn or mixed-generation read): $res")
      }
      // after maintenance quiesces the store must serve the final fold
      assert(stmt() == expected(folds),
        "the post-maintenance statement must serve the last fold's state")
      assert(AnnIndexStore.resolveStore(indexPath) != indexPath.stripSuffix("/"),
        "the folds must have flipped the store to the generation layout")
    } finally AnnCatalog.unregister(basePath)
  }
}
