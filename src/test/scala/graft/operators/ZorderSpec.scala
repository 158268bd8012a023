package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout geometry: from ONE physical copy, file-level min/max
  * stats must be selective for point/range predicates on BOTH
  * dimensions — the property Parquet pruning consumes. Contrast case: a
  * single-column sorted layout is selective on its sort key and useless
  * on the other dimension. */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  private val nFiles = 16

  // 40k rows over a 50 × [0,1) grid, shuffled so input order carries no
  // accidental locality
  private lazy val df = {
    val rnd = new scala.util.Random(11)
    (1 to 40000).map { i =>
      (i.toLong, rnd.nextInt(50).toLong, rnd.nextDouble())
    }.toDF("id", "label", "ts").repartition(8)
  }

  private lazy val zPath = {
    val d = Files.createTempDirectory("graft_zorder_spec").toString + "/z"
    Zorder.layout(df, "label", "ts", d, files = nFiles)
    d
  }

  private lazy val labelSortedPath = {
    val d = Files.createTempDirectory("graft_zorder_spec").toString + "/l"
    df.repartitionByRange(nFiles, col("label")).sortWithinPartitions("label")
      .write.parquet(d)
    d
  }

  /** How many files COULD contain c in [lo, hi] per their own stats. */
  private def overlapping(path: String, c: String, lo: Double, hi: Double): (Long, Long) = {
    val st = Zorder.fileStats(spark, path, c).cache()
    val total = st.count()
    val hit = st.filter(col("lo") <= hi && col("hi") >= lo).count()
    st.unpersist()
    (hit, total)
  }

  test("z-layout prunes files for point predicates on BOTH dimensions") {
    val (labelHit, nf) = overlapping(zPath, "label", 7.0, 7.0)
    val (tsHit, _) = overlapping(zPath, "ts", 0.22, 0.30)
    assert(nf === nFiles.toLong)
    // a point/short-range probe on a 16-file z-layout should overlap
    // ~sqrt(16)=4 files; allow slack for bucket-boundary straddle
    assert(labelHit <= nf / 2, s"label probe overlaps $labelHit of $nf files")
    assert(tsHit <= nf / 2, s"ts probe overlaps $tsHit of $nf files")
  }

  test("single-column sort only prunes its own dimension (the contrast)") {
    val (labelHit, nf) = overlapping(labelSortedPath, "label", 7.0, 7.0)
    val (tsHit, _) = overlapping(labelSortedPath, "ts", 0.22, 0.30)
    assert(labelHit <= 2, s"sorted layout: label probe overlaps $labelHit files")
    assert(tsHit === nf, "uniform ts spans every label-sorted file")
  }

  test("layout preserves the data exactly") {
    val back = spark.read.parquet(zPath)
    assert(back.count() === df.count())
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }
}
