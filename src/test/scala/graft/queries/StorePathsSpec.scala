package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The legacy-tag GC runs a recursive delete under a SHARED /tmp
  * parent keyed on name shape alone — these tests pin the artifact
  * check that keeps it from destroying a foreign directory that merely
  * matches `<sanitized dir>-<hex>`. */
class StorePathsSpec extends SparkSpec {
  import spark.implicits._

  test("gcLegacyTags deletes graft-shaped legacy stores, never foreign lookalikes") {
    val corpus = Files.createTempDirectory("graft_sp_corpus").toString
    Seq((1L, Array(0.1f, 0.2f))).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
    val parent = Files.createTempDirectory("graft_sp_parent").toString
    val legacyPrefix = corpus.replaceAll("[^a-zA-Z0-9]", "_") + "-"

    def mk(name: String, marker: Option[String]): java.io.File = {
      val d = new java.io.File(parent, name)
      d.mkdirs()
      val f = new java.io.File(d, marker.getOrElse("notes.txt"))
      java.nio.file.Files.write(f.toPath, Array[Byte](1))
      d
    }
    // a real graft legacy store (job-commit marker present)
    val graftOwned = mk(legacyPrefix + "1a2b3c", Some("_SUCCESS"))
    // its delta sibling: exclusively store-shaped children
    val graftDelta = new java.io.File(parent, legacyPrefix + "1a2b3c.delta")
    new java.io.File(graftDelta, "eid=q1/bid=0").mkdirs()
    // a FOREIGN dir that happens to match the legacy name shape — no
    // graft artifact inside; deleting it would destroy someone's data
    val foreign = mk(legacyPrefix + "9f8e7d", None)
    val foreignDelta = mk(legacyPrefix + "9f8e7d.delta", None)

    // materialization-time resolve triggers the legacy sweep
    val tag = StorePaths.storeTag(spark, corpus)
    StorePaths.taggedPath(spark, parent, corpus)

    assert(!graftOwned.exists(), "graft-owned legacy store must be reclaimed")
    assert(!graftDelta.exists(), "its delta sibling must be reclaimed with it")
    assert(foreign.exists(), "a foreign lookalike dir must survive the sweep")
    assert(foreignDelta.exists(),
      "a foreign lookalike .delta dir must survive the sweep")
    assert(tag.nonEmpty)
  }
}
