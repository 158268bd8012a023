package graft.queries

import org.apache.spark.sql.SparkSession

/** The ONE definition of the query packs' derived-store addressing:
  * tag = sanitized sf dir + "-" + source-generation fingerprint of the
  * embeddings table, so a regenerated corpus can never hit a stale
  * layout or index store (the trustIndex serving mode relies on this),
  * and resolution GCs superseded generations at materialization
  * ([[graft.sources.ParquetMeta.resolveTagged]]). Shared by the packs
  * because a format drift between them would silently split the caches
  * onto differently-keyed roots and defeat cross-generation GC. */
private[queries] object StorePaths {

  def storeTag(s: SparkSession, dir: String): String =
    dir.replaceAll("[^a-zA-Z0-9]", "_") + "-" +
      graft.sources.ParquetMeta.fingerprint(s, s"$dir/embeddings.parquet")

  def taggedPath(s: SparkSession, parent: String, dir: String): String =
    graft.sources.ParquetMeta.resolveTagged(parent, storeTag(s, dir))
}
