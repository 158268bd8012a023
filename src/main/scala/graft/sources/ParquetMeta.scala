package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Driver-side parquet metadata reads.
  *
  * A parquet footer records the exact row count of every row group, so a
  * table's cardinality is available without running a Spark job — the
  * same trick the reference's binary reader uses with its element-count
  * header (`io.h:9-13` reads `num` before any data). Used to feed the
  * size-routing hints in [[graft.operators.Dedup]] so composed dedup
  * pipelines pay zero gating jobs: footer reads are one driver RPC per
  * file, independent of data volume (at 100 TB the footers are a few MB
  * while the data is not).
  */
object ParquetMeta {

  /** Committed-looking data files under `path`, recursively: skips any
    * file whose path ENTERS a `_`- or `.`-prefixed directory component
    * (`_temporary` job-attempt trees, `_gen-*` siblings, hidden dirs) —
    * a crashed write's uncommitted task outputs must never answer a
    * metadata question for the committed dataset — plus `_`/`.`-leaf
    * markers. One shared definition for every footer-serving helper
    * here (rowCount / logicalType), so the exclusion rule cannot
    * drift between them. */
  private def dataParquetFiles(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Seq[Path] = {
    val rootUri = root.toUri.getPath
    val it = fs.listFiles(root, true)
    val acc = Seq.newBuilder[Path]
    while (it.hasNext) {
      val s = it.next()
      val n = s.getPath.getName
      val rel = s.getPath.toUri.getPath.stripPrefix(rootUri)
      val hiddenDir = rel.split("/").dropRight(1)
        .exists(c => c.startsWith("_") || c.startsWith("."))
      if (s.isFile && s.getLen > 0 && !hiddenDir &&
          n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
        acc += s.getPath
    }
    acc.result()
  }

  /** Exact row count of a parquet file or directory of part files,
    * summed from footer metadata on the driver. No Spark job. */
  def rowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files: Seq[Path] =
      // Recursive: partitioned layouts nest part files under key=value
      // subdirectories — a flat listStatus would silently undercount.
      if (fs.getFileStatus(p).isDirectory) dataParquetFiles(fs, p)
      else Seq(p)
    files.iterator.map { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try reader.getRecordCount
      finally reader.close()
    }.sum
  }

  /** Upper bound on the largest per-key byte footprint of `column`,
    * from FOOTER metadata alone (no blob bytes read, no Spark job):
    * for each row group, the `column` chunk's total uncompressed size
    * is attributed to the row group's `keyColumn` value when its
    * min/max statistics pin a single key; row groups spanning keys (or
    * missing stats) are summed into EVERY candidate — a deliberate
    * over-estimate, safe for budget checks (fails early, never admits
    * an oversized key). Spanning is NOT rare by accident: at parquet's
    * default 128 MB row-group target a ~93 MB blob row leaves room for
    * a second row, so un-tuned store layouts span on nearly every
    * group (measured: 98 MB attributed vs 14.57 GB spanning at the 30M
    * ladder store) — [[graft.index.AnnIndexStore]] therefore writes
    * blob stores with a block size below one blob so each row group
    * pins exactly one key.
    *
    * Returned decomposed as
    * `(attributed, spanning)`: `attributed` is the largest total
    * pinned to a single key by row-group statistics and `spanning` is
    * the bytes of row groups that span keys (or lack stats) — charged
    * to EVERY key by the conservative bound. Callers that fail a budget
    * check should surface both numbers: a large `spanning` share means
    * the failure is a row-group-layout artifact (multiple buckets
    * packed per row group), fixable by rewriting the layout, not by
    * shrinking any actual bucket. */
  def maxKeyedColumnBytesSplit(spark: SparkSession, path: String,
      column: String, keyColumn: String): (Long, Long) = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory) dataParquetFiles(fs, p)
      else Seq(p)
    val perKey = scala.collection.mutable.Map.empty[Any, Long]
    var spanning = 0L
    files.foreach { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        reader.getFooter.getBlocks.forEach { block =>
          var bytes = 0L
          var key: Option[Any] = None
          var pinned = false
          block.getColumns.forEach { cc =>
            val name = cc.getPath.toDotString
            if (name == column || name.startsWith(column + "."))
              bytes += cc.getTotalUncompressedSize
            if (name == keyColumn) {
              val st = cc.getStatistics
              if (st != null && st.hasNonNullValue &&
                  st.genericGetMin == st.genericGetMax) {
                key = Some(st.genericGetMin)
                pinned = true
              }
            }
          }
          if (pinned) perKey(key.get) = perKey.getOrElse(key.get, 0L) + bytes
          else spanning += bytes
        }
      } finally reader.close()
    }
    (perKey.values.maxOption.getOrElse(0L), spanning)
  }

  /** The parquet LOGICAL type annotation of a top-level `column`, read
    * from the footer of the first data file under `path` — e.g.
    * "TIMESTAMP(NANOS,false)" — or None when the column is a plain
    * primitive (no annotation) or absent. Spark's inferred schema
    * cannot distinguish a genuine INT64 column from TIMESTAMP(NANOS)
    * decoded as long under the `nanosAsLong` legacy conf; the footer
    * can ([[Events.read]] needs exactly that to know whether the conf
    * must stay set for the scan). One driver RPC, no Spark job. */
  def logicalType(spark: SparkSession, path: String,
      column: String): Option[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    // committed files only (dataParquetFiles skips _temporary trees):
    // a crashed regeneration's stale attempt file must not decide the
    // session-wide ts encoding
    val first: Option[Path] =
      if (fs.getFileStatus(p).isDirectory) dataParquetFiles(fs, p).headOption
      else Some(p)
    first.flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        if (!schema.containsField(column)) None
        else Option(schema.getType(schema.getFieldIndex(column))
          .getLogicalTypeAnnotation).map(_.toString)
      } finally reader.close()
    }
  }

  /** Cheap generation fingerprint of a source dataset: FNV hash of every
    * data file's (name, length, mtime). Derived stores (index tables,
    * clustered layouts) embed this in their path, so a REGENERATED
    * source corpus can never be served from a stale derived store — the
    * `_SUCCESS`-exists build guard alone would happily reuse an index
    * built from the previous corpus generation (and the
    * spark.graft.ann.trustIndex serving mode would then skip the
    * staleness check that used to catch it). No Spark job, no footer
    * read — one directory listing. */
  def fingerprint(spark: SparkSession, path: String, recursive: Boolean = true): String = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    // Key files by their FULL path under the root, not the bare name:
    // partitioned layouts repeat names (label=0/part-00000, label=1/
    // part-00000) — a name-only sort leaves equal names in enumeration
    // order (unstable fingerprints) and makes two same-size files
    // swapped between partitions indistinguishable. `recursive = false`
    // fingerprints only the root's own files — the delta stores use it
    // to identify the flat layer independently of bid= subdirectories.
    val rootUri = p.toUri.getPath
    val stats: Seq[(String, Long, Long)] =
      if (fs.getFileStatus(p).isDirectory) {
        val it = fs.listFiles(p, recursive)
        val acc = Seq.newBuilder[(String, Long, Long)]
        while (it.hasNext) {
          val s = it.next()
          val n = s.getPath.getName
          if (s.isFile && !n.startsWith("_") && !n.startsWith("."))
            acc += ((s.getPath.toUri.getPath.stripPrefix(rootUri),
              s.getLen, s.getModificationTime))
        }
        acc.result().sortBy(_._1)
      } else {
        val s = fs.getFileStatus(p)
        Seq((s.getPath.getName, s.getLen, s.getModificationTime))
      }
    var h = 1469598103934665603L // FNV-1a offset basis
    stats.foreach { case (n, len, mt) =>
      s"$n:$len:$mt|".foreach { c => h = (h ^ c) * 1099511628211L }
    }
    java.lang.Long.toHexString(h)
  }

  /** Canonical derived-store tag for `dir/<table>.parquet`: sanitized
    * dir + table + source-generation [[fingerprint]]. One shared
    * definition so every /tmp derived store (bucketed layouts, z-order
    * layouts, index stores) keys identically — including the source
    * DIR, so two corpora whose files happen to share (name, size,
    * mtime) cannot collide in the derived-store namespace. Safe for
    * catalog identifiers and paths: `[a-zA-Z0-9_]` only. */
  def storeTag(spark: SparkSession, dir: String, table: String): String =
    storePrefix(dir, table) + fingerprint(spark, s"$dir/$table.parquet")

  /** The generation-independent part of [[storeTag]] — everything
    * before the source fingerprint. Derived-store writers use it to
    * find STALE sibling generations of the same source for GC. */
  def storePrefix(dir: String, table: String): String =
    (dir.stripSuffix("/") + "_" + table).replaceAll("[^a-zA-Z0-9]", "_") + "_"

  /** Remove stale generations of a derived store: directories under
    * `parent` that share `keep`'s source identity (same prefix before
    * the embedded fingerprint, same suffix after it) but are not `keep`
    * itself — i.e. copies keyed to a superseded source generation.
    * Derived stores are (re)creatable caches by contract, so deleting a
    * stale one costs at most a rebuild; NOT calling this leaks a full
    * table copy under /tmp on every source regeneration, forever. Run
    * when a new generation is materialized (single-writer, same
    * contract as the store write itself).
    *
    * A sibling is deleted ONLY when the segment between prefix and
    * suffix is fingerprint-shaped (hex, no separators): prefix/suffix
    * string matching alone would also capture a DIFFERENT source whose
    * sanitized name extends this one — e.g. tables `orders` and
    * `orders_v2` under the same dir, where `..._orders_` is a prefix of
    * `..._orders_v2_<fp>` — and deleting that sibling breaks a live,
    * possibly catalog-registered store. Every [[storeTag]] inserts the
    * fingerprint directly after the prefix, so for tag-structured
    * stores the hex test exactly separates "same source, older
    * generation" from "different source". */
  def gcSiblingStores(parent: java.io.File, keep: String,
      prefix: String, suffix: String = ""): Unit = {
    val fpShaped = "[0-9a-f]{1,16}".r
    Option(parent.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter { f =>
        f.isDirectory && f.getName != keep &&
        f.getName.startsWith(prefix) && f.getName.endsWith(suffix) &&
        f.getName.length > prefix.length + suffix.length && {
          val mid = f.getName.substring(prefix.length,
            f.getName.length - suffix.length)
          fpShaped.pattern.matcher(mid).matches()
        }
      }
      .foreach(deleteRecursively)
  }

  /** Resolve `parent/<tag>` for a tag-addressed derived store. When the
    * tag's directory does not exist yet — i.e. a NEW generation is about
    * to be materialized — stale sibling generations are GC'd first
    * ([[gcSiblingTags]]); resolutions of an EXISTING generation are pure
    * reads and never delete. Scope of that guarantee: only
    * existing-generation resolves are read-safe — the materialization of
    * a NEW generation deletes the old ones, so a reader still scanning a
    * superseded generation when the source regenerates races that first
    * resolve (same single-writer-at-materialization contract as every
    * derived-store writer). A delete that partially fails is retried at
    * the NEXT generation's materialization (GC removes every non-keep
    * fingerprint, not just the immediately preceding one). */
  def resolveTagged(parent: String, tag: String): String = {
    val dir = new java.io.File(parent, tag)
    if (!dir.isDirectory) gcSiblingTags(new java.io.File(parent), tag)
    s"$parent/$tag"
  }

  /** GC for tag-ADDRESSED derived stores (`parent/<tag>` where tag =
    * `<source-prefix><fingerprint>` and the fingerprint is the trailing
    * hex run — the separator before it is non-hex, so the split is
    * unambiguous): deletes sibling dirs carrying the same prefix with a
    * different fingerprint-shaped tail, i.e. copies keyed to superseded
    * source generations. Run at new-generation materialization
    * ([[resolveTagged]]), same contract as [[gcSiblingStores]]. */
  def gcSiblingTags(parent: java.io.File, keep: String): Unit = {
    val fpLen = keep.reverseIterator
      .takeWhile(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')).length
    if (fpLen == 0 || fpLen >= keep.length) return
    val prefix = keep.substring(0, keep.length - fpLen)
    gcSiblingStores(parent, keep, prefix)
    // an index store's sibling delta dataset (`<tag>.delta` —
    // AnnIndexStore's LSM layout) is keyed by the same tag and must be
    // reclaimed with its store (its non-hex tail hides it from the
    // fingerprint-shaped pass above)
    gcSiblingStores(parent, keep + ".delta", prefix, ".delta")
  }

  /** The one recursive delete every derived-store writer shares —
    * repair correctness depends on deletions actually happening, so
    * hardening must land in exactly one place. */
  private[graft] def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach(deleteRecursively)
    if (f.exists()) f.delete()
  }
}
