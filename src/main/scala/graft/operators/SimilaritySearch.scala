package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}

/** Similarity search over embedding columns.
  *
  * Two paths:
  *  - brute-force cosine top-k: the exact baseline (streams the base
  *    once, partial top-k per partition, no base shuffle);
  *  - signed-random-projection LSH: deterministic seeded hyperplanes
  *    give every row a bucket signature; candidates are bucket
  *    collisions (with 1-bit-flip multi-probe), re-ranked exactly.
  *    The scale path — candidate count ≈ N/2^planes × probes per query.
  */
object SimilaritySearch {

  /** Exact cosine top-k: (qid, rank, nid), rank by (cos desc, id asc),
    * self-matches excluded when ids collide. */
  def bruteForceCosineTopK(base: DataFrame, queries: DataFrame, k: Int): DataFrame =
    broadcast(queries).crossJoin(base)
      .filter(col("id") =!= col("qid"))
      .withColumn("negcos", -VF.cosineSim(col("qvec"), col("vec")))
      .groupBy("qid")
      .agg(TopKAggregate.topkIds(k, col("negcos"), col("id")).as("nb"))
      .select(col("qid"), posexplode(col("nb")).as(Seq("r0", "nid")))
      .select(col("qid"), (col("r0") + 1).cast("long").as("rank"), col("nid"))

  /** Deterministic Gaussian hyperplanes. */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long = 7L): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Signed-random-projection signature: bit j = (vec · plane_j) > 0. */
  def srpSignature(vec: Column, planes: Array[Array[Float]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(VF.dot(vec, typedLit(p)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF (inverted-file) approximate kNN: MLlib KMeans centroids as the
    * coarse quantizer — base rows are assigned to their nearest centroid
    * ("list"); each query probes only its `nprobe` nearest lists and
    * exact-ranks the candidates. The classic IVF-Flat layout, fully
    * DataFrame-native: the only joins are query→list (broadcast) and
    * the bounded top-k merge. At scale the list assignment is a
    * persisted clustered layout (write `partitionBy("list")` once) and
    * probing prunes partitions exactly like [[graft.operators.Layouts]].
    *
    * base: (id, vec); queries: (qid, qvec) → (qid, rank, nid). */
  def ivfKnn(base: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 7L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val spark = base.sparkSession
    val feat = base.withColumn("fv", array_to_vector(col("vec").cast("array<double>")))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("fv").setPredictionCol("list")
      .fit(feat)
    val assigned = model.transform(feat)
      .select(col("id"), col("vec"), col("list"))
    val centroids = model.clusterCenters.map(_.toArray.map(_.toFloat))
    // nprobe nearest lists per query, computed as expressions over the
    // (small) centroid table folded in as literals
    val listDists = centroids.zipWithIndex.map { case (c, i) =>
      struct(VF.l2Sq(col("qvec"), typedLit(c)).as("d"), lit(i).as("list"))
    }
    val probed = queries
      .withColumn("probes",
        slice(array_sort(array(listDists: _*)), 1, nprobe))
      .select(col("qid"), col("qvec"), explode(col("probes.list")).as("list"))
    broadcast(probed).join(assigned, "list")
      .filter(col("id") =!= col("qid"))
      .withColumn("dist", VF.l2Sq(col("qvec"), col("vec")))
      .groupBy("qid")
      .agg(TopKAggregate.topkIds(k, col("dist"), col("id")).as("nb"))
      .select(col("qid"), posexplode(col("nb")).as(Seq("r0", "nid")))
      .select(col("qid"), (col("r0") + 1).cast("long").as("rank"), col("nid"))
  }

  /** LSH-bucketed approximate cosine top-k: (qid, rank, nid).
    * Candidates: rows whose signature matches the query's, or differs in
    * exactly one of the probed bits; exact cosine re-rank. */
  def lshCosineTopK(base: DataFrame, queries: DataFrame, k: Int,
      numPlanes: Int = 12, seed: Long = 7L): DataFrame = {
    val dim = base.select(size(col("vec"))).head.getInt(0)
    val planes = randomPlanes(numPlanes, dim, seed)
    val b = base.withColumn("bucket", srpSignature(col("vec"), planes))
    val probes = lit(0L) +: (0 until numPlanes).map(j => lit(1L << j))
    val q = broadcast(
      queries.withColumn("sig", srpSignature(col("qvec"), planes))
        .withColumn("probe", explode(array(probes: _*)))
        .withColumn("bucket", expr("sig ^ probe"))
        .select(col("qid"), col("qvec"), col("bucket")))
    q.join(b, "bucket")
      .filter(col("id") =!= col("qid"))
      .withColumn("negcos", -VF.cosineSim(col("qvec"), col("vec")))
      .groupBy("qid")
      .agg(TopKAggregate.topkIds(k, col("negcos"), col("id")).as("nb"))
      .select(col("qid"), posexplode(col("nb")).as(Seq("r0", "nid")))
      .select(col("qid"), (col("r0") + 1).cast("long").as("rank"), col("nid"))
  }
}
