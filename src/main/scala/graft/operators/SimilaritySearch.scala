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
