package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{AnnTopKStrategy, CosineSimilarity, InnerProduct, L2SquaredDistance, Sq4AsymL2Sq, Sq4Encode, Sq8Encode, Sq8L2Squared, VectorNorm}

/** Session-extension registration of the engine's native expressions —
  * enables `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), after which the functions
  * are available in plain SQL text in every session:
  *
  *   SELECT id FROM base ORDER BY l2_sq(vec, :qvec) LIMIT 100
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def fn(name: String, usage: String, builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name, usage), builder)

  private def foldableInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal integer")
    e.eval(null) match {
      case i: Int  => i
      case l: Long => l.toInt
      case other   => throw new IllegalArgumentException(s"$what must be integral, got $other")
    }
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(fn("l2_sq", "squared L2 distance of two float arrays",
      es => L2SquaredDistance(es(0), es(1))))
    e.injectFunction(fn("vec_dot", "inner product of two float arrays",
      es => InnerProduct(es(0), es(1))))
    e.injectFunction(fn("cosine_sim", "cosine similarity of two float arrays",
      es => CosineSimilarity(es(0), es(1))))
    e.injectFunction(fn("vec_norm", "L2 norm of a float array",
      es => VectorNorm(es(0))))
    e.injectFunction(fn("sq8_encode", "SQ8-symmetric int8 encoding of a float array",
      es => Sq8Encode(es(0), es(1))))
    e.injectFunction(fn("sq8_l2_sq", "integer squared L2 over SQ8 codes",
      es => Sq8L2Squared(es(0), es(1))))
    e.injectFunction(fn("sq4_encode", "packed 4-bit asymmetric encoding of a float array",
      es => Sq4Encode(es(0), es(1), es(2))))
    e.injectFunction(fn("sq4_asym_l2_sq", "dequantizing squared L2 over packed SQ4 codes",
      es => Sq4AsymL2Sq(es(0), es(1), es(2), es(3))))
    e.injectFunction(fn("bq_encode", "packed sign-bit (1-bit) encoding of a float array",
      es => org.apache.spark.sql.graft.BqEncode(es(0))))
    e.injectFunction(fn("bq_hamming", "XOR-popcount Hamming distance of two sign-bit codes",
      es => org.apache.spark.sql.graft.BqHamming(es(0), es(1))))
    e.injectFunction(fn("nearest_centroids", "k nearest centroid indices in a flat matrix",
      es => org.apache.spark.sql.graft.NearestCentroids(es(0), es(1), es(2))))
    e.injectFunction(fn("md5_hash60", "60-bit seeded md5 hash of a string",
      es => org.apache.spark.sql.graft.Md5Hash60(es(0), foldableInt(es(1), "seed"))))
    e.injectFunction(fn("simhash_from_hashes", "per-bit-majority SimHash of a bigint array",
      es => org.apache.spark.sql.graft.SimHashFromHashes(es(0), foldableInt(es(1), "bits"))))
    e.injectFunction(fn("array_eq_count", "count of positions where two bigint arrays agree",
      es => org.apache.spark.sql.graft.ArrayEqCount(es(0), es(1))))
    e.injectFunction(fn("simhash_blocks", "wide SimHash of a bigint array as block values",
      es => org.apache.spark.sql.graft.SimHashBlocks(es(0),
        foldableInt(es(1), "bits"), foldableInt(es(2), "blocks"))))
    e.injectFunction(fn("block_hamming", "Hamming distance of two block-value fingerprints",
      es => org.apache.spark.sql.graft.BlockHamming(es(0), es(1))))
    e.injectFunction(fn("gopher_stats", "9-slot Gopher quality-rule statistics of a document",
      es => org.apache.spark.sql.graft.GopherStats(es(0))))
    e.injectFunction(fn("classifier_milli_sum",
      "hashed-linear classifier milli-weight sum over a token array",
      es => org.apache.spark.sql.graft.ClassifierMilliSum(es(0),
        foldableInt(es(1), "dim"))))
    // `ORDER BY l2_sq(vec, :qvec) LIMIT k` over an AnnCatalog-registered
    // table auto-routes to the bucketed HNSW index (SURVEY §4's optional
    // AnnJoinStrategy). Opt-out: spark.graft.ann.autoRoute=false.
    e.injectPlannerStrategy(session => AnnTopKStrategy(session))
  }
}
