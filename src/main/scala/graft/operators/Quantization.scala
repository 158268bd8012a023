package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{BqEncode, BqHamming, ExprBridge, Sq4AsymL2Sq, Sq4Encode, Sq8AsymL2Sq, Sq8Encode, Sq8L2Squared}

/** SQ8 symmetric quantization + the two-stage refine pattern
  * (reference: hybrid_graph.cpp:206-229 quantized candidates,
  * :465-494 exact fp32 re-rank).
  */
object Quantization {

  def sq8Encode(vec: Column, alpha: Column): Column =
    ExprBridge.column(Sq8Encode(ExprBridge.expression(vec), ExprBridge.expression(alpha)))

  def sq8L2Sq(a: Column, b: Column): Column =
    ExprBridge.column(Sq8L2Squared(ExprBridge.expression(a), ExprBridge.expression(b)))

  /** Train α = max |x| over every vector component (reference
    * sq8_sym_quant.hpp:32-59). One tiny stats job; the collected scalar
    * is folded into the encode expression as a literal. */
  def trainAlpha(df: DataFrame, vecCol: String): Double =
    df.agg(max(array_max(transform(col(vecCol), x => abs(x.cast("double"))))))
      .head().getDouble(0)

  /** Add a `code BINARY` column quantizing `vecCol` with the given α. */
  def withCodes(df: DataFrame, vecCol: String, alpha: Double): DataFrame =
    df.withColumn("code", sq8Encode(col(vecCol), lit(alpha)))

  /** Asymmetric SQ8 (reference sq8_quant.hpp:30-63, hnswalg.h:238-297,
    * X4/X8): per-dimension (min, dif) training, uint8 encode
    * `(x - min_d) / dif_d * 255`, and a dequantizing distance that
    * compares raw query floats against dequantized base codes. Returns
    * (mins, difs) as driver-side arrays folded into expressions. */
  def trainAsym(df: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val row = df.select(posexplode(col(vecCol)).as(Seq("d", "x")))
      .groupBy("d").agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .orderBy("d")
      .as[(Int, Double, Double)].collect()
    val mins = row.map(_._2)
    val difs = row.map { case (_, mn, mx) => math.max(mx - mn, 1e-12) }
    (mins, difs)
  }

  /** Per-row asymmetric encode to array<int> codes in [0, 255] (kept as
    * ints — SQL-mirrorable; 4× compression applies at the storage layer). */
  def asymEncode(vec: Column, mins: Array[Double], difs: Array[Double]): Column = {
    val minsC = typedLit(mins)
    val difsC = typedLit(difs)
    zip_with(vec, sequence(lit(0), lit(mins.length - 1)), (x, i) =>
      round(((x.cast("double") - element_at(minsC, i.cast("int") + 1)) /
        element_at(difsC, i.cast("int") + 1)) * 255.0).cast("int"))
  }

  /** Dequantize asymmetric codes back to floats:
    * x̂_d = code_d / 255 · dif_d + min_d. */
  def asymDequantize(code: Column, mins: Array[Double], difs: Array[Double]): Column = {
    val minsC = typedLit(mins)
    val difsC = typedLit(difs)
    zip_with(code, sequence(lit(0), lit(mins.length - 1)), (c, i) =>
      (c.cast("double") / 255.0 * element_at(difsC, i.cast("int") + 1) +
        element_at(minsC, i.cast("int") + 1)).cast("float"))
  }

  /** Dequantizing squared-L2 (X4): raw query floats vs dequantized base
    * codes — the asymmetric comparison the reference's SQ8Quantizer
    * computer performs (distance.hpp:268-301). Native codegen expression
    * (bit-identical to the dequantize+l2Sq chain it replaced, which Spark
    * evaluated as interpreted higher-order functions per pair). */
  def asymDistance(qvec: Column, code: Column, mins: Array[Double], difs: Array[Double]): Column =
    ExprBridge.column(Sq8AsymL2Sq(ExprBridge.expression(qvec),
      ExprBridge.expression(code),
      ExprBridge.expression(typedLit(mins)), ExprBridge.expression(typedLit(difs))))

  /** SQ4 (X5): per-dim (min, dif) training shared with [[trainAsym]];
    * codes are 4-bit, two dims packed per byte (8× compression). */
  def sq4Encode(vec: Column, mins: Array[Double], difs: Array[Double]): Column =
    ExprBridge.column(Sq4Encode(ExprBridge.expression(vec),
      ExprBridge.expression(typedLit(mins)), ExprBridge.expression(typedLit(difs))))

  /** Dequantizing squared-L2 against packed SQ4 codes (X5 distance). */
  def sq4AsymDistance(qvec: Column, code: Column,
      mins: Array[Double], difs: Array[Double]): Column =
    ExprBridge.column(Sq4AsymL2Sq(ExprBridge.expression(qvec),
      ExprBridge.expression(code),
      ExprBridge.expression(typedLit(mins)), ExprBridge.expression(typedLit(difs))))

  /** Packed sign-bit (1-bit) code of a float vector — 32× compression;
    * bit d = x_d > 0 (see [[org.apache.spark.sql.graft.BqEncode]]). */
  def bqEncode(vec: Column): Column =
    ExprBridge.column(BqEncode(ExprBridge.expression(vec)))

  /** XOR-popcount Hamming distance over packed sign-bit codes. */
  def bqHamming(a: Column, b: Column): Column =
    ExprBridge.column(BqHamming(ExprBridge.expression(a), ExprBridge.expression(b)))

  /** Two-stage 1-bit kNN: top-`refineK` candidates by integer Hamming
    * distance over sign-bit codes (no training, no floating point in
    * stage 1 — ranking is engine-exact), then exact fp32 re-rank to
    * top-`k`. The binary-quantization retrieval pattern modern embedding
    * stores use for the first-pass scan; structurally the reference's
    * SQ8 refine path with a 32×-smaller code domain. Codes travel
    * through the shuffle instead of vectors: at 100 TB the candidate
    * stage scans/exchanges 1/32nd of the fp32 bytes. Output:
    * (qid, rank, nid). */
  def bqKnn(base: DataFrame, queries: DataFrame, k: Int, refineK: Int): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    val b = base.withColumn("code", bqEncode(col("vec")))
    val q = queries.withColumn("qcode", bqEncode(col("qvec")))
    val cand = broadcast(q.select(col("qid"), col("qcode")))
      .crossJoin(b.select(col("id"), col("code")))
      .withColumn("hdist", bqHamming(col("qcode"), col("code")).cast("double"))
      .groupBy("qid")
      .agg(TopKAggregate.topkIds(refineK, col("hdist"), col("id")).as("cands"))
      .select(col("qid"), explode(col("cands")).as("id"))
    cand
      .join(q.select(col("qid"), col("qvec")), "qid")
      .join(b.select(col("id"), col("vec")), "id")
      .withColumn("dist", VF.l2Sq(col("qvec"), col("vec")))
      .groupBy("qid")
      .agg(TopKAggregate.topkIds(k, col("dist"), col("id")).as("nb"))
      .select(col("qid"), posexplode(col("nb")).as(Seq("r0", "nid")))
      .select(col("qid"), (col("r0") + 1).cast("long").as("rank"), col("nid"))
  }

  /** Two-stage kNN: top-`refineK` candidates by integer code distance,
    * exact fp32 re-rank to top-`k`. Exactly the reference's quantized
    * brute-force path. Output: (qid, rank, nid).
    *
    * base: (id, vec), queries: (qid, qvec); both get codes with shared α.
    */
  def refineKnn(base: DataFrame, queries: DataFrame, alpha: Double,
      k: Int, refineK: Int): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    val b = withCodes(base, "vec", alpha)
    val q = withCodes(queries, "qvec", alpha).withColumnRenamed("code", "qcode")
    // stage 1: candidates by quantized distance (int, deterministic)
    val cand = broadcast(q).crossJoin(b.select(col("id"), col("code")))
      .withColumn("qdist", sq8L2Sq(col("qcode"), col("code")).cast("double"))
      .groupBy("qid")
      .agg(TopKAggregate.topkIds(refineK, col("qdist"), col("id")).as("cands"))
      .select(col("qid"), explode(col("cands")).as("id"))
    // stage 2: exact re-rank of the candidate set only
    cand
      .join(q.select(col("qid"), col("qvec")), "qid")
      .join(b.select(col("id"), col("vec")), "id")
      .withColumn("dist", VF.l2Sq(col("qvec"), col("vec")))
      .groupBy("qid")
      .agg(TopKAggregate.topkIds(k, col("dist"), col("id")).as("nb"))
      .select(col("qid"), posexplode(col("nb")).as(Seq("r0", "nid")))
      .select(col("qid"), (col("r0") + 1).cast("long").as("rank"), col("nid"))
  }
}
