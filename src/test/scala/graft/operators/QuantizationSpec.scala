package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(5)
  private def vec(): Array[Float] = Array.fill(16)(rnd.nextFloat() * 4 - 2)

  private lazy val data = Seq.tabulate(200)(i => (i.toLong, vec())).toDF("id", "vec")

  test("trainAlpha is the global max |x|") {
    val alpha = Quantization.trainAlpha(data, "vec")
    val expected = data.collect().flatMap(_.getSeq[Float](1)).map(x => math.abs(x.toDouble)).max
    assert(alpha == expected)
  }

  test("encode round-trip error is bounded by alpha/127 per component") {
    val alpha = Quantization.trainAlpha(data, "vec")
    val rows = Quantization.withCodes(data, "vec", alpha).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val c = r.getAs[Array[Byte]](2)
      assert(c.length == v.length)
      v.zip(c).foreach { case (x, b) =>
        val decoded = b.toDouble / 127.0 * alpha
        assert(math.abs(decoded - x) <= alpha / 127.0 + 1e-9, s"x=$x b=$b")
      }
    }
  }

  test("refineKnn with refineK = N equals exact kNN") {
    val alpha = Quantization.trainAlpha(data, "vec")
    val qs = data.filter($"id" % 40 === 0).select($"id".as("qid"), $"vec".as("qvec"))
    val approx = Quantization.refineKnn(data, qs, alpha, k = 5, refineK = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = KnnJoin.exactFlat(
      data.withColumn("label", lit(0L)).withColumn("ts", lit(0.0)),
      qs.withColumn("qtype", lit(0)).withColumn("v", lit(0L))
        .withColumn("l", lit(0.0)).withColumn("r", lit(0.0)),
      5).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(approx == exact)
  }

  test("asymmetric SQ8: encode range, round-trip bound, distance approximates exact") {
    val (mins, difs) = Quantization.trainAsym(data, "vec")
    assert(mins.length == 16 && difs.forall(_ > 0))
    val enc = data.withColumn("code", Quantization.asymEncode($"vec", mins, difs))
    val rows = enc.collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val c = r.getSeq[Int](2)
      assert(c.forall(x => x >= 0 && x <= 255))
      v.zip(c).zipWithIndex.foreach { case ((x, code), d) =>
        val dec = code.toDouble / 255.0 * difs(d) + mins(d)
        assert(math.abs(dec - x) <= difs(d) / 255.0 + 1e-9)
      }
    }
    // dequantizing distance ≈ exact distance
    val q = data.filter($"id" === 0).select($"vec".as("qvec")).crossJoin(enc.limit(50))
    val cmp = q.select(
      graft.functions.VectorFunctions.l2Sq($"qvec", $"vec").as("exact"),
      Quantization.asymDistance($"qvec", $"code", mins, difs).as("approx")).collect()
    cmp.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.05 * (r.getDouble(0) + 1.0))
    }
  }

  test("Sq8AsymL2Sq codegen is bit-identical to the interpreted dequantize+l2Sq chain") {
    val (mins, difs) = Quantization.trainAsym(data, "vec")
    val enc = data.withColumn("code", Quantization.asymEncode($"vec", mins, difs))
    val q = data.filter($"id" < 5).select($"id".as("qid"), $"vec".as("qvec")).crossJoin(enc)
    val cmp = q.select(
      Quantization.asymDistance($"qvec", $"code", mins, difs).as("native"),
      graft.functions.VectorFunctions.l2Sq(
        $"qvec", Quantization.asymDequantize($"code", mins, difs)).as("chain")).collect()
    assert(cmp.nonEmpty)
    cmp.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native=${r.getDouble(0)} chain=${r.getDouble(1)}")
    }
  }

  test("SQ4: packed length, nibble order, round-trip bound, distance approximates exact") {
    val (mins, difs) = Quantization.trainAsym(data, "vec")
    val coded = data.withColumn("code", Quantization.sq4Encode($"vec", mins, difs))
    val rows = coded.select($"vec", $"code").collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0).toArray
      val code = r.getAs[Array[Byte]](1)
      assert(code.length == (v.length + 1) / 2)
      v.indices.foreach { d =>
        val nib = if ((d & 1) == 0) code(d >> 1) & 0xF else (code(d >> 1) >> 4) & 0xF
        assert(nib >= 0 && nib <= 15)
        val xhat = nib / 15.0 * difs(d) + mins(d)
        // half-step quantization error bound
        assert(math.abs(xhat - v(d)) <= difs(d) / 30.0 + 1e-6,
          s"dim $d: x=${v(d)} xhat=$xhat dif=${difs(d)}")
      }
    }
    // dequantizing distance tracks the exact distance within quant error
    val q = data.limit(1).select($"vec".as("qvec")).crossJoin(coded)
      .withColumn("approx", Quantization.sq4AsymDistance($"qvec", $"code", mins, difs))
      .withColumn("exact", graft.functions.VectorFunctions.l2Sq($"qvec", $"vec"))
      .select($"approx", $"exact").collect()
    val dim = 16
    val worst = difs.max / 30.0 * 2  // per-dim error doubles in the difference
    q.foreach { r =>
      val bound = dim * (worst * worst + 2 * worst * math.sqrt(r.getDouble(1) / dim + 1e-9)) + 1e-6
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= bound * 4,
        s"approx=${r.getDouble(0)} exact=${r.getDouble(1)}")
    }
  }

  test("BQ: packed sign bits, Hamming ≡ per-dim sign disagreement count") {
    val coded = data
      .withColumn("code", Quantization.bqEncode($"vec"))
      .select($"vec", $"code").collect()
    coded.foreach { r =>
      val v = r.getSeq[Float](0).toArray
      val code = r.getAs[Array[Byte]](1)
      assert(code.length == (v.length + 7) / 8)
      v.indices.foreach { d =>
        val bit = (code(d >> 3) >> (d & 7)) & 1
        assert((bit == 1) == (v(d) > 0f), s"dim $d x=${v(d)} bit=$bit")
      }
    }
    // hamming over codes == direct sign-disagreement count over floats
    val a = data.withColumn("ca", Quantization.bqEncode($"vec"))
      .select($"id".as("ia"), $"vec".as("va"), $"ca")
    val b = data.withColumn("cb", Quantization.bqEncode($"vec"))
      .select($"id".as("ib"), $"vec".as("vb"), $"cb")
    val cmp = a.crossJoin(b).filter($"ia" < $"ib").limit(500)
      .select($"va", $"vb", Quantization.bqHamming($"ca", $"cb").as("h")).collect()
    assert(cmp.nonEmpty)
    cmp.foreach { r =>
      val va = r.getSeq[Float](0)
      val vb = r.getSeq[Float](1)
      val want = va.zip(vb).count { case (x, y) => (x > 0f) != (y > 0f) }
      assert(r.getInt(2) == want)
    }
  }

  test("BQ: unequal-length codes count unpaired bytes against the pad") {
    val df = Seq(
      (Array(1f, -1f, 1f, -1f, 1f, -1f, 1f, -1f, 1f, 1f, 1f), // 11 dims → 2 bytes
       Array(1f, -1f, 1f, -1f, 1f, -1f, 1f, -1f))             // 8 dims → 1 byte
    ).toDF("a", "b")
    val h = df.select(Quantization.bqHamming(
      Quantization.bqEncode($"a"), Quantization.bqEncode($"b"))).head().getInt(0)
    // first 8 dims agree; dims 8-10 are positive bits with no pair → 3
    assert(h == 3)
  }

  test("bqKnn with refineK = N equals exact kNN") {
    val qs = data.filter($"id" % 40 === 0).select($"id".as("qid"), $"vec".as("qvec"))
    val approx = Quantization.bqKnn(data, qs, k = 5, refineK = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = KnnJoin.exactFlat(
      data.withColumn("label", lit(0L)).withColumn("ts", lit(0.0)),
      qs.withColumn("qtype", lit(0)).withColumn("v", lit(0L))
        .withColumn("l", lit(0.0)).withColumn("r", lit(0.0)),
      5).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(approx == exact)
  }

  test("refineKnn recall@5 with narrow refineK stays high") {
    val alpha = Quantization.trainAlpha(data, "vec")
    val qs = data.filter($"id" % 20 === 0).select($"id".as("qid"), $"vec".as("qvec"))
    val approx = Quantization.refineKnn(data, qs, alpha, k = 5, refineK = 15)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val exact = KnnJoin.exactFlat(
      data.withColumn("label", lit(0L)).withColumn("ts", lit(0.0)),
      qs.withColumn("qtype", lit(0)).withColumn("v", lit(0L))
        .withColumn("l", lit(0.0)).withColumn("r", lit(0.0)),
      5).collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = exact.map { case (qid, want) =>
      approx.get(qid).map(got => got.intersect(want).size.toDouble / want.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall $mean")
  }
}
