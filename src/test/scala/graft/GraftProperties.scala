package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.graft.{Sq8Encode, TopKHeap}
import graft.functions.TextFunctions
import graft.index.HnswIndex

/** ScalaCheck property suite for the pure (non-Spark) kernels — the
  * property-based layer of the test plan (SURVEY §5): top-k ≡ sort.take,
  * quantizer bounds, tokenizer algebra, hash ranges, index invariants.
  */
object GraftProperties extends Properties("graft") {

  private val distId = Gen.zip(Gen.chooseNum(0.0, 100.0), Gen.chooseNum(-1000L, 1000L))

  property("TopKHeap equals sorted take(k)") =
    forAll(Gen.listOf(distId), Gen.chooseNum(1, 20)) { (xs, k) =>
      val h = new TopKHeap(k)
      xs.foreach { case (d, i) => h.insert(d, i) }
      h.sortedPairs.toSeq == xs.sorted.take(k)
    }

  property("TopKHeap split-merge equals global") =
    forAll(Gen.listOf(distId), Gen.chooseNum(1, 15), Gen.chooseNum(0, 100)) { (xs, k, cut) =>
      val (a, b) = xs.splitAt(cut % (xs.length + 1))
      val ha = new TopKHeap(k); a.foreach { case (d, i) => ha.insert(d, i) }
      val hb = new TopKHeap(k); b.foreach { case (d, i) => hb.insert(d, i) }
      ha.mergeFrom(hb)
      val g = new TopKHeap(k); xs.foreach { case (d, i) => g.insert(d, i) }
      ha.sortedPairs.toSeq == g.sortedPairs.toSeq
    }

  property("TopKHeap serialization round-trips") =
    forAll(Gen.listOf(distId), Gen.chooseNum(1, 10)) { (xs, k) =>
      val h = new TopKHeap(k)
      xs.foreach { case (d, i) => h.insert(d, i) }
      TopKHeap.deserialize(k, h.serialize()).sortedPairs.toSeq == h.sortedPairs.toSeq
    }

  property("Sq8 encode stays in [-127, 127] and bounds error by alpha/127") =
    forAll(Gen.chooseNum(-10.0f, 10.0f), Gen.chooseNum(0.1, 10.0)) { (x, alpha) =>
      val c = Sq8Encode.encodeOne(x, alpha)
      val decoded = c.toDouble / 127.0 * alpha
      val clamped = math.max(-alpha, math.min(alpha, x.toDouble))
      c >= -127 && c <= 127 && math.abs(decoded - clamped) <= alpha / 127.0 + 1e-9
    }

  property("tokenizer: concatenation with single space is token append") =
    forAll(Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty)), Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty))) { (a, b) =>
      val sa = a.mkString(" "); val sb = b.mkString(" ")
      TextFunctions.tokenizeJvm(sa + " " + sb).toSeq ==
        TextFunctions.tokenizeJvm(sa).toSeq ++ TextFunctions.tokenizeJvm(sb).toSeq
    }

  property("hash28 is within 28 bits and deterministic") =
    forAll(Gen.asciiPrintableStr) { s =>
      val h = TextFunctions.hash28Jvm(s)
      h >= 0 && h < (1L << 28) && h == TextFunctions.hash28Jvm(s)
    }

  property("shingles count is max(0, tokens - n + 1)") =
    forAll(Gen.listOf(Gen.alphaStr.suchThat(_.nonEmpty)), Gen.chooseNum(1, 5)) { (toks, n) =>
      val sh = TextFunctions.shinglesJvm(toks.toArray, n)
      sh.length == math.max(0, toks.length - n + 1)
    }

  property("winnow fingerprints are a subset of k-gram hashes") =
    forAll(Gen.asciiPrintableStr) { s =>
      val fps = TextFunctions.winnowJvm(s, 4, 3).toSet
      val all = (0 to math.max(s.length - 4, -1))
        .map(i => TextFunctions.hash28Jvm(s.substring(i, i + 4))).toSet
      fps.subsetOf(all)
    }

  private val smallVecs = Gen.listOfN(60, Gen.listOfN(6, Gen.chooseNum(-1.0f, 1.0f)))

  property("HNSW search returns valid ids ordered by (dist, id)") =
    forAll(smallVecs, Gen.listOfN(6, Gen.chooseNum(-1.0f, 1.0f))) { (vs, q) =>
      val idx = new HnswIndex(6, m = 8, efConstruction = 32)
      vs.foreach(v => idx.add(v.toArray))
      val res = idx.search(q.toArray, 10, 32)
      val idsValid = res.forall { case (id, _) => id >= 0 && id < vs.length }
      val ordered = res.sliding(2).forall {
        case Array((i1, d1), (i2, d2)) => d1 < d2 || (d1 == d2 && i1 < i2)
        case _ => true
      }
      idsValid && ordered
    }

  property("HNSW with k >= size returns everything (full recall at exhaustive ef)") =
    forAll(Gen.listOfN(25, Gen.listOfN(4, Gen.chooseNum(-1.0f, 1.0f)))) { vs =>
      val idx = new HnswIndex(4, m = 8, efConstruction = 64)
      vs.foreach(v => idx.add(v.toArray))
      val res = idx.search(Array.fill(4)(0f), vs.length, 200)
      res.map(_._1).toSet == vs.indices.toSet
    }

  property("NearestCentroids.topk equals brute-force argsort by (dist, index)") =
    forAll(
      Gen.listOfN(4, Gen.chooseNum(-1.0f, 1.0f)),
      Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n * 4, Gen.chooseNum(-1.0f, 1.0f))),
      Gen.chooseNum(1, 6)) { (v, centsFlat, k) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val vec = new GenericArrayData(v.toArray)
      val cents = new GenericArrayData(centsFlat.toArray)
      val got = org.apache.spark.sql.graft.NearestCentroids
        .topk(vec, cents, k).toIntArray.toSeq
      val n = centsFlat.length / 4
      val dists = Array.tabulate(n) { c =>
        val d = (0 until 4).map { i =>
          val df = v(i).toDouble - centsFlat(c * 4 + i).toDouble; df * df
        }.sum
        (d, c)
      }
      val want = dists.sortBy(identity).take(math.min(k, n)).map(_._2).toSeq
      got == want
    }

  property("lloydKMeans is deterministic and returns min(k, n) centroids of dim d") =
    forAll(
      Gen.chooseNum(1, 30).flatMap(n =>
        Gen.listOfN(n, Gen.listOfN(5, Gen.chooseNum(-1.0f, 1.0f)))),
      Gen.chooseNum(1, 8)) { (pts, k) =>
      val arr = pts.map(_.toArray).toArray
      val a = graft.operators.SimilaritySearch.lloydKMeans(arr, k, 5, seed = 3L)
      val b = graft.operators.SimilaritySearch.lloydKMeans(arr, k, 5, seed = 3L)
      a.length == math.min(k, arr.length) &&
        a.forall(_.length == 5) &&
        a.zip(b).forall { case (x, y) => x.sameElements(y) }
    }

  property("TextHashUtil.hash60 equals the hex-parse twin for any string") =
    forAll(Gen.chooseNum(0, 997), Gen.asciiPrintableStr, Gen.alphaNumStr) { (seed, s, extra) =>
      val str = s + extra
      val prefix = (seed.toString + ":").getBytes("UTF-8")
      org.apache.spark.sql.graft.TextHashUtil.hash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(str), prefix) ==
        TextFunctions.hash60Jvm(s"$seed:$str")
    }

  property("TextHashUtil.simhash equals the per-bit-majority reference") =
    forAll(Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue)),
        Gen.oneOf(1, 13, 48, 60)) { (hs, bits) =>
      val ref = (0 until bits).foldLeft(0L) { (acc, b) =>
        val sum = hs.map(h => ((h >>> b) & 1L) * 2 - 1).sum
        if (sum > 0) acc | (1L << b) else acc
      }
      org.apache.spark.sql.graft.TextHashUtil.simhash(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(hs.toArray), bits) == ref
    }

  property("simhashBlocks at <= 60 bits concatenates to exactly simhash") =
    forAll(Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue)),
        Gen.oneOf((48, 4), (60, 6), (60, 4), (36, 3))) { (hs, cfg) =>
      val (bits, blocks) = cfg
      val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(hs.toArray)
      val blk = org.apache.spark.sql.graft.TextHashUtil.simhashBlocks(ad, bits, blocks)
      val w = bits / blocks
      val packed = (0 until blocks).foldLeft(0L) { (acc, c) =>
        acc | (blk.getLong(c) << (c * w))
      }
      packed == org.apache.spark.sql.graft.TextHashUtil.simhash(ad, bits)
    }

  property("wide simhashBlocks matches the per-bit-majority reference over derived words") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue)),
        Gen.oneOf((120, 6), (120, 8), (96, 4))) { (hs, cfg) =>
      val (bits, blocks) = cfg
      val u = org.apache.spark.sql.graft.TextHashUtil
      def word(h: Long, wi: Int): Long = if (wi == 0) h else u.mix64(h + wi)
      val w = bits / blocks
      val ref = new Array[Long](blocks)
      for (b <- 0 until bits) {
        val sum = hs.map(h => ((word(h, b / 60) >>> (b % 60)) & 1L) * 2 - 1).sum
        if (sum > 0) ref(b / w) |= 1L << (b % w)
      }
      val got = u.simhashBlocks(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(hs.toArray), bits, blocks)
      (0 until blocks).forall(i => got.getLong(i) == ref(i))
    }

  property("blockHamming equals summed xor popcounts") =
    forAll(Gen.listOf(Gen.zip(Gen.chooseNum(Long.MinValue, Long.MaxValue),
        Gen.chooseNum(Long.MinValue, Long.MaxValue)))) { ps =>
      val a = new org.apache.spark.sql.catalyst.util.GenericArrayData(ps.map(_._1).toArray)
      val b = new org.apache.spark.sql.catalyst.util.GenericArrayData(ps.map(_._2).toArray)
      org.apache.spark.sql.graft.TextHashUtil.blockHamming(a, b) ==
        ps.map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum
    }
}
