package graft.index

import org.scalatest.funsuite.AnyFunSuite

class EfTunerSpec extends AnyFunSuite {

  private val dim = 24
  private def freshIndex(n: Int): (HnswIndex, Array[Array[Float]]) = {
    val rnd = new scala.util.Random(11)
    val data = Array.fill(n)(Array.fill(dim)(rnd.nextFloat()))
    val idx = new HnswIndex(dim, m = 8, efConstruction = 100)
    data.foreach(idx.add)
    (idx, data)
  }

  test("chosen ef meets the target recall and is the smallest passing rung") {
    val (idx, data) = freshIndex(3000)
    val sample = data.take(50)
    val res = EfTuner.tune(idx, sample, k = 10, targetRecall = 0.9,
      ladder = Seq(16, 32, 64, 128, 256))
    val chosenRung = res.rungs.find(_.ef == res.chosenEf).get
    assert(chosenRung.recall >= 0.9)
    // every earlier rung failed the target (else it would have been chosen)
    assert(res.rungs.takeWhile(_.ef != res.chosenEf).forall(_.recall < 0.9))
    // measurement stops at the first passing rung
    assert(res.rungs.last.ef == res.chosenEf)
  }

  test("deterministic: same index + sample tunes identically twice") {
    val (idx, data) = freshIndex(1500)
    val sample = data.slice(100, 130)
    val a = EfTuner.tune(idx, sample, k = 5, targetRecall = 0.95)
    val b = EfTuner.tune(idx, sample, k = 5, targetRecall = 0.95)
    assert(a == b)
  }

  test("unreachable target falls back to the ladder max with all rungs measured") {
    val (idx, data) = freshIndex(800)
    val res = EfTuner.tune(idx, data.take(20), k = 10, targetRecall = 1.01,
      ladder = Seq(16, 32))
    assert(res.chosenEf == 32 && res.rungs.map(_.ef) == Seq(16, 32))
  }
}
