package graft.index

import org.scalatest.funsuite.AnyFunSuite

class TsIndexSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(17)
  private val ts = Array.fill(500)(rnd.nextDouble())
  private val idx = new TsIndex(ts)

  test("count/coverage match the linear scan on random ranges") {
    for (_ <- 1 to 50) {
      val a = rnd.nextDouble(); val b = rnd.nextDouble()
      val (l, r) = (math.min(a, b), math.max(a, b))
      val want = ts.count(t => t >= l && t <= r)
      assert(idx.count(l, r) == want, s"[$l,$r]")
      assert(idx.coverage(l, r) == want.toDouble / ts.length)
    }
    assert(idx.count(2.0, 3.0) == 0)
    assert(idx.count(0.5, 0.1) == 0)
  }

  test("seeds are in-range, distinct-position, and at most n") {
    for (_ <- 1 to 20) {
      val l = rnd.nextDouble() * 0.8
      val r = l + 0.15
      val s = idx.seeds(l, r, 10)
      assert(s.length <= 10)
      assert(s.forall(i => ts(i) >= l && ts(i) <= r))
      if (idx.count(l, r) >= 10) assert(s.length == 10)
    }
    assert(idx.seeds(2.0, 3.0, 10).isEmpty)
  }

  test("inRange returns exactly the matching ids") {
    val l = 0.2; val r = 0.4
    val got = idx.inRange(l, r).toSet
    val want = ts.indices.filter(i => ts(i) >= l && ts(i) <= r).toSet
    assert(got == want)
  }

  test("duplicate timestamps: boundary values all included") {
    val dup = new TsIndex(Array(0.3, 0.3, 0.3, 0.7, 0.7))
    assert(dup.count(0.3, 0.3) == 3)
    assert(dup.count(0.3, 0.7) == 5)
    assert(dup.inRange(0.7, 0.7).toSet == Set(3, 4))
    assert(dup.seeds(0.3, 0.3, 2).forall(i => i < 3))
  }

  test("empty index") {
    val e = new TsIndex(Array.empty[Double])
    assert(e.count(0.0, 1.0) == 0)
    assert(e.coverage(0.0, 1.0) == 1.0)
    assert(e.inRange(0.0, 1.0).isEmpty)
    assert(e.seeds(0.0, 1.0, 5).isEmpty)
  }
}
