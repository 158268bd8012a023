package graft.index

/** Minimal growable primitive int list (adjacency storage — avoids the
  * Integer boxing of ArrayBuffer[Int] in the graph hot loops). */
private[index] final class IntList(initCap: Int) extends Serializable {
  private var buf = new Array[Int](math.max(initCap, 4))
  private var n = 0

  def length: Int = n
  def apply(i: Int): Int = buf(i)

  /** Backing array (valid through `length`) — zero-copy hot-loop reads. */
  def raw: Array[Int] = buf

  def +=(x: Int): Unit = {
    if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n * 2)
    buf(n) = x
    n += 1
  }

  def contains(x: Int): Boolean = {
    var i = 0
    while (i < n) { if (buf(i) == x) return true; i += 1 }
    false
  }
}
