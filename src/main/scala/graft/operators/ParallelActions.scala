package graft.operators

/** Overlap INDEPENDENT Spark actions from driver threads (guide-§2.6
  * shape: the scheduler happily runs several jobs at once; actions are
  * only sequential because driver code calls them sequentially). Used
  * for the store-build pre-passes, where 3-4 builds each use a handful
  * of tasks on a 32-core session and serial invocation leaves the
  * machine mostly idle. Failures propagate after all threads finish:
  * fatal throwables first, then the first non-fatal by action order,
  * with the rest suppressed onto the thrown one — so a build error
  * surfaces exactly as it did serially and no half-started sibling is
  * abandoned mid-write without its own exception. */
object ParallelActions {

  def runAll(actions: Seq[() => Unit]): Unit = {
    if (actions.lengthCompare(1) <= 0) { actions.foreach(_.apply()); return }
    val errs = new Array[Throwable](actions.length)
    val threads = actions.zipWithIndex.map { case (a, i) =>
      val t = new Thread(() => {
        try a()
        catch { case e: Throwable => errs(i) = e }
      }, s"graft-build-$i")
      t.setDaemon(true)
      t.start()
      t
    }
    threads.foreach(_.join())
    val all = errs.filter(_ != null)
    // fatal throwables (VirtualMachineError & co.) rethrow
    // PREFERENTIALLY — a later thread's OOM must never be masked by a
    // benign first error; ties and the non-fatal case keep action
    // order. Every other captured throwable rides along as a
    // suppressed exception so no failure is silently dropped.
    val primary = all.find(!scala.util.control.NonFatal(_)).orElse(all.headOption)
    primary.foreach { e =>
      all.foreach(o => if (!(o eq e)) e.addSuppressed(o))
      throw e
    }
  }
}
