package graft.operators

/** Run INDEPENDENT Spark actions concurrently from a bounded thread
  * pool (optimization guide §2.6: the scheduler happily runs several
  * jobs at once inside one application — actions are only sequential
  * because driver code calls them sequentially). The lifecycle
  * operators use it to overlap per-family index builds/commits: each
  * family writes its own directory tree, so the only shared state is
  * the Spark scheduler itself, and FIFO scheduling back-fills
  * executors freed by one job's straggler tail with the next job's
  * tasks. This matters at every scale — at bench scale the fixed
  * per-job overhead of N sequential tiny jobs collapses to
  * max-of-N, and at cluster scale the tails overlap.
  *
  * Failure contract: every task runs to completion or failure (no
  * half-cancelled siblings racing a caller's cleanup), then the FIRST
  * failure is rethrown — same observable outcome as the sequential
  * loop for a single failing family.
  */
private[graft] object Par {

  def run(tasks: Seq[() => Unit]): Unit = {
    if (tasks.sizeIs <= 1) { tasks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(tasks.size, 8))
    try {
      val futs = tasks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = t()
        })
      }
      var first: Throwable = null
      futs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (first == null) first = e.getCause
        }
      }
      if (first != null) throw first
    } finally pool.shutdown()
  }
}
