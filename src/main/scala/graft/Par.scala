package graft

/** Overlap INDEPENDENT Spark actions from the driver (optimization
  * guide §2.6): Spark's scheduler happily runs several jobs at once
  * inside one application — actions are only sequential because
  * driver code calls them sequentially. An index build's bucketed
  * writes (different tables, no data dependency) and a card entry's
  * per-family builds (different index names, different leases) each
  * waited for the previous job's tail + driver-side commit/DDL gap;
  * submitting them from a small thread pool back-fills executors
  * freed by each job's tail and overlaps the driver-side gaps
  * (measured at sf0.1: 33-46% of entry wall time was inter-job
  * driver dead time).
  *
  * A FRESH pool per call, deliberately: these compositions nest (a
  * card runs builds in parallel; a build runs its table writes in
  * parallel), and nested submission into one shared fixed pool can
  * starve — a fresh small pool per level cannot. Pool threads are
  * daemons; job groups/descriptions are thread-local in Spark and
  * INHERITED by child threads, so UI labels stay correct.
  *
  * All thunks run to completion (or failure); the FIRST failure is
  * rethrown after every thunk has settled — a half-cancelled build
  * would leave more partial state than a completed-then-failed one,
  * and every caller runs under its index lease with staged/swap
  * writes, so completed siblings are safe. */
object Par {
  def run(thunks: (() => Unit)*): Unit = {
    if (thunks.isEmpty) return
    if (thunks.size == 1) { thunks.head.apply(); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      thunks.size,
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger(0)
        override def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-par-${n.getAndIncrement()}")
          t.setDaemon(true)
          t
        }
      })
    try {
      val futs = thunks.map(t => pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = t()
      }))
      var first: Throwable = null
      futs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (first == null) first = e.getCause
          case e: Throwable => if (first == null) first = e
        }
      }
      if (first != null) throw first
    } finally pool.shutdown()
  }
}
