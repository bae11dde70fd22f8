package graft.ops

/** Run independent Spark actions concurrently from the driver (guide
  * §2.6 "Overlap independent jobs"): a multi-action entry's censuses are
  * only sequential because the driver calls them sequentially, and each
  * small job leaves most of the executor idle during its straggler tail —
  * overlapping independent jobs back-fills that idle capacity. The same
  * shape holds at cluster scale: FIFO scheduling lets a later job's tasks
  * fill executors freed by the current job's tail.
  *
  * Results keep input order; the first failure propagates (unwrapped from
  * the pool's ExecutionException). Spark job-group/description properties
  * are NOT inherited by pool threads deterministically, so callers that
  * label jobs should label inside each thunk.
  */
object Par {

  def run[A](thunks: Seq[() => A], maxThreads: Int = 8): Seq[A] =
    if (thunks.sizeIs < 2) thunks.map(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(thunks.size, maxThreads))
      try {
        val futures = thunks.map { t =>
          pool.submit(new java.util.concurrent.Callable[A] { def call(): A = t() })
        }
        futures.map { f =>
          try f.get()
          catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
        }
      } finally pool.shutdownNow()
    }

  /** Two heterogeneous independent actions, overlapped: `b` runs on a
    * helper thread while `a` runs on the caller's. Either failure
    * propagates (the helper's unwrapped).
    */
  def run2[A, B](a: () => A, b: () => B): (A, B) = {
    val fb = new java.util.concurrent.FutureTask[B](
      new java.util.concurrent.Callable[B] { def call(): B = b() })
    val t = new Thread(fb, "graft-par2")
    t.setDaemon(true)
    t.start()
    val ra = a()
    val rb =
      try fb.get()
      catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
    (ra, rb)
  }
}
