package graft.operators

/** Overlap INDEPENDENT Spark actions from driver threads (guide §2.6):
  * a query that issues k probe/audit jobs serially pays k × (job
  * scheduling + planning + stage tail) in wall clock even when each
  * job uses a fraction of the cores; submitting them from a small
  * pool lets one job's tasks back-fill the executors another job's
  * tail leaves idle. FIFO scheduling (the default) keeps earlier jobs
  * prioritized, which is exactly the back-fill behavior wanted.
  *
  * Results return IN INPUT ORDER, so callers stay deterministic —
  * parallelism changes wall time, never the answer. Callers must not
  * mutate session-global state (spark.conf) inside `f`.
  */
private[graft] object Par {

  def seq[A, B](items: Seq[A], parallelism: Int = 8)(f: A => B): Seq[B] =
    if (items.size <= 1) items.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(parallelism, items.size))
      try {
        val futures = items.map { a =>
          pool.submit(new java.util.concurrent.Callable[B] {
            override def call(): B = f(a)
          })
        }
        futures.map(_.get())
      } finally pool.shutdownNow()
    }
}
