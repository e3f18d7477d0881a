package graft.io

/** Bounded-parallel driver-side metadata fan-out.
  *
  * The "metadata-only" maintenance paths (parquet footer row counts,
  * stats harvesting, deletion-vector header pricing) each cost one small
  * RPC per file. Serially, a 10,000-file table turns a metadata-only
  * `count(*)` into 10k sequential round-trips — seconds on local disk,
  * minutes against an object store. These reads are independent and
  * I/O-bound, so a small fixed pool recovers ~poolSize× without an
  * executor job's scheduling overhead (the payloads are bytes, not data;
  * a Spark job per metadata call would be slower for the common
  * hundreds-of-files case and is what FileStats deliberately avoids).
  *
  * Order-preserving; exceptions propagate (first failure wins, pool torn
  * down). Short inputs run inline — no pool churn for the 1-file case.
  */
private[graft] object MetaPar {

  /** Map `f` over `items` on a bounded pool, preserving order. */
  def parMap[A, B](items: Seq[A], parallelism: Int = 24)(f: A => B): Seq[B] = {
    if (items.lengthCompare(2) < 0) return items.map(f)
    val n = math.min(parallelism, items.size)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      n,
      new java.util.concurrent.ThreadFactory {
        private val count = new java.util.concurrent.atomic.AtomicInteger()
        override def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-meta-${count.incrementAndGet()}")
          t.setDaemon(true)
          t
        }
      })
    try {
      val futures = items.map(a => pool.submit(
        new java.util.concurrent.Callable[B] { override def call(): B = f(a) }))
      futures.map { fut =>
        try fut.get()
        catch { // unwrap so callers see the original require/IO failure
          case e: java.util.concurrent.ExecutionException => throw e.getCause
        }
      }
    } finally {
      pool.shutdownNow()
      ()
    }
  }
}
