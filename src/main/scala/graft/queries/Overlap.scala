package graft.queries

/** Overlap independent driver-orchestrated legs (guide §2.6 "overlap
  * independent jobs"): Spark's scheduler happily runs several jobs at
  * once inside one application — actions are only sequential because
  * driver code awaits them sequentially, so a study built from k
  * independent bounded collects otherwise pays k full job latencies in
  * series. Job descriptions/groups are thread-local, so UI labels stay
  * correct per leg. Legs must not mutate shared session state (conf,
  * temp views) — conf-mutating serving legs stay sequential.
  */
private[queries] object Overlap {

  /** Unwrap ExecutionException so a leg's real failure class (what the
    * bench/Verify artifacts record) survives the thread hop. */
  private def awaitGet[T](f: java.util.concurrent.Future[T]): T =
    try f.get()
    catch {
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    }

  /** Run `legs` concurrently on a bounded pool (2-3 in flight is plenty
    * — enough to fill each job's tail, not so many that they fight for
    * executors), returning results in input order. */
  def all[T](legs: Seq[() => T], parallelism: Int = 3): Seq[T] = {
    if (legs.size <= 1) return legs.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, legs.size))
    try {
      val fs = legs.map(l =>
        pool.submit(new java.util.concurrent.Callable[T] {
          def call(): T = l()
        }))
      fs.map(awaitGet)
    } finally pool.shutdown()
  }

  def par2[A, B](a: => A, b: => B): (A, B) = {
    val r = all[Any](Seq(() => a, () => b))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }

  def par3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val r = all[Any](Seq(() => a, () => b, () => c))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B], r(2).asInstanceOf[C])
  }
}
