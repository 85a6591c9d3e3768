package graft

/** Driver-side overlap of INDEPENDENT Spark actions (optimization
  * guide §2.6): Spark happily runs several jobs at once inside one
  * application — actions are sequential only because driver code calls
  * them sequentially. Composite operators that materialize several
  * independent intermediates (the substring sweep's four gram tables,
  * the unified-dedup families' two tokenization passes, a trainer pair
  * in the tokenizer head-to-head, an ANN audit's index-vs-truth
  * checkpoints) submit them from a few driver threads so the second
  * job's tasks back-fill cores the first job's tail leaves idle. On a
  * cluster this is the same §2.6 move: 2-3 jobs in flight, enough to
  * fill the straggler tail, not enough to fight for executors.
  *
  * Semantics are unchanged by construction: each thunk materializes
  * exactly the frame it would have materialized sequentially, and the
  * default FIFO scheduler gives the earlier thunk priority. Failures
  * propagate with their ORIGINAL exception (unwrapped from the
  * executor's ExecutionException) so bench diagnostics and loud
  * raise_error guards keep their failure class.
  */
private[graft] object Par {

  /** Run two independent thunks, `a` on the calling thread. */
  def run2[A, B](a: => A, b: => B): (A, B) = {
    val fb = new java.util.concurrent.FutureTask[B](() => b)
    val tb = new Thread(fb, "graft-par"); tb.setDaemon(true); tb.start()
    val ra = a
    (ra, get(fb))
  }

  /** Run every thunk concurrently (head on the calling thread),
    * returning results in input order. The caller bounds the width —
    * call sites pass a handful of corpus-pass thunks, never a
    * data-sized collection.
    */
  def runAll[A](thunks: Seq[() => A]): Seq[A] =
    if (thunks.sizeIs <= 1) thunks.map(_())
    else {
      val futs = thunks.tail.map { th =>
        val f = new java.util.concurrent.FutureTask[A](() => th())
        val t = new Thread(f, "graft-par"); t.setDaemon(true); t.start()
        f
      }
      // head runs here: with FIFO scheduling it grabs resources first
      // and the spawned thunks back-fill its tail
      val headResult = thunks.head()
      headResult +: futs.map(get)
    }

  private def get[A](f: java.util.concurrent.FutureTask[A]): A =
    try f.get()
    catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
}
