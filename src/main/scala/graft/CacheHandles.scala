package graft

import org.apache.spark.sql.DataFrame

/** Process-wide registry of cache RELEASE handles — the third leg of the
  * repo's persist discipline. The first two legs already exist: (a)
  * per-corpus index artifacts (bucketed CDC bases, IVF/PQ/NSW trainers,
  * snapshot roots) cache in `TrieMap`s ON PURPOSE — the
  * train-once/probe-many deployment shape, never released; (b)
  * multi-consumer intermediates inside operators ship `...Releasable`
  * variants returning `(result, release)` so a pipeline caller frees
  * them deterministically. What was missing is the PLAIN-API story: a
  * gate function calling `tfidfTopTerms(...)` (or persisting its own
  * result before a presentation sort) used to leak one MEMORY_AND_DISK
  * entry per invocation — one per bench REP.
  *
  * The contract here: any per-CALL persist (a frame recreated on every
  * invocation, alive only until the caller's action finishes) registers
  * its release handle; the harness (graft.Verify between queries,
  * graft.Bench between reps) calls [[releaseAll]] once the result is
  * hashed/timed, so reps start cold-cache-clean and long sessions don't
  * accumulate dead cache entries. Release handles are idempotent
  * (`unpersist` on an unpersisted frame is a no-op) and unordered;
  * failures are swallowed — a cleanup must never fail the query that
  * produced the result.
  */
object CacheHandles {

  private val handles =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  /** Register a release handle to run at the next [[releaseAll]]. */
  def register(h: () => Unit): Unit = { handles.add(h); () }

  /** Persist `df` at MEMORY_AND_DISK and register its unpersist — the
    * one-liner for per-call result persists (persist-before-sort and
    * friends): `.transform(CacheHandles.persistTracked)`.
    */
  def persistTracked(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    register(() => { p.unpersist(blocking = false); () })
    p
  }

  /** Run and drain every registered handle. Safe to call at any time —
    * a handle releases a frame the current query no longer needs
    * (callers register only per-call persists, never the per-corpus
    * TrieMap-cached index artifacts).
    */
  def releaseAll(): Unit = {
    var h = handles.poll()
    while (h != null) {
      try h()
      catch { case scala.util.control.NonFatal(_) => () }
      h = handles.poll()
    }
  }
}
