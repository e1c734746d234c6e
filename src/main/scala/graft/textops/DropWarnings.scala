package graft.textops

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Fail-loud observability for the sketch operators' group caps
  * (`maxBucket` / `maxPostingList`): every [[Dedup.groupPairs]] call whose
  * caller did NOT pass an explicit `dropStats` observation gets a named
  * `Dataset.observe` anyway, and a once-per-session QueryExecutionListener
  * WARN-logs whenever a completed action reports `dropped_groups > 0`.
  *
  * Rationale (round-4 audit): a cap hit means candidate groups — and
  * therefore recall — were silently discarded; at fleet scale a mis-tuned
  * bits-per-band can drop essentially every bucket. The cap itself is the
  * correct memory posture; the failure mode was that only callers who
  * wired `dropStats` could see it. Observe metrics ride the action that
  * executes the plan (no extra job); best-effort by design — Spark does
  * not deliver CollectMetrics results materialized inside a
  * broadcast-exchange subtree, so an explicit `dropStats` observation
  * remains the strong contract for callers that must PROGRAMMATICALLY
  * react to drops.
  */
object DropWarnings {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val counter = new AtomicLong()
  // Weak keys: the session's listenerManager holds the listener (session →
  // listener, never the reverse), so a stopped session must stay
  // collectable — a strong set here would pin every session a long-lived
  // driver (notebook server, multi-tenant service) ever created.
  private val installed = java.util.Collections.newSetFromMap(
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  private[textops] def nextName(): String =
    s"graft_drops_${counter.incrementAndGet()}"

  /** Visible for specs: number of cap-drop warnings logged so far. */
  val warned = new AtomicLong()

  private[textops] def install(spark: SparkSession): Unit =
    if (installed.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_drops_")) {
              val i = row.fieldIndex("dropped_groups")
              if (!row.isNullAt(i) && row.getLong(i) > 0) {
                warned.incrementAndGet()
                // row.get, not getAs[Long]: max_group is the Int of size()
                log.warn(s"graft $name: ${row.getLong(i)} of " +
                  s"${row.get(row.fieldIndex("n_groups"))} candidate groups " +
                  s"exceeded the size cap and were dropped (largest group " +
                  s"${row.get(row.fieldIndex("max_group"))}); recall is reduced — " +
                  "raise maxBucket/maxPostingList, grow bits-per-band with " +
                  "corpus size (Similarity.autoBandBits), or pass dropStats " +
                  "to observe drops programmatically")
              }
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
    }
}
