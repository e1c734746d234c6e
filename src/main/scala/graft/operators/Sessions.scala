package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the gaps-and-islands assignment: consecutive
  * events of a key belong to one session while the gap between them stays
  * ≤ `gapMicros`; a larger gap starts the next session. The batch
  * complement of the streaming session windows in
  * [[graft.streaming.EventStreams]] (same segmentation, but over a bounded
  * corpus where the full history is present — backfills, replays,
  * offline feature builds).
  *
  * One shuffle on the key, ONE sort, two stacked window functions over
  * the same (key, ts) ordering (lag → boundary flag, running sum →
  * session index) — Spark plans both in a single Window operator pass, so
  * a hot key streams through in O(1) state per row. Gap arithmetic is in
  * exact MICROSECONDS (native timestamp subtraction → DayTimeInterval,
  * compared against a micros-precision interval literal; DuckDB
  * `epoch_us` differences on the oracle side) — second-level truncation
  * would merge sessions whose boundary lands inside the same second on
  * one engine but not the other. Timestamp subtraction, unlike
  * `unix_micros`, accepts BOTH TimestampType and TimestampNTZType, so the
  * operator works across the driver testdata generations (nanos → µs
  * ltz, micros → NTZ) without a cast that would re-interpret wall time.
  */
object Sessions {

  /** Adds `session_seq` (1-based per key, in time order). */
  def assignSessions(events: DataFrame, key: String, ts: String,
      gapMicros: Long): DataFrame = {
    require(gapMicros > 0, s"gap must be positive, got $gapMicros")
    val w = Window.partitionBy(col(key)).orderBy(col(ts))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(ts), 1).over(w)
    val gap = lit(java.time.Duration.ofNanos(
      Math.multiplyExact(gapMicros, 1000L)))
    val isNew = when(prev.isNull ||
      (col(ts) - prev) > gap, 1).otherwise(0)
    events
      .withColumn("graft_new_session", isNew)
      .withColumn("session_seq",
        sum(col("graft_new_session")).over(run))
      .drop("graft_new_session")
  }

  /** Session-level rollup: bounds, event count, value sum per session. */
  def sessionStats(events: DataFrame, key: String, ts: String,
      valueCol: String, gapMicros: Long): DataFrame =
    assignSessions(events, key, ts, gapMicros)
      .groupBy(col(key), col("session_seq"))
      .agg(min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("sum_value"))
}
