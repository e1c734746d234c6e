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

  /** Ordered-funnel analysis — the product-analytics sequence matcher
    * Spark has no MATCH_RECOGNIZE for: per key, the EARLIEST completion
    * time of each funnel step, where step i must occur STRICTLY after
    * the matched step i−1 (greedy earliest-first matching over the
    * time-sorted event list ≡ the chained-minimum definition
    * t_i = min{ts of step-i events with ts > t_{i−1}}, which is what
    * the oracle restates). A key with no step-0 event yields no row;
    * later unreached steps report null — conversion/drop-off analysis
    * reads straight off the null pattern.
    *
    * Shape: filter to funnel event types (scan-pruned), ONE shuffle
    * grouping each key's step events into a sorted array, then a single
    * codegen'd `aggregate` fold computes all step times in one pass —
    * no per-step join chain (m−1 extra shuffles), no window re-sort.
    * Per-key state is the m-slot accumulator; the collected array is
    * bounded by the key's own funnel-event count (the sessionization
    * family's per-key-bounded contract).
    *
    * Output: (key, t_<step0>, t_<step1>, …), timestamps in the input's
    * own type (NTZ or LTZ — no cast seam).
    */
  def funnelTimes(events: DataFrame, steps: Seq[String], key: String,
      ts: String, typeCol: String): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"steps must be non-empty and distinct, got $steps")
    val m = steps.length
    val tsType = events.schema(ts).dataType
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(null).cast("int")) { case (acc, (s, i)) =>
        when(col(typeCol) === s, lit(i)).otherwise(acc) }
    val init = array(steps.map(_ => lit(null).cast(tsType)): _*)
    val folded = aggregate(
      sort_array(collect_list(struct(col(ts).as("t"),
        col("graft_step").as("s")))),
      init,
      (acc, x) => {
        // first unfilled slot; fill it iff this event is that step and
        // strictly after the previous step's matched time. The i = 0
        // branch guards via when(), not `||`: SQL OR is not
        // short-circuit and element_at(acc, 0) throws under ANSI.
        val filled = size(filter(acc, a => a.isNotNull))
        transform(sequence(lit(0), lit(m - 1)), i => {
          val afterPrev = when(i === 0, lit(true))
            .otherwise(x("t") > element_at(acc, greatest(i, lit(1))))
          when(i === filled && x("s") === i && afterPrev, x("t"))
            .otherwise(element_at(acc, i + 1))
        })
      })
    events
      // filter on the RAW type column, not isNotNull over the CASE
      // mapping: the literal isin pushes into the parquet scan
      // (PushedFilters: In(event_type, …)), the derived-column null test
      // would not — at fleet scale the funnel types are a fraction of
      // the event stream and the difference is the whole scan
      .filter(col(typeCol).isin(steps: _*))
      .withColumn("graft_step", stepIdx)
      .groupBy(col(key))
      .agg(folded.as("graft_f"))
      .select(col(key) +: steps.zipWithIndex.map { case (s, i) =>
        element_at(col("graft_f"), i + 1).as(s"t_$s") }: _*)
      .filter(col(s"t_${steps.head}").isNotNull)
  }
}
