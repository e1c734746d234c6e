package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * the matched step i−1 (greedy earliest-first matching ≡ the
    * chained-minimum definition t_i = min{ts of step-i events with
    * ts > t_{i−1}}, computed literally). A key with no step-0 event
    * yields no row; later unreached steps report null — conversion/
    * drop-off analysis reads straight off the null pattern.
    *
    * Shape: the chained-min as m min-aggregations stitched by left
    * joins — t_0 = per-key min over step-0 events; each later step
    * joins its own events onto the survivor row and takes
    * min(ts WHERE ts > t_{i−1}). Each step branch scans the source with
    * its own pushed EqualTo(type, step) filter — per-step parquet
    * dictionary/row-group skipping, the tightest prune available — and
    * its exchange carries only that step's (key, ts) pairs, so the m
    * branches together shuffle the same volume one combined funnel
    * shuffle would. The survivor side (one row per key) is replicated
    * ×`saltBuckets` and hash-joined build-side, so the big event side
    * streams through each join without sorting.
    *
    * Hot-key posture: per-key state is O(1) everywhere (running
    * minimum), NEVER a collected array — a collect_list fold would
    * materialize a bot key's 10⁷ events in one aggregation buffer, the
    * single-row-OOM hazard this formulation exists to avoid. The
    * WALL-CLOCK half of the hazard (all of a hot key's events grinding
    * through one partition) is killed by the salt: a retry-stable
    * ts-hash ([[SkewJoin]]'s determinism contract) spreads the key over
    * `saltBuckets` partitions, and every aggregation's partial pass
    * pre-reduces each (key, salt) slice to one row before the final
    * per-key min. Exact same result, straggler ratio collapses to
    * scheduler jitter.
    *
    * Output: (key, t_<step0>, t_<step1>, …), timestamps in the input's
    * own type (NTZ or LTZ — no cast seam).
    */
  def funnelTimes(events: DataFrame, steps: Seq[String], key: String,
      ts: String, typeCol: String, saltBuckets: Int = 8): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"steps must be non-empty and distinct, got $steps")
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    // literal equality per step: pushes into the parquet scan
    // (PushedFilters: EqualTo(event_type, …)) — at fleet scale the
    // funnel types are a fraction of the event stream and the
    // difference is the whole scan
    def stepEvents(s: String): DataFrame = events
      .filter(col(typeCol) === s)
      .select(col(key), col(ts).as("graft_ts"),
        pmod(xxhash64(col(key), col(ts)), lit(saltBuckets))
          .cast("int").as("graft_salt"))
    val head = stepEvents(steps.head)
      .groupBy(col(key))
      .agg(min(col("graft_ts")).as(s"t_${steps.head}"))
    steps.zip(steps.tail).foldLeft(head) { case (acc, (prev, s)) =>
      val prevT = s"t_$prev"
      val accCols = acc.columns.map(col).toSeq
      val accS = acc.withColumn("graft_salt",
        explode(sequence(lit(0), lit(saltBuckets - 1))))
      // no join-strategy hint: AQE broadcasts a small step slice (one
      // funnel step is often rare — signup ≪ view) and falls back to a
      // salted shuffle join when it isn't; both sides' key carries the
      // salt, so even the sort-merge path has no hot partition
      accS.join(stepEvents(s), Seq(key, "graft_salt"), "left")
        .groupBy(accCols: _*)
        // ts > null is null → when() never fires → min over nothing is
        // null: an unreached step i−1 propagates null to every later step
        .agg(min(when(col("graft_ts") > col(prevT), col("graft_ts")))
          .as(s"t_$s"))
    }
  }

  /** Cohort retention matrix — the product-analytics complement of the
    * funnel: users cohorted by the period of their FIRST event, and for
    * each (cohort, period offset) the count of cohort members active in
    * that period, the cohort size, and the retention rate. Null pattern
    * in funnels reads drop-off; here the decaying `n_active` column reads
    * it over calendar time.
    *
    * Shape — TWO data shuffles, zero joins (the r12 five-stage chain —
    * firsts agg, activity distinct, user join, cell agg, sizes join —
    * paid a per-call stage tax this operator never needed):
    *   1. one groupBy(key) → collect_set(period): cohort AND activity
    *      set in a single map-side-combining pass (the set is bounded by
    *      CALENDAR PERIODS a key can span — ~10³ for years of daily
    *      activity — never by event count);
    *   2. explode the per-key set → one row per (key, active period),
    *      aggregate (cohort, offset) counts — the only other shuffle.
    * The cohort size needs no sizes join: cohort = min(period), so EVERY
    * member is active at offset 0 and `n_cohort` is the offset-0 cell's
    * own count — read per cohort with a window over the tiny cells frame
    * (|cohorts|·|offsets| rows, not data).
    *
    * Null-timestamp events carry no period and are ignored (collect_set
    * skips nulls) — a key whose every event is null-ts never appears.
    *
    * `period` ∈ day | week | month (Spark `date_trunc` units, restated
    * with DuckDB `date_trunc` + `date_diff` in the oracle). Offsets are
    * calendar-period differences (day: datediff; week: datediff/7 exact
    * because both ends are week-truncated; month: month arithmetic).
    */
  def retentionMatrix(events: DataFrame, key: String, ts: String,
      period: String = "day"): DataFrame = {
    require(Set("day", "week", "month")(period),
      s"period must be day|week|month, got $period")
    val p = to_date(date_trunc(period, col(ts)))
    val acts = events.groupBy(col(key))
      .agg(collect_set(p).as("graft_ps"))
      .select(array_min(col("graft_ps")).as("cohort"),
        explode(col("graft_ps")).as("graft_p"))
    val offset: Column = period match {
      case "day"   => datediff(col("graft_p"), col("cohort"))
      case "week"  => (datediff(col("graft_p"), col("cohort")) / 7)
        .cast("int")
      case "month" => (months_between(col("graft_p"), col("cohort")))
        .cast("int")
    }
    val cells = acts
      .groupBy(col("cohort"), offset.as("offset"))
      .agg(count(lit(1)).as("n_active"))
    finalizeRetentionCells(cells)
  }

  /** (cohort, offset, n_active) cells → the full matrix: n_cohort is the
    * offset-0 cell's count (cohort = min period ⇒ every member is active
    * at offset 0), read with a window over the cells frame — which holds
    * |cohorts|·|offsets| rows, so the window moves summary rows, never
    * data. Shared by the batch operator above and the streaming
    * activation feed's batch-side aggregation (q104).
    */
  private[graft] def finalizeRetentionCells(cells: DataFrame): DataFrame =
    cells
      .withColumn("n_cohort",
        max(when(col("offset") === 0, col("n_active")))
          .over(Window.partitionBy("cohort")))
      .withColumn("ret_rate",
        round(col("n_active").cast("double") / col("n_cohort"), 4))
      .select("cohort", "offset", "n_active", "n_cohort", "ret_rate")

  /** One step of a generalized event pattern: an arbitrary row predicate
    * (any Boolean [[Column]] over the event's columns — not just
    * type-equality) plus an `optional` flag. `name` labels the output
    * column `t_<name>`.
    */
  final case class PatternStep(name: String, pred: Column,
      optional: Boolean = false)

  /** Generalized ordered-pattern matching — [[funnelTimes]] lifted from
    * "a list of event-type literals" to arbitrary per-step predicates
    * with optional steps (the useful core of SQL MATCH_RECOGNIZE's
    * `A B? C` shapes, minus contiguity, which event funnels never want).
    * Per key, the EARLIEST completion time of each step under greedy
    * chained-minimum semantics:
    *
    *   t_i = min{ ts of events satisfying pred_i with ts > anchor_i }
    *
    * where anchor_i is the match time of the nearest preceding step that
    * actually matched, looking back through optional steps to the nearest
    * REQUIRED predecessor: `coalesce(t_{i−1}, …, t_req)`. A failed
    * required step nulls its anchor and the null propagates to every
    * later step (exactly [[funnelTimes]]'s drop-off contract); a skipped
    * OPTIONAL step is transparent — the suffix anchors on whatever
    * matched below it, and if nothing did (optional steps at the head of
    * the pattern), the step matches unconditionally. Greedy means an
    * optional step that CAN match does, and the suffix must follow it —
    * the deterministic single-pass semantics; no backtracking to a later
    * pattern row for an earlier suffix.
    *
    * A row is emitted per key whose FIRST REQUIRED step matched (pattern
    * entry); optional steps before it may be null. With every step
    * required this is exactly [[funnelTimes]] (spec-pinned). If ALL steps
    * are optional, keys with at least one matched step are kept.
    *
    * Scale shape is [[funnelTimes]]'s: each step branch scans the source
    * with its own pushed predicate filter, shuffles only (key, ts) pairs,
    * and folds through salted left joins + per-key min aggregations —
    * O(1) state per key everywhere, no collected arrays, hot keys spread
    * over `saltBuckets` partitions. The only addition is the key-universe
    * scan (disjunction of all step predicates, still pushed): with
    * optional head steps a key can enter the pattern at a later step, so
    * the spine can't start from step 0's keys alone.
    */
  def matchPattern(events: DataFrame, steps: Seq[PatternStep], key: String,
      ts: String, saltBuckets: Int = 8): DataFrame = {
    require(steps.nonEmpty && steps.map(_.name).distinct.size == steps.size,
      s"steps must be non-empty with distinct names, got ${steps.map(_.name)}")
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    def stepEvents(p: PatternStep): DataFrame = events
      .filter(p.pred)
      .select(col(key), col(ts).as("graft_ts"),
        pmod(xxhash64(col(key), col(ts)), lit(saltBuckets))
          .cast("int").as("graft_salt"))
    val universe = events
      .filter(steps.map(_.pred).reduce(_ || _))
      .select(col(key)).distinct()
    val folded = steps.zipWithIndex.foldLeft(universe) { case (acc, (s, i)) =>
      val accCols = acc.columns.map(col).toSeq
      // newest-first predecessors, cut after the nearest required one:
      // optionals above it are look-through, anything below it is
      // unreachable (its failure already nulls the required step)
      val (opts, rest) = steps.take(i).reverse.span(_.optional)
      val chain = opts ++ rest.headOption
      val cond: Column =
        if (chain.isEmpty) lit(true)
        else {
          val anchor = coalesce(chain.map(p => col(s"t_${p.name}")): _*)
          if (rest.nonEmpty) col("graft_ts") > anchor
          else anchor.isNull || col("graft_ts") > anchor
        }
      val accS = acc.withColumn("graft_salt",
        explode(sequence(lit(0), lit(saltBuckets - 1))))
      accS.join(stepEvents(s), Seq(key, "graft_salt"), "left")
        .groupBy(accCols: _*)
        .agg(min(when(cond, col("graft_ts"))).as(s"t_${s.name}"))
    }
    steps.find(!_.optional) match {
      case Some(p) => folded.filter(col(s"t_${p.name}").isNotNull)
      case None => folded.filter(
        steps.map(p => col(s"t_${p.name}").isNotNull).reduce(_ || _))
    }
  }
}
