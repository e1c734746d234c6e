package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming operators over the `events` stream (event_id, ts, user_id,
  * event_type, value, props).
  *
  * Every transform is a pure `DataFrame => DataFrame` so the SAME function
  * runs in batch (driver correctness gate) and under `readStream` —
  * Structured Streaming's unified Dataset API makes the batch oracle the
  * streaming correctness spec. Watermarks bound state; all aggregations
  * here are incrementally-maintainable (sum/count/min/max), so the
  * streaming plan is a stateful partial-agg, not a re-scan.
  *
  * Scale posture: state is keyed by (window, event_type) or user_id —
  * shuffle-partitioned; watermark eviction keeps state O(active keys), and
  * RocksDB state store (config, not code) handles >memory state at fleet
  * scale.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type. Batch-equivalent of
    * `q20_tumbling_window`; under readStream add [[withEventWatermark]].
    */
  def tumblingAgg(events: DataFrame, windowLen: String): DataFrame =
    events.groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window (length/slide) event counts. */
  def slidingAgg(events: DataFrame, windowLen: String, slide: String): DataFrame =
    events.groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))

  /** Session windows per user: a session extends while consecutive events
    * arrive within `gap`; end = last event + gap (half-open). Works in
    * batch and streaming (streaming requires watermark + append mode).
    */
  def sessionAgg(events: DataFrame, gap: String): DataFrame =
    events.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Event-time watermark decoration for streaming inputs. */
  def withEventWatermark(events: DataFrame, delay: String): DataFrame =
    events.withWatermark("ts", delay)

  /** Tumbling-window EXACT distinct users — the chained-stateful shape
    * (Spark 3.4+'s multiple-stateful-operator unlock): a (window, user)
    * dedup feeds a per-window count, BOTH watermark-bounded under
    * readStream (state = one row per distinct (window, user) inside the
    * horizon, evicted as the watermark passes the window). `COUNT(
    * DISTINCT)` itself is not incrementally maintainable, which is why
    * the decomposition — dedup is, and count-after-dedup is. In batch
    * the same function collapses to a two-phase distinct aggregate; the
    * q79 gate hash-checks it against DuckDB's COUNT(DISTINCT), and the
    * streaming spec proves streamed-equals-batch across micro-batches.
    * For fleets where even the dedup state is too hot, the approximate
    * stand-in is [[graft.operators.Sketches.hllDistinct]] per window.
    */
  def windowedDistinctUsers(events: DataFrame,
      windowLen: String): DataFrame =
    events
      .select(window(col("ts"), windowLen).as("w"), col("user_id"))
      .dropDuplicates("w", "user_id")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("w.start").as("window_start"), col("n_users"))

  /** Per-window HyperLogLog state for [[windowedHllDistinct]]: the 2^p
    * max-rank registers plus an update counter (the counter disambiguates
    * "latest emission per window" for update-mode consumers).
    */
  case class HllWindowKey(start: java.sql.Timestamp, end: java.sql.Timestamp)
  case class HllWindowIn(win: HllWindowKey, h: Long,
      graft_evt: java.sql.Timestamp)
  case class HllWindowState(regs: Array[Byte], nUpdates: Long)
  case class HllWindowRow(window_start: java.sql.Timestamp, n_updates: Long,
      v_empty: Long, hll_est: Long)

  /** Tumbling-window APPROXIMATE distinct values — the sketch stand-in
    * for [[windowedDistinctUsers]] when even the per-(window, user) dedup
    * state is too hot: state per window is 2^p bytes of HLL registers,
    * REGARDLESS of cardinality. Spark restricts chained stateful
    * aggregations (the dedup→count decomposition is the exact path), so
    * the sketch variant keeps its registers in
    * `flatMapGroupsWithState` keyed by the window: each micro-batch
    * merges its values' ranks into the registers and emits a refined
    * estimate row (update semantics — `n_updates` marks the latest);
    * under streaming, event-time timeouts evict a window's registers
    * `stateTtlMs` past its end. The operator watermarks its OWN
    * event-time column (`watermarkDelay`) after the window projection:
    * an upstream watermark does not survive the cast + typed-encoder
    * boundary (metadata lives on the top-level attribute), and
    * event-time timeouts require one in the fMGWS child plan.
    *
    * The estimator replicates [[graft.operators.Sketches.hllDistinct]]
    * EXACTLY — same xxhash64 input hash (computed as a Column before the
    * typed boundary), same exact-integer register sum (BigInt stands in
    * for DECIMAL(38,0)), same one-shot double division and
    * linear-counting branch — so batch execution of THIS function, the
    * Column estimator, and the streamed run all agree to the last bit
    * (spec-pinned; the q83 gate replays the sketch in DuckDB per window).
    *
    * Scale shape: one shuffle keyed by window (the same Exchange the
    * exact variant pays), state O(windows in the horizon)·2^p bytes,
    * emissions one row per touched window per micro-batch.
    */
  def windowedHllDistinct(events: DataFrame, windowLen: String,
      valueCol: String = "user_id", p: Int = 10,
      stateTtlMs: Long = 3600000L,
      watermarkDelay: String = "10 minutes"): Dataset[HllWindowRow] = {
    import events.sparkSession.implicits._
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val sw = 64 - p
    val mask = (1L << sw) - 1
    val alphaC = graft.operators.Sketches.alphaM(m) * m * m *
      math.pow(2.0, sw + 1)
    val ttlMs = stateTtlMs
    val streaming = events.isStreaming
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    def estimate(key: HllWindowKey,
        st: HllWindowState): HllWindowRow = {
      var tp = BigInt(0)
      var nEmpty = 0L
      var j = 0
      while (j < m) {
        val r = st.regs(j)
        if (r == 0) nEmpty += 1
        tp += BigInt(1) << (sw + 1 - r)
        j += 1
      }
      val raw = alphaC / BigDecimal(tp).doubleValue
      val est =
        if (raw <= 2.5 * m && nEmpty > 0)
          m.toDouble * math.log(m.toDouble / nEmpty)
        else raw
      HllWindowRow(key.start, st.nUpdates, nEmpty, math.round(est))
    }

    events
      // normalize the event-time type at the typed boundary: the driver
      // parquet carries TIMESTAMP_NTZ, streams carry TIMESTAMP — the
      // java.sql.Timestamp encoder needs the latter. NTZ→LTZ→(caller's
      // NTZ cast back) is the identity under a UTC session (Verify pins
      // UTC; DST-gap loss cannot occur).
      .withColumn("graft_ts", col("ts").cast("timestamp"))
      .select(window(col("graft_ts"), windowLen).as("win"),
        xxhash64(col(valueCol)).as("h"),
        col("graft_ts").as("graft_evt"))
      .transform(df =>
        if (streaming) df.withWatermark("graft_evt", watermarkDelay) else df)
      .as[HllWindowIn]
      .groupByKey(_.win)
      .flatMapGroupsWithState[HllWindowState, HllWindowRow](
        OutputMode.Update(), timeoutConf) {
        (key: HllWindowKey, batch: Iterator[HllWindowIn],
            state: GroupState[HllWindowState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption
              .getOrElse(HllWindowState(new Array[Byte](m), 0L))
            val regs = prev.regs
            batch.foreach { row =>
              val b = (row.h >>> sw).toInt
              val v = row.h & mask
              val rho =
                if (v == 0) (sw + 1).toByte
                else (sw + 1 - (64 - java.lang.Long
                  .numberOfLeadingZeros(v))).toByte
              if (rho > regs(b)) regs(b) = rho
            }
            val st = HllWindowState(regs, prev.nUpdates + 1)
            state.update(st)
            if (streaming)
              state.setTimeoutTimestamp(key.end.getTime + ttlMs)
            Iterator.single(estimate(key, st))
          }
      }
  }

  // ----------------------------------------------------- streaming CMS

  case class CmsWindowIn(win: HllWindowKey, h: Long,
      graft_evt: java.sql.Timestamp)
  case class CmsWindowState(cells: Array[Long], nUpdates: Long)
  case class CmsWindowRow(window_start: java.sql.Timestamp, n_updates: Long,
      probe: String, cms_est: Long)

  /** Tumbling-window count-min frequencies — the streaming twin of the
    * batch CMS ([[graft.operators.Sketches.cmsHeavyHitters]], q74), and
    * the HLL/CMS matrix's missing cell: per window the d×2^logW counter
    * table lives in `flatMapGroupsWithState` state (d·2^logW longs,
    * REGARDLESS of stream cardinality), each micro-batch adds its
    * occurrences into the cells, and every update emits the refreshed
    * frequency estimate for each of the caller's `probes`.
    *
    * The probe list is FIXED up front (the fleet-telemetry shape: the
    * known metric names / event taxonomy), which is what keeps the
    * operator batch-reproducible: cell sums are order-insensitive
    * commutative merges, so streamed registers equal the batch run bit
    * for bit — whereas the classic CMS+heap "discover the heavy hitters
    * while streaming" variant admits arrival-order-dependent heap
    * contents, which no batch oracle could pin. Estimates carry the CMS
    * one-sided guarantee: cms_est ≥ true count, over by ≤ εN at ε=e/w.
    *
    * Hash contract: the SAME splitmix64-finalized Karp–Rabin token hash
    * as the batch sketch ([[graft.functions.TextExprs.KrHash64]],
    * computed as a Column before the typed boundary; probes pre-hashed
    * driver-side via the shared [[graft.functions.TextExprs
    * .krHash64Value]]) and the same Kirsch–Mitzenmacher cells
    * (lo + i·(hi|1) mod w — non-negative 36-bit arithmetic, so JVM `%`
    * equals Spark's pmod equals the DuckDB oracle). Everything the q90
    * gate replays per window in DuckDB.
    *
    * State/eviction contract as [[windowedHllDistinct]]: the operator
    * watermarks its own event-time projection, event-time timeouts evict
    * a window's cells `stateTtlMs` past its end, and in batch the same
    * function sees everything at once (one emission per window).
    */
  def windowedCmsFrequencies(events: DataFrame, windowLen: String,
      probes: Seq[String], valueCol: String = "event_type",
      d: Int = 4, logW: Int = 10, stateTtlMs: Long = 3600000L,
      watermarkDelay: String = "10 minutes"): Dataset[CmsWindowRow] = {
    import events.sparkSession.implicits._
    require(d >= 1 && d <= 8, s"d out of range: $d")
    require(logW >= 4 && logW <= 24, s"logW out of range: $logW")
    require(probes.nonEmpty && probes.distinct == probes,
      s"probes must be non-empty and distinct, got $probes")
    val w = 1L << logW
    val wi = w.toInt
    val ttlMs = stateTtlMs
    val streaming = events.isStreaming
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    def cellOf(h: Long, i: Int): Int = {
      val lo = h & 0xffffffffL
      val hi = (h >>> 32) | 1L
      ((lo + i.toLong * hi) % w).toInt
    }
    // probe cells precomputed once on the driver — closed over by the
    // state function, serialized with the task
    val probeCells: Array[(String, Array[Int])] = probes.toArray.map { p =>
      val h = graft.functions.TextExprs.krHash64Value(p)
      p -> Array.tabulate(d)(i => cellOf(h, i))
    }

    events
      .withColumn("graft_ts", col("ts").cast("timestamp"))
      .select(window(col("graft_ts"), windowLen).as("win"),
        graft.functions.TextExprs.krHash64(col(valueCol)).as("h"),
        col("graft_ts").as("graft_evt"))
      .transform(df =>
        if (streaming) df.withWatermark("graft_evt", watermarkDelay) else df)
      .as[CmsWindowIn]
      .groupByKey(_.win)
      .flatMapGroupsWithState[CmsWindowState, CmsWindowRow](
        OutputMode.Update(), timeoutConf) {
        (key: HllWindowKey, batch: Iterator[CmsWindowIn],
            state: GroupState[CmsWindowState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption
              .getOrElse(CmsWindowState(new Array[Long](d * wi), 0L))
            val cells = prev.cells
            batch.foreach { row =>
              var i = 0
              while (i < d) {
                cells(i * wi + cellOf(row.h, i)) += 1L
                i += 1
              }
            }
            val st = CmsWindowState(cells, prev.nUpdates + 1)
            state.update(st)
            if (streaming)
              state.setTimeoutTimestamp(key.end.getTime + ttlMs)
            probeCells.iterator.map { case (p, pc) =>
              var est = Long.MaxValue
              var i = 0
              while (i < d) {
                val c = cells(i * wi + pc(i))
                if (c < est) est = c
                i += 1
              }
              CmsWindowRow(key.start, st.nUpdates, p, est)
            }
          }
      }
  }

  // ------------------------------------------------------- streaming as-of

  case class AsofIn(key: Long, tsUs: Long, side: Int, fact_id: Long,
      value: Double, graft_evt: java.sql.Timestamp)
  case class AsofCtx(tsUs: Long, value: Double)
  case class AsofFactRec(fact_id: Long, tsUs: Long, value: Double)

  /** Epoch micros → Timestamp, preserving the micros (event timestamps
    * carry sub-millisecond precision; a millis round-trip would corrupt
    * both the output and micro-granular as-of ordering).
    */
  private def tsFromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
  case class AsofState(ctx: Seq[AsofCtx], pending: Seq[AsofFactRec])
  case class AsofRow(fact_id: Long, key: Long, ts: java.sql.Timestamp,
      fact_value: Double, ts_matched: Option[java.sql.Timestamp],
      ctx_value: Option[Double])

  /** STREAMING backward as-of join — the temporal-join operator Spark's
    * streaming engine lacks natively (Flink calls it a temporal join;
    * batch-side it is [[graft.operators.AsOf.joinBackward]], q57): each
    * fact row attaches the same key's context row with the largest
    * context ts ≤ fact ts (inclusive).
    *
    * Shape: both inputs UNION into one side-tagged stream (the batch
    * operator's trick, reused so ONE watermark column governs both
    * sides), keyed state per join key holds (a) the context buffer and
    * (b) facts whose result is not yet final. A fact can only emit once
    * the watermark passes its timestamp — earlier-context arrivals are
    * then impossible (the engine drops pre-watermark rows), so the match
    * is FINAL and append-mode-correct. Pending facts flush via
    * event-time timeouts (set to the earliest pending fact ts, re-armed
    * while any remain); the context buffer evicts everything older than
    * the newest context at-or-below the watermark — exactly the row a
    * future (necessarily post-watermark) fact could still match.
    *
    * State per key = surviving context rows + in-horizon facts, both
    * watermark-bounded. Late context (beyond the horizon) is dropped by
    * the engine — facts then match the best context that DID arrive:
    * as-of correctness within the watermark horizon, the standard
    * streaming contract. In batch (`events.isStreaming == false`) the
    * same function sees everything at once (watermark = +∞), emits every
    * fact immediately, and keeps no state — batch execution IS
    * [[graft.operators.AsOf.joinBackward]] semantics, which the q86 gate
    * checks against DuckDB's native ASOF JOIN and the spec checks
    * against the batch operator.
    *
    * Contract (as the batch operator): context unique per (key, ts).
    * Output: (fact_id, key, ts, fact_value, ts_matched, ctx_value) with
    * null match columns when no context precedes.
    */
  def asofBackwardStream(facts: DataFrame, context: DataFrame,
      key: String, ts: String, factId: String, factVal: String,
      ctxVal: String,
      watermarkDelay: String = "10 minutes"): Dataset[AsofRow] = {
    import facts.sparkSession.implicits._
    val streaming = facts.isStreaming || context.isStreaming
    def norm(df: DataFrame, side: Int, id: Column, v: Column): DataFrame =
      df.withColumn("graft_ts", col(ts).cast("timestamp"))
        .select(col(key).cast("long").as("key"),
          unix_micros(col("graft_ts")).as("tsUs"),
          lit(side).as("side"), id.cast("long").as("fact_id"),
          v.cast("double").as("value"),
          col("graft_ts").as("graft_evt"))
    val unioned = norm(context, 0, lit(-1L), col(ctxVal))
      .unionByName(norm(facts, 1, col(factId), col(factVal)))
      .transform(df =>
        if (streaming) df.withWatermark("graft_evt", watermarkDelay) else df)
    unioned.as[AsofIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsofState, AsofRow](
        OutputMode.Append(),
        if (streaming) GroupStateTimeout.EventTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (k: Long, it: Iterator[AsofIn], state: GroupState[AsofState]) =>
          val prev = state.getOption.getOrElse(AsofState(Nil, Nil))
          var ctx = prev.ctx
          var pending = prev.pending
          it.foreach { r =>
            if (r.side == 0) ctx = ctx :+ AsofCtx(r.tsUs, r.value)
            else pending = pending :+ AsofFactRec(r.fact_id, r.tsUs, r.value)
          }
          val sortedCtx = ctx.sortBy(_.tsUs)
          // watermark is millis; state timestamps are micros
          val wmUs =
            if (streaming) {
              val w = state.getCurrentWatermarkMs()
              if (w >= Long.MaxValue / 1000) Long.MaxValue else w * 1000L
            } else Long.MaxValue
          val (emit, keep) = pending.partition(_.tsUs <= wmUs)
          val out = emit.sortBy(f => (f.tsUs, f.fact_id)).map { f =>
            val m = sortedCtx.takeWhile(_.tsUs <= f.tsUs).lastOption
            AsofRow(f.fact_id, k, tsFromMicros(f.tsUs), f.value,
              m.map(c => tsFromMicros(c.tsUs)), m.map(_.value))
          }
          if (streaming) {
            // keep the newest context ≤ wm (a future fact's only possible
            // backward match among the old rows) plus everything newer
            val atOrBelow = sortedCtx.filter(_.tsUs <= wmUs)
            val kept =
              if (atOrBelow.isEmpty) sortedCtx
              else sortedCtx.dropWhile(_.tsUs < atOrBelow.last.tsUs)
            if (kept.isEmpty && keep.isEmpty) state.remove()
            else {
              state.update(AsofState(kept, keep))
              // flush pending facts once the watermark passes them: the
              // millis ceiling keeps the required timeout > watermark
              // invariant (min(keep) > wmUs by construction)
              if (keep.nonEmpty)
                state.setTimeoutTimestamp(
                  Math.floorDiv(keep.map(_.tsUs).min, 1000L) + 1L)
            }
          }
          out.iterator
      }
  }

  // ------------------------------------------------------ streaming funnel

  case class FunnelIn(key: Long, tsUs: Long, step: Int,
      graft_evt: java.sql.Timestamp)
  /** `times(i)` = matched micros of step i, [[FunnelUnset]] if unmatched;
    * `pending` = in-horizon events not yet watermark-final.
    */
  case class FunnelState(times: Seq[Long], pending: Seq[(Long, Int)])
  case class FunnelStepRow(key: Long, step: String, ts: java.sql.Timestamp)
  private val FunnelUnset = Long.MinValue

  /** STREAMING ordered funnel — [[graft.operators.Sessions.funnelTimes]]
    * as an incremental operator: per key, emit a row the moment a funnel
    * step COMPLETES (greedy chained-minimum semantics: step i matches the
    * first step-i event strictly after step i−1's match). Step
    * completions are immutable facts under the greedy semantics, so the
    * output is append-mode-correct — the batch funnel row for a key is
    * just its completion rows pivoted, which is how the q95 gate checks
    * this function against the same chained-min SQL oracle as q89.
    *
    * Ordering discipline (the part watermarks exist for): greedy matching
    * must see a key's events in event-time order, but micro-batches
    * deliver arrival order. Events therefore buffer in state until the
    * watermark passes them — then no earlier event can still arrive
    * (pre-watermark rows are dropped by the engine), and applying the
    * buffered prefix in (ts, step) order is FINAL. Pending events flush
    * via event-time timeouts re-armed at the earliest buffered ts
    * (exactly [[asofBackwardStream]]'s discipline).
    *
    * State per key: `steps.length` longs + the in-horizon buffer — O(1)
    * in the event count, watermark-bounded in time; the collect_list
    * hot-key hazard the batch operator's salted formulation avoids never
    * appears. Matched-step state persists for the key's lifetime (a
    * completed step must not re-fire if the key goes quiet and returns);
    * at fleet scale that is O(distinct keys) rows in the state store —
    * RocksDB territory, same contract as any keyed-state operator.
    *
    * In batch (`events.isStreaming == false`) the watermark is +∞: every
    * event applies immediately in one sorted pass per key and no state
    * survives. Scan-side: the step filter is an `isin` pushed to parquet,
    * and only (key, ts, step) triples shuffle.
    */
  def funnelStream(events: DataFrame, steps: Seq[String], key: String,
      ts: String, typeCol: String,
      watermarkDelay: String = "10 minutes"): Dataset[FunnelStepRow] = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"steps must be non-empty and distinct, got $steps")
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val nSteps = steps.length
    val stepIdx = steps.zipWithIndex
      .map { case (s, i) => (s, lit(i)) }
      .foldLeft(lit(-1)) { case (acc, (s, ix)) =>
        when(col(typeCol) === s, ix).otherwise(acc) }
    val normed = events
      .filter(col(typeCol).isin(steps: _*))
      .withColumn("graft_evt", col(ts).cast("timestamp"))
      .select(col(key).cast("long").as("key"),
        unix_micros(col("graft_evt")).as("tsUs"),
        stepIdx.cast("int").as("step"),
        col("graft_evt"))
      .transform(df =>
        if (streaming) df.withWatermark("graft_evt", watermarkDelay) else df)
    normed.as[FunnelIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState[FunnelState, FunnelStepRow](
        OutputMode.Append(),
        if (streaming) GroupStateTimeout.EventTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (k: Long, it: Iterator[FunnelIn], state: GroupState[FunnelState]) =>
          val prev = state.getOption.getOrElse(
            FunnelState(Seq.fill(nSteps)(FunnelUnset), Nil))
          val times = prev.times.toArray
          var pending = prev.pending
          it.foreach(r => pending = pending :+ (r.tsUs, r.step))
          val wmUs =
            if (streaming) {
              val w = state.getCurrentWatermarkMs()
              if (w >= Long.MaxValue / 1000) Long.MaxValue else w * 1000L
            } else Long.MaxValue
          val (apply, keep) = pending.partition(_._1 <= wmUs)
          val out = Seq.newBuilder[FunnelStepRow]
          apply.sortBy(identity).foreach { case (t, s) =>
            if (times(s) == FunnelUnset &&
                (s == 0 ||
                  (times(s - 1) != FunnelUnset && t > times(s - 1)))) {
              times(s) = t
              out += FunnelStepRow(k, steps(s), tsFromMicros(t))
            }
          }
          if (streaming) {
            val anyMatched = times.exists(_ != FunnelUnset)
            if (!anyMatched && keep.isEmpty) state.remove()
            else {
              state.update(FunnelState(times.toSeq, keep))
              if (keep.nonEmpty)
                state.setTimeoutTimestamp(
                  Math.floorDiv(keep.map(_._1).min, 1000L) + 1L)
            }
          }
          out.result().iterator
      }
  }

  // ---------------------------------------------- streaming retention

  case class RetentionIn(key: Long, tsUs: Long, pd: Int, pm: Int,
      graft_evt: java.sql.Timestamp)
  case class RetentionState(cohortPd: Int, cohortPm: Int,
      maxOff: Int, pending: Seq[(Long, Int, Int)])
  case class RetentionActivation(key: Long, cohort_days: Int, offset: Int)

  /** STREAMING cohort retention — the activation feed behind
    * [[graft.operators.Sessions.retentionMatrix]] as an incremental
    * operator: one append row per (key, NEW active period), carrying the
    * key's cohort period and the period offset. The batch retention
    * matrix is exactly this feed aggregated (n_active = count per
    * (cohort, offset); n_cohort = the offset-0 count), which is how the
    * q104 gate checks it against the q93 oracle.
    *
    * Why retention streams and pattern matching doesn't: a key's cohort
    * is its FIRST event's period, and under a watermark "first" is
    * monotone-final — once the watermark passes an event's timestamp, no
    * earlier event can still arrive, so a cohort assigned from the
    * earliest watermark-released event never changes, and each (cohort,
    * offset) activation is an immutable append-mode fact. (Optional-step
    * greedy pattern binding depends on unboundedly-future events — the
    * documented impossibility — but cohorts only ever look backward.)
    *
    * Ordering discipline is [[funnelStream]]'s: events buffer in state
    * until the watermark passes them, then apply in event-time order —
    * premature cohort assignment from an out-of-order first batch would
    * pin the wrong cohort forever. Timeouts re-arm at the earliest
    * buffered timestamp, so pending events flush even if the key goes
    * quiet.
    *
    * State per key: three ints (cohort pd/pm + the MAX emitted offset)
    * and the watermark-horizon event buffer — O(1) + O(events inside
    * the watermark horizon), NOT O(distinct active periods). A single
    * int suffices for emitted-offset dedup because application is
    * watermark-ordered and offsets are monotone in event time: events
    * apply sorted by ts and only once ts ≤ watermark, the watermark is
    * monotone across invocations, and period truncation is monotone —
    * so every future application carries offset ≥ the max applied so
    * far, and every applied offset was emitted on first application.
    * Hence `off ≤ maxOff ⟺ off already emitted`; a full emitted SET
    * would grow with the key's lifetime/period (~10³ ints/key at
    * period=day over years) for zero extra information. Cohort state
    * persists for the key's lifetime (a returning key must keep its
    * cohort and must not re-emit an old offset) — O(distinct keys)
    * state-store rows, the standard keyed-state contract
    * ([[funnelStream]]).
    *
    * Periods ride as INTEGERS (days-since-epoch of the period start,
    * months-since-year-0), computed in-plan by `date_trunc`, so the
    * state function does exact integer arithmetic only — no timezone or
    * calendar logic crosses the encoder boundary, and the emitted
    * `cohort_days` converts back via `date_add` (TZ-free both ways).
    * In batch (`events.isStreaming == false`) the watermark is +∞: one
    * sorted pass per key, no state survives.
    */
  def retentionActivationsStream(events: DataFrame, key: String,
      ts: String, period: String = "day",
      watermarkDelay: String = "10 minutes"): Dataset[RetentionActivation] = {
    require(Set("day", "week", "month")(period),
      s"period must be day|week|month, got $period")
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val noCohort = Int.MinValue
    val p = to_date(date_trunc(period, col(ts).cast("timestamp")))
    val normed = events
      .withColumn("graft_evt", col(ts).cast("timestamp"))
      .select(col(key).cast("long").as("key"),
        unix_micros(col("graft_evt")).as("tsUs"),
        datediff(p, to_date(lit("1970-01-01"))).cast("int").as("pd"),
        (year(p) * 12 + month(p)).cast("int").as("pm"),
        col("graft_evt"))
      .transform(df =>
        if (streaming) df.withWatermark("graft_evt", watermarkDelay) else df)
    normed.as[RetentionIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState[RetentionState, RetentionActivation](
        OutputMode.Append(),
        if (streaming) GroupStateTimeout.EventTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (k: Long, it: Iterator[RetentionIn],
            state: GroupState[RetentionState]) =>
          val prev = state.getOption.getOrElse(
            RetentionState(noCohort, 0, Int.MinValue, Nil))
          var cohortPd = prev.cohortPd
          var cohortPm = prev.cohortPm
          var maxOff = prev.maxOff
          var pending = prev.pending
          it.foreach(r => pending = pending :+ ((r.tsUs, r.pd, r.pm)))
          val wmUs =
            if (streaming) {
              val w = state.getCurrentWatermarkMs()
              if (w >= Long.MaxValue / 1000) Long.MaxValue else w * 1000L
            } else Long.MaxValue
          val (apply, keep) = pending.partition(_._1 <= wmUs)
          val out = Seq.newBuilder[RetentionActivation]
          apply.sortBy(identity).foreach { case (_, pd, pm) =>
            if (cohortPd == noCohort) { cohortPd = pd; cohortPm = pm }
            val off = period match {
              case "day"   => pd - cohortPd
              case "week"  => (pd - cohortPd) / 7
              case "month" => pm - cohortPm
            }
            // monotone application ⟹ off ≤ maxOff iff already emitted
            if (off > maxOff) {
              maxOff = off
              out += RetentionActivation(k, cohortPd, off)
            }
          }
          if (streaming) {
            if (maxOff == Int.MinValue && keep.isEmpty) state.remove()
            else {
              state.update(RetentionState(cohortPd, cohortPm,
                maxOff, keep))
              if (keep.nonEmpty)
                state.setTimeoutTimestamp(
                  Math.floorDiv(keep.map(_._1).min, 1000L) + 1L)
            }
          }
          out.result().iterator
      }
  }

  // ---------------------------------------------- streaming CDC apply

  case class CdcIn(key: Long, version: Long, deleted: Boolean,
      value: Double)
  case class CdcState(version: Long, deleted: Boolean, value: Double)
  case class CdcCurrent(key: Long, version: Long, deleted: Boolean,
      value: Double)

  /** STREAMING CDC apply — [[graft.operators.Temporal.applyChangelog]]'s
    * latest-wins fold as a continuously-materialized snapshot: per key,
    * state holds the highest-version change seen so far; each
    * micro-batch emits one refinement row per key whose winner CHANGED
    * (the key's current materialized row, tombstones flagged `deleted`
    * so a sink can drop the key). Downstream, "latest emission per key"
    * IS the snapshot — the streaming MERGE/CDF materializer.
    *
    * Why no watermark: latest-wins is COMMUTATIVE — max-by-version is
    * order-insensitive, so any arrival order converges to the same
    * state and a late change either wins (higher version → emit) or is
    * ignored (stale → silence). Nothing buffers, nothing waits;
    * contrast [[funnelStream]]/[[retentionActivationsStream]], whose
    * greedy/first-event semantics are order-SENSITIVE and must buffer
    * to the watermark. The intermediate refinement SEQUENCE does depend
    * on batch boundaries (each batch emits at most one row per key);
    * the final row per key does not — that is the spec'd contract.
    *
    * State per key: one (version, deleted, value) triple for the key's
    * lifetime — the snapshot IS the state, O(live keys) rows in the
    * state store (RocksDB territory at fleet scale, the standard keyed
    * contract). Tombstoned keys retain their version so a replayed or
    * late lower-version upsert cannot resurrect them (standard CDC
    * compaction; dropping the entry would lose exactly that guard).
    *
    * In batch (`changes.isStreaming == false`) one pass selects each
    * key's winner and emits only live rows — bit-equal to
    * `applyChangelog(empty base, changes)` (spec-pinned). Determinism
    * contract as the batch operator: (key, version) unique.
    */
  def cdcApplyStream(changes: DataFrame, key: String, versionCol: String,
      deleteCol: String, valueCol: String): Dataset[CdcCurrent] = {
    import changes.sparkSession.implicits._
    val streaming = changes.isStreaming
    changes.select(col(key).cast("long").as("key"),
        col(versionCol).cast("long").as("version"),
        coalesce(col(deleteCol), lit(false)).as("deleted"),
        col(valueCol).cast("double").as("value"))
      .as[CdcIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState[CdcState, CdcCurrent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (k: Long, it: Iterator[CdcIn], state: GroupState[CdcState]) =>
          var cur = state.getOption
          var changed = false
          it.foreach { r =>
            if (cur.forall(_.version < r.version)) {
              cur = Some(CdcState(r.version, r.deleted, r.value))
              changed = true
            }
          }
          if (streaming) {
            if (changed) {
              state.update(cur.get)
              val c = cur.get
              Iterator(CdcCurrent(k, c.version, c.deleted, c.value))
            } else Iterator.empty
          } else {
            cur.filter(!_.deleted)
              .map(c => CdcCurrent(k, c.version, c.deleted, c.value))
              .iterator
          }
      }
  }

  /** Streaming dedup on event_id with bounded state: duplicates arriving
    * within the watermark horizon are dropped; state evicts beyond it.
    * (Batch equivalent: dropDuplicates — exercised by the dedup specs.)
    */
  def dedupedStream(events: DataFrame, watermarkDelay: String): DataFrame =
    withEventWatermark(events, watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user running state maintained with mapGroupsWithState: event
    * count, value sum, last-seen timestamp. Demonstrates custom state the
    * built-in aggs can't express (e.g. conditional resets); timeout-based
    * eviction bounds state size.
    */
  case class UserEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      value: Double)
  case class UserState(n: Long, total: Double)
  case class UserSnapshot(user_id: Long, n_events: Long, total_value: Double)

  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserSnapshot](
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          val (n, total) = batch.foldLeft((prev.n, prev.total)) {
            case ((c, t), e) => (c + 1, t + e.value)
          }
          state.update(UserState(n, total))
          UserSnapshot(uid, n, total)
      }
  }

  /** Threshold-crossing alerts with flatMapGroupsWithState: each user emits
    * ONE ROW PER multiple of `step` their running value total crosses in
    * this micro-batch — zero to many outputs per group invocation, which
    * `mapGroupsWithState`'s exactly-one contract cannot express. State is
    * the same running total as [[runningUserTotals]].
    */
  case class UserAlert(user_id: Long, crossed: Double, total_value: Double)

  def thresholdAlerts(events: Dataset[UserEvent],
      step: Double): Dataset[UserAlert] = {
    // step <= 0 would make the crossing loop non-terminating inside a task
    require(step > 0, s"step must be positive, got $step")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prev.n
          var total = prev.total
          val alerts = Seq.newBuilder[UserAlert]
          batch.foreach { e =>
            val before = total
            total += e.value
            n += 1
            var k = math.floor(before / step).toLong + 1
            while (k * step <= total) {
              alerts += UserAlert(uid, k * step, total)
              k += 1
            }
          }
          state.update(UserState(n, total))
          alerts.result().iterator
      }
  }

  /** Stream-stream interval join: each fact row (e.g. purchase) joined to
    * the same key's context rows (e.g. views) whose timestamps fall in
    * `[factTs − before, factTs + after]`. The context side is renamed
    * with a `ctx_` prefix so both inputs can come from the same source.
    *
    * This is THE state-bounding shape for stream-stream joins: the
    * equality key routes both sides to the same shuffle partition, and
    * the two-sided time-range condition is what lets Structured Streaming
    * evict join state (watermark + interval bound per side). A
    * stream-stream join whose condition has no time bound must hold every
    * row forever — a leak, not a join, at fleet scale. In batch the same
    * function compiles to a sort-merge join on the key with the range as
    * residual (q66 hash-gates those semantics against DuckDB).
    */
  def intervalJoin(facts: DataFrame, context: DataFrame, key: String,
      factTs: String, ctxTs: String, before: String, after: String,
      joinType: String = "inner"): DataFrame = {
    val ctx = context.columns.foldLeft(context) { (df, c) =>
      df.withColumnRenamed(c, s"ctx_$c") }
    facts.join(ctx,
      facts(key) === ctx(s"ctx_$key") &&
        ctx(s"ctx_$ctxTs") >= facts(factTs) - expr(s"INTERVAL $before") &&
        ctx(s"ctx_$ctxTs") <= facts(factTs) + expr(s"INTERVAL $after"),
      joinType)
      .drop(s"ctx_$key")
  }

  /** The finance categorizer under streaming: it is a stateless projection
    * (one flat CaseWhen), so it lifts to readStream unchanged — this just
    * documents/spec-anchors that property.
    */
  def categorizeStream(transactions: DataFrame): DataFrame =
    graft.finance.Categorizer.pipeline(transactions)

  def outputModeFor(query: String): OutputMode = query match {
    case "session" | "tumbling" => OutputMode.Append()
    case _ => OutputMode.Update()
  }
}
