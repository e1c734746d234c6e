package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming specs: feed MemoryStream micro-batches through the SAME
  * transforms the batch driver queries use and check streamed results
  * equal the batch computation — the unified-API contract.
  */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._
  import EventStreams._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val eventRows = Seq(
    (1L, ts("2024-01-01 10:05:00"), 1L, "click", 10.0),
    (2L, ts("2024-01-01 10:20:00"), 1L, "click", 5.0),
    (3L, ts("2024-01-01 11:30:00"), 1L, "view", 2.0),   // new session (>30m gap)
    (4L, ts("2024-01-01 10:10:00"), 2L, "click", 7.0),
    (5L, ts("2024-01-01 12:00:00"), 2L, "view", 1.0))

  private def eventsDf(rows: Seq[(Long, Timestamp, Long, String, Double)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("streaming tumbling agg (complete mode) equals batch tumbling agg") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = tumblingAgg(
        stream.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
        "1 hour")
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      stream.addData(eventRows.take(3))
      q.processAllAvailable()
      stream.addData(eventRows.drop(3))
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .orderBy("window_start", "event_type").collect().toSeq
      val batch = tumblingAgg(eventsDf(eventRows), "1 hour")
        .orderBy("window_start", "event_type").collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("batch session windows: gap semantics and end = last + gap") {
    val out = sessionAgg(eventsDf(eventRows), "30 minutes")
      .orderBy("user_id", "session_start").collect()
    // user 1: events 10:05,10:20 in one session (gap 15m), 11:30 alone
    assert(out.length === 4)
    val s0 = out(0)
    assert(s0.getAs[Timestamp]("session_start") === ts("2024-01-01 10:05:00"))
    assert(s0.getAs[Timestamp]("session_end") === ts("2024-01-01 10:50:00"))
    assert(s0.getAs[Long]("n_events") === 2L)
    assert(s0.getAs[Double]("sum_value") === 15.0)
  }

  test("windowed HLL: streamed registers merged across micro-batches " +
      "equal the batch run AND the q71 Column estimator, bit for bit") {
    implicit val sqlCtx = spark.sqlContext
    // 40 users in window A (20 repeated across batches — a naive
    // per-batch count would double-count them), 25 in window B
    val winA = (1 to 40).map(u =>
      (u.toLong, ts("2024-01-01 10:05:00"), u.toLong, "click", 1.0))
    val winB = (1 to 25).map(u =>
      (1000L + u, ts("2024-01-01 11:30:00"), 300L + u, "view", 1.0))
    val all = winA ++ winB
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = windowedHllDistinct(
        stream.toDF().toDF(
          "event_id", "ts", "user_id", "event_type", "value"),
        "1 hour")
      .writeStream.format("memory").queryName("whll_out")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData(winA.take(25))
      q.processAllAvailable()
      stream.addData(winA.drop(5) ++ winB) // users 6..25 replayed
      q.processAllAvailable()
      val latest = spark.table("whll_out").collect()
        .groupBy(_.getAs[Timestamp]("window_start"))
        .map { case (w, rs) =>
          val r = rs.maxBy(_.getAs[Long]("n_updates"))
          w -> (r.getAs[Long]("v_empty"), r.getAs[Long]("hll_est")) }
      val batch = windowedHllDistinct(eventsDf(all), "1 hour").toDF()
        .collect()
        .map(r => r.getAs[Timestamp]("window_start") ->
          (r.getAs[Long]("v_empty"), r.getAs[Long]("hll_est"))).toMap
      assert(latest === batch)
      // and both equal the batch Column estimator (the q71 operator) on
      // the same grouping — the Scala estimator IS the Column estimator
      val colEst = graft.operators.Sketches.hllDistinct(
          eventsDf(all), window(col("ts"), "1 hour")("start"),
          col("user_id"))
        .collect()
        .map(r => r.getAs[Timestamp]("scope") ->
          (r.getAs[Long]("v_empty"), r.getAs[Long]("hll_est"))).toMap
      assert(batch === colEst)
      // sanity: window A really merged registers across batches (40
      // distinct; p=10 at n=40 sits in the linear-counting regime and is
      // exact for almost all register layouts — assert close, not a
      // per-batch sum like 60)
      val estA = batch(ts("2024-01-01 10:00:00"))._2
      assert(estA >= 38 && estA <= 42, s"window A estimate $estA")
    } finally q.stop()
  }

  test("windowed HLL: event-time timeout evicts a window's registers " +
      "once the watermark passes end + ttl") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = windowedHllDistinct(
        stream.toDF().toDF(
          "event_id", "ts", "user_id", "event_type", "value"),
        "1 hour", stateTtlMs = 1000L)
      .writeStream.format("memory").queryName("whll_evict_out")
      .outputMode(OutputMode.Update()).start()
    try {
      def stateRows: Long =
        q.recentProgress.last.stateOperators(0).numRowsTotal
      stream.addData((1 to 5).map(u =>
        (u.toLong, ts("2024-01-01 10:05:00"), u.toLong, "click", 1.0)))
      q.processAllAvailable()
      assert(stateRows === 1L) // window A's registers
      // the 12:30 event advances the watermark to 12:20 AFTER its data
      // batch; processAllAvailable then runs the follow-up no-data
      // micro-batch in which the event-time timeout fires (12:20 >
      // A.end 11:00 + 1 s ttl) and A's registers are removed. The
      // progress history shows both: A+C coexisting in the data batch,
      // then C alone after the timeout batch.
      stream.addData(Seq(
        (100L, ts("2024-01-01 12:30:00"), 100L, "view", 1.0)))
      q.processAllAvailable()
      val totals = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators(0).numRowsTotal)
      assert(totals.contains(2L), s"A+C never coexisted: $totals")
      assert(stateRows === 1L,
        s"window A's registers survived the timeout: $totals")
      // the evicted window emitted nothing on timeout (update-mode
      // consumers already hold its last refinement: est = 5 users)
      val aRows = spark.table("whll_evict_out").collect()
        .filter(_.getAs[Timestamp]("window_start") ===
          ts("2024-01-01 10:00:00"))
      assert(aRows.map(r => (r.getAs[Long]("n_updates"),
        r.getAs[Long]("hll_est"))).toSeq === Seq((1L, 5L)))
    } finally q.stop()
  }

  test("windowed CMS: streamed cells merged across micro-batches equal " +
      "the batch run, estimates dominate exact counts, and a probe " +
      "absent from a window reads its (collision-only) cells") {
    implicit val sqlCtx = spark.sqlContext
    val probes = Seq("click", "view", "purchase")
    // window A: 7 clicks + 3 views split across two batches (2 clicks
    // replayed as genuine repeat OCCURRENCES — CMS counts occurrences,
    // so the streamed cells must sum to 7+3, not dedup); window B: views
    // only, so the 'click'/'purchase' probes exercise the empty-cell path
    val winA = (1 to 7).map(i =>
      (i.toLong, ts("2024-01-01 10:05:00"), i.toLong, "click", 1.0)) ++
      (1 to 3).map(i =>
        (100L + i, ts("2024-01-01 10:40:00"), i.toLong, "view", 1.0))
    val winB = (1 to 4).map(i =>
      (200L + i, ts("2024-01-01 11:30:00"), i.toLong, "view", 1.0))
    val all = winA ++ winB
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = windowedCmsFrequencies(
        stream.toDF().toDF(
          "event_id", "ts", "user_id", "event_type", "value"),
        "1 hour", probes)
      .writeStream.format("memory").queryName("wcms_out")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData(winA.take(5))
      q.processAllAvailable()
      stream.addData(winA.drop(5) ++ winB)
      q.processAllAvailable()
      val latest = spark.table("wcms_out").collect()
        .groupBy(r => (r.getAs[Timestamp]("window_start"),
          r.getAs[String]("probe")))
        .map { case (k, rs) =>
          k -> rs.maxBy(_.getAs[Long]("n_updates")).getAs[Long]("cms_est") }
      val batch = windowedCmsFrequencies(eventsDf(all), "1 hour", probes)
        .toDF().collect()
        .map(r => (r.getAs[Timestamp]("window_start"),
          r.getAs[String]("probe")) -> r.getAs[Long]("cms_est")).toMap
      assert(latest === batch)
      // one-sided error: estimate ≥ exact occurrence count, and with 2
      // values in 4×1024 cells the toy corpus collides nowhere
      assert(batch((ts("2024-01-01 10:00:00"), "click")) === 7L)
      assert(batch((ts("2024-01-01 10:00:00"), "view")) === 3L)
      assert(batch((ts("2024-01-01 10:00:00"), "purchase")) === 0L)
      assert(batch((ts("2024-01-01 11:00:00"), "view")) === 4L)
      assert(batch((ts("2024-01-01 11:00:00"), "click")) === 0L)
    } finally q.stop()
  }

  test("windowed CMS: event-time timeout evicts a window's cells once " +
      "the watermark passes end + ttl") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = windowedCmsFrequencies(
        stream.toDF().toDF(
          "event_id", "ts", "user_id", "event_type", "value"),
        "1 hour", Seq("click"), stateTtlMs = 1000L)
      .writeStream.format("memory").queryName("wcms_evict_out")
      .outputMode(OutputMode.Update()).start()
    try {
      def stateRows: Long =
        q.recentProgress.last.stateOperators(0).numRowsTotal
      stream.addData((1 to 5).map(u =>
        (u.toLong, ts("2024-01-01 10:05:00"), u.toLong, "click", 1.0)))
      q.processAllAvailable()
      assert(stateRows === 1L) // window A's cells
      // 12:30 advances the watermark past A.end + ttl in the follow-up
      // no-data micro-batch → A's cells evict, C's remain
      stream.addData(Seq(
        (100L, ts("2024-01-01 12:30:00"), 100L, "view", 1.0)))
      q.processAllAvailable()
      val totals = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators(0).numRowsTotal)
      assert(totals.contains(2L), s"A+C never coexisted: $totals")
      assert(stateRows === 1L,
        s"window A's cells survived the timeout: $totals")
      // the evicted window emitted nothing on timeout; its last
      // refinement stands (5 clicks)
      val aRows = spark.table("wcms_evict_out").collect()
        .filter(_.getAs[Timestamp]("window_start") ===
          ts("2024-01-01 10:00:00"))
      assert(aRows.map(r => (r.getAs[Long]("n_updates"),
        r.getAs[String]("probe"), r.getAs[Long]("cms_est"))).toSeq ===
        Seq((1L, "click", 5L)))
    } finally q.stop()
  }

  test("streaming as-of join: watermark-gated emission lets out-of-order " +
      "context win; streamed equals the batch operator; null when no " +
      "context precedes") {
    implicit val sqlCtx = spark.sqlContext
    val facts = MemoryStream[(Long, Timestamp, Long, Double)]
    val ctxs = MemoryStream[(Long, Timestamp, Double)]
    val factsDf = facts.toDF()
      .toDF("event_id", "ts", "user_id", "purchase_value")
    val ctxDf = ctxs.toDF().toDF("user_id", "ts", "view_value")
    val q = asofBackwardStream(factsDf, ctxDf, key = "user_id", ts = "ts",
        factId = "event_id", factVal = "purchase_value",
        ctxVal = "view_value")
      .writeStream.format("memory").queryName("asof_out")
      .outputMode(OutputMode.Append()).start()
    val allFacts = Seq(
      (100L, ts("2024-01-01 09:00:00"), 1L, 5.0), // no context precedes
      (101L, ts("2024-01-01 10:30:00"), 1L, 10.0),
      (102L, ts("2024-01-01 11:00:00"), 1L, 20.0))
    val allCtx = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:25:00"), 2.0),  // arrives AFTER fact 101
      (1L, ts("2024-01-01 10:58:00"), 3.0),
      (1L, ts("2024-01-01 12:00:00"), 9.0))
    try {
      ctxs.addData(allCtx.take(1)); facts.addData(allFacts.take(2))
      q.processAllAvailable()
      // fact 101 (10:30) is beyond the watermark (10:20) → pending. The
      // 10:25 context arrives only NOW — premature emission would have
      // wrongly matched 101 to 10:00
      ctxs.addData(allCtx.slice(1, 2)); facts.addData(allFacts.drop(2))
      q.processAllAvailable() // wm → 10:50 ≥ 10:30: fact 101 emits
      ctxs.addData(allCtx.drop(2))
      q.processAllAvailable() // wm → 11:50 ≥ 11:00: fact 102 emits
      val streamed = spark.table("asof_out")
        .select("fact_id", "ts_matched", "ctx_value")
        .as[(Long, Option[Timestamp], Option[Double])]
        .collect().toSeq.sortBy(_._1)
      assert(streamed === Seq(
        (100L, None, None),
        (101L, Some(ts("2024-01-01 10:25:00")), Some(2.0)),
        (102L, Some(ts("2024-01-01 10:58:00")), Some(3.0))))
      // batch execution of the SAME function == the batch operator
      val fBatch = allFacts
        .toDF("event_id", "ts", "user_id", "purchase_value")
      val cBatch = allCtx.toDF("user_id", "ts", "view_value")
      val viaStream = asofBackwardStream(fBatch, cBatch,
          key = "user_id", ts = "ts", factId = "event_id",
          factVal = "purchase_value", ctxVal = "view_value")
        .toDF()
        .select(col("fact_id").as("event_id"), col("ts_matched"),
          col("ctx_value").as("view_value"))
        .orderBy("event_id").collect().toSeq
      val viaBatchOp = graft.operators.AsOf.joinBackward(
          fBatch, cBatch, key = "user_id", ts = "ts")
        .select(col("event_id"), col("ts_matched"), col("view_value"))
        .orderBy("event_id").collect().toSeq
      assert(viaStream === viaBatchOp)
    } finally q.stop()
  }

  test("streaming funnel: a late-but-in-horizon middle step applies in " +
      "event-time order — premature matching would lose the click; " +
      "streamed equals batch funnelTimes unpivoted") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val steps = Seq("signup", "view", "click")
    val q = funnelStream(
        stream.toDF().toDF("event_id", "ts", "user_id", "event_type",
          "value"),
        steps, "user_id", "ts", "event_type")
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append()).start()
    val all = Seq(
      // user 1: click ARRIVES before the view it must follow — only the
      // watermark buffer lets the view slot in underneath it
      (1L, ts("2024-01-01 10:00:00"), 1L, "signup", 0.0),
      (2L, ts("2024-01-01 10:20:00"), 1L, "click", 0.0),
      (3L, ts("2024-01-01 10:12:00"), 1L, "view", 0.0),
      // user 2: watermark driver; second signup must not re-fire step 0
      (4L, ts("2024-01-01 10:40:00"), 2L, "signup", 0.0),
      (5L, ts("2024-01-01 11:00:00"), 2L, "signup", 0.0))
    try {
      stream.addData(all.take(1)); q.processAllAvailable() // wm 09:50
      stream.addData(all.slice(1, 2)); q.processAllAvailable()
      // wm → 10:10: signup applies+emits; click (10:20) still pending —
      // and its view hasn't even arrived yet
      stream.addData(all.slice(2, 3)); q.processAllAvailable()
      stream.addData(all.slice(3, 4)); q.processAllAvailable()
      // wm → 10:30 ≥ view(10:12), click(10:20): both apply in ts order
      stream.addData(all.drop(4)); q.processAllAvailable()
      // wm → 10:50 ≥ user-2 signup(10:40)
      val streamed = spark.table("funnel_out")
        .as[(Long, String, Timestamp)]
        .collect().toSeq.sortBy(r => (r._1, r._3.getTime))
      assert(streamed === Seq(
        (1L, "signup", ts("2024-01-01 10:00:00")),
        (1L, "view", ts("2024-01-01 10:12:00")),
        (1L, "click", ts("2024-01-01 10:20:00")),
        (2L, "signup", ts("2024-01-01 10:40:00"))))

      // batch execution of the SAME function == funnelTimes unpivoted
      val batchDf = eventsDf(all)
      val viaStream = funnelStream(batchDf, steps,
          "user_id", "ts", "event_type")
        .toDF().as[(Long, String, Timestamp)]
        .collect().toSeq.sortBy(r => (r._1, r._3.getTime))
      val viaBatchOp = graft.operators.Sessions.funnelTimes(
          batchDf, steps, "user_id", "ts", "event_type")
        .collect().flatMap { r =>
          steps.zipWithIndex.flatMap { case (s, i) =>
            Option(r.getTimestamp(i + 1)).map(t => (r.getLong(0), s, t)) }
        }.toSeq.sortBy(r => (r._1, r._3.getTime))
      assert(viaStream === viaBatchOp)
      assert(streamed === viaStream)
    } finally q.stop()
  }

  test("funnelStream in batch equals funnelTimes unpivoted on random " +
      "corpora (property)") {
    val rnd = new scala.util.Random(23)
    val steps = Seq("signup", "view", "click")
    for (trial <- 1 to 3) {
      val types = Vector("signup", "view", "click", "purchase")
      val rows = (1 to 300).map { i =>
        (i.toLong, new Timestamp(1700000000000L + rnd.nextInt(90000) * 1000L),
          rnd.nextInt(25).toLong, types(rnd.nextInt(types.size)), 0.0)
      }
      val df = eventsDf(rows)
      val viaStream = funnelStream(df, steps, "user_id", "ts", "event_type")
        .toDF().as[(Long, String, Timestamp)]
        .collect().toSeq.sortBy(r => (r._1, r._3.getTime, r._2))
      val viaBatch = graft.operators.Sessions.funnelTimes(
          df, steps, "user_id", "ts", "event_type")
        .collect().flatMap { r =>
          steps.zipWithIndex.flatMap { case (s, i) =>
            Option(r.getTimestamp(i + 1)).map(t => (r.getLong(0), s, t)) }
        }.toSeq.sortBy(r => (r._1, r._3.getTime, r._2))
      assert(viaStream === viaBatch, s"trial $trial")
    }
  }

  test("streaming retention: an out-of-order first batch must not pin " +
      "the wrong cohort — events apply in event-time order once the " +
      "watermark releases them; pending activations flush via timeout") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = retentionActivationsStream(
        stream.toDF().toDF("event_id", "ts", "user_id", "event_type",
          "value"),
        key = "user_id", ts = "ts", period = "day")
      .writeStream.format("memory").queryName("ret_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // b1: user 2 seeds the watermark
      stream.addData(Seq((1L, ts("2024-01-01 10:00:00"), 2L, "e", 0.0)))
      q.processAllAvailable() // wm -> 09:50
      // b2: user 1's DAY-2 event arrives BEFORE its day-1 event; both
      // beyond the watermark, so both buffer — premature application
      // would pin cohort = Jan 2 and emit offset 0 for the wrong day
      stream.addData(Seq(
        (2L, ts("2024-01-02 11:00:00"), 1L, "e", 0.0),
        (3L, ts("2024-01-01 11:00:00"), 1L, "e", 0.0)))
      q.processAllAvailable() // wm -> Jan 2 10:50
      // b3: timeouts fire — u1 applies ONLY its Jan 1 event (Jan 2 still
      // ahead of the watermark): cohort Jan 1, offset 0; u2 offset 0
      stream.addData(Seq((4L, ts("2024-01-02 12:00:00"), 3L, "e", 0.0)))
      q.processAllAvailable() // wm -> Jan 2 11:50
      // b4: u1's Jan-2 activation (offset 1) and u3's offset 0 release
      stream.addData(Seq((5L, ts("2024-01-02 13:00:00"), 4L, "e", 0.0)))
      q.processAllAvailable() // wm -> Jan 2 12:50
      val streamed = spark.table("ret_out")
        .as[(Long, Int, Int)].collect().toSeq.sorted
      val day0 = java.time.LocalDate.of(1970, 1, 1)
      def d(s: String): Int =
        java.time.temporal.ChronoUnit.DAYS
          .between(day0, java.time.LocalDate.parse(s)).toInt
      assert(streamed === Seq(
        (1L, d("2024-01-01"), 0), (1L, d("2024-01-01"), 1),
        (2L, d("2024-01-01"), 0), (3L, d("2024-01-02"), 0)))
    } finally q.stop()
  }

  test("streaming retention state is bounded: after hundreds of distinct " +
      "active periods, per-key state is three ints plus the (drained) " +
      "watermark-horizon buffer — no per-period collection survives") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("ret_state_").toString
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = retentionActivationsStream(
        stream.toDF().toDF("event_id", "ts", "user_id", "event_type",
          "value"),
        key = "user_id", ts = "ts", period = "day")
      .writeStream.format("memory").queryName("ret_state_out")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      // 200 distinct active days for ONE key, ascending micro-batches;
      // two sentinel batches on another key then advance the watermark
      // far past everything and fire the timeout flush of the buffer
      val base = ts("2024-01-01 00:00:00").getTime
      (0 until 200).grouped(50).foreach { chunk =>
        stream.addData(chunk.map(d => (d.toLong,
          new Timestamp(base + d.toLong * 86400000L), 7L, "e", 0.0)))
        q.processAllAvailable()
      }
      stream.addData(Seq((999L,
        new Timestamp(base + 400L * 86400000L), 8L, "e", 0.0)))
      q.processAllAvailable()
      stream.addData(Seq((1000L,
        new Timestamp(base + 401L * 86400000L), 8L, "e", 0.0)))
      q.processAllAvailable()
      assert(spark.table("ret_state_out").where($"key" === 7L).count()
        === 200)
      // Read the state store back: the per-key state value must be the
      // RetentionState scalars plus an EMPTY pending buffer — were the
      // old emitted-Set state still in place, key 7 would carry a
      // 200-element collection here.
      val st = spark.read.format("statestore").load(ckpt)
      val stateType = st.schema("value").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]("groupState")
        .dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      assert(stateType.fieldNames.toSeq
        === Seq("cohortPd", "cohortPm", "maxOff", "pending"))
      val k7 = st
        .where(col("key.value") === 7L) // groupByKey(Long) key field: value
        .select("value.groupState.maxOff", "value.groupState.pending")
        .collect()
      assert(k7.length === 1)
      assert(k7.head.getInt(0) === 199)
      assert(k7.head.getSeq[Any](1).isEmpty)
    } finally q.stop()
  }

  test("streaming retention in batch aggregates to exactly " +
      "retentionMatrix on random corpora, for day, week and month " +
      "periods (property)") {
    val rnd = new scala.util.Random(29)
    for (period <- Seq("day", "week", "month"); trial <- 1 to 2) {
      val rows = (1 to 400).map { i =>
        (i.toLong,
          new Timestamp(1700000000000L +
            rnd.nextInt(90 * 24 * 3600).toLong * 1000L),
          rnd.nextInt(30).toLong, "e", 0.0)
      }
      val df = eventsDf(rows)
      val acts = retentionActivationsStream(df, "user_id", "ts", period)
        .toDF()
        .select(date_add(to_date(lit("1970-01-01")), col("cohort_days"))
            .as("cohort"),
          col("offset"), col("key"))
      val cells = acts.groupBy("cohort", "offset")
        .agg(count(lit(1)).as("n_active"))
      val sizes = acts.filter(col("offset") === 0)
        .groupBy("cohort").agg(count(lit(1)).as("n_cohort"))
      val viaStream = cells.join(sizes, "cohort")
        .withColumn("ret_rate",
          round(col("n_active").cast("double") / col("n_cohort"), 4))
        .select("cohort", "offset", "n_active", "n_cohort", "ret_rate")
        .orderBy("cohort", "offset").collect().toSeq
      val viaBatch = graft.operators.Sessions.retentionMatrix(
          df, "user_id", "ts", period)
        .orderBy("cohort", "offset").collect().toSeq
      assert(viaStream === viaBatch, s"period=$period trial=$trial")
    }
  }

  test("streaming CDC apply: latest-wins refinement stream — stale " +
      "late arrivals emit NOTHING, tombstones flag deletion, last " +
      "emission per key is the materialized snapshot") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Boolean, Double)]
    val q = cdcApplyStream(
        stream.toDF().toDF("k", "v", "del", "amount"),
        key = "k", versionCol = "v", deleteCol = "del",
        valueCol = "amount")
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(Seq((1L, 3L, false, 30.0), (2L, 1L, false, 10.0)))
      q.processAllAvailable()
      // key 1: version 2 arrives AFTER version 3 — stale, no emission
      stream.addData(Seq((1L, 2L, false, 20.0)))
      q.processAllAvailable()
      // key 2 upgrades; key 3 born; key 1 tombstoned at version 5
      stream.addData(Seq((2L, 4L, false, 40.0), (3L, 1L, false, 7.0),
        (1L, 5L, true, 0.0)))
      q.processAllAvailable()
      val rows = spark.table("cdc_out")
        .as[(Long, Long, Boolean, Double)].collect().toSeq
      // the stale batch emitted nothing: 2 + 0 + 3 emissions
      assert(rows.length === 5)
      val snapshot = rows.groupBy(_._1).view
        .mapValues(_.maxBy(_._2)).values.toSet
      assert(snapshot === Set(
        (1L, 5L, true, 0.0),   // tombstoned — sink drops the key
        (2L, 4L, false, 40.0),
        (3L, 1L, false, 7.0)))
    } finally q.stop()
  }

  test("streaming CDC apply in batch equals applyChangelog on an empty " +
      "base over random changelogs (property)") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val rows = rnd.shuffle((1 to 200).map { v =>
        (rnd.nextInt(40).toLong, v.toLong, rnd.nextInt(10) == 0,
          rnd.nextInt(1000) / 10.0)
      })
      val changes = rows.toDF("k", "v", "del", "amount")
      val viaStream = cdcApplyStream(changes, "k", "v", "del", "amount")
        .toDF().select(col("key").as("k"), col("value").as("amount"))
        .as[(Long, Double)].collect().toSet
      val empty = changes.select(col("k"), col("amount")).limit(0)
      val viaBatch = graft.operators.Temporal.applyChangelog(
          empty, changes, key = "k", versionCol = "v", deleteCol = "del")
        .as[(Long, Double)].collect().toSet
      assert(viaStream === viaBatch, s"trial $trial")
    }
  }

  test("streaming dedup within watermark drops replayed event_ids") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = dedupedStream(
        stream.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
        "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(eventRows.take(2))
      q.processAllAvailable()
      stream.addData(eventRows.take(2))  // exact replay (at-least-once source)
      stream.addData(eventRows.drop(2))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() === eventRows.length.toLong)
    } finally q.stop()
  }

  test("mapGroupsWithState running totals accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[UserEvent]
    val q = runningUserTotals(stream.toDS())
      .writeStream.format("memory").queryName("totals_out")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData(UserEvent(1L, ts("2024-01-01 10:00:00"), 1L, 10.0))
      q.processAllAvailable()
      stream.addData(UserEvent(2L, ts("2024-01-01 10:05:00"), 1L, 5.0),
        UserEvent(3L, ts("2024-01-01 10:06:00"), 2L, 7.0))
      q.processAllAvailable()
      val rows = spark.table("totals_out").collect()
      val byUser = rows.groupBy(_.getAs[Long]("user_id"))
      assert(byUser(1L).map(_.getAs[Long]("n_events")).max === 2L)
      assert(byUser(1L).map(_.getAs[Double]("total_value")).max === 15.0)
      assert(byUser(2L).map(_.getAs[Long]("n_events")).max === 1L)
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits 0..n threshold alerts per batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[UserEvent]
    val q = thresholdAlerts(stream.toDS(), step = 5.0)
      .writeStream.format("memory").queryName("alerts_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: 3.0 then 4.0 → total 7, crosses 5 once; user 2: 1.0 → none
      stream.addData(UserEvent(1L, ts("2024-01-01 10:00:00"), 1L, 3.0),
        UserEvent(2L, ts("2024-01-01 10:01:00"), 1L, 4.0),
        UserEvent(3L, ts("2024-01-01 10:02:00"), 2L, 1.0))
      q.processAllAvailable()
      // user 1: +8.0 → total 15, crosses 10 AND 15 → TWO alerts in one batch
      stream.addData(UserEvent(4L, ts("2024-01-01 10:10:00"), 1L, 8.0))
      q.processAllAvailable()
      val rows = spark.table("alerts_out")
        .select("user_id", "crossed").as[(Long, Double)].collect().toSeq
      assert(rows.sorted === Seq((1L, 5.0), (1L, 10.0), (1L, 15.0)))
    } finally q.stop()
  }

  test("stream-stream interval join: watermarked both sides, bounded " +
      "state, streamed result equals the batch range join") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val views = MemoryStream[(Long, Timestamp, Double)]
    def pDf(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "ts", "user_id")
    def vDf(df: org.apache.spark.sql.DataFrame) =
      df.toDF("user_id", "ts", "value")
    val joined = intervalJoin(
      withEventWatermark(pDf(purchases.toDF()), "1 hour"),
      withEventWatermark(vDf(views.toDF()), "1 hour"),
      key = "user_id", factTs = "ts", ctxTs = "ts",
      before = "30 MINUTES", after = "30 MINUTES")
    val q = joined.writeStream.format("memory").queryName("ivj_out")
      .outputMode(OutputMode.Append()).start()
    val pRows = Seq(
      (100L, ts("2024-01-01 10:00:00"), 1L),
      (101L, ts("2024-01-01 12:00:00"), 1L))
    val vRows = Seq(
      (1L, ts("2024-01-01 09:45:00"), 1.0),  // within -30m of p100
      (1L, ts("2024-01-01 10:29:00"), 2.0),  // within +30m of p100
      (1L, ts("2024-01-01 11:00:00"), 4.0),  // matches neither
      (1L, ts("2024-01-01 12:30:00"), 8.0))  // within +30m of p101
    try {
      purchases.addData(pRows.take(1)); views.addData(vRows.take(2))
      q.processAllAvailable()
      purchases.addData(pRows.drop(1)); views.addData(vRows.drop(2))
      q.processAllAvailable()
      val streamed = spark.table("ivj_out")
        .select($"event_id", $"ctx_value").as[(Long, Double)]
        .collect().sorted.toSeq
      val batch = intervalJoin(pDf(pRows.toDF()), vDf(vRows.toDF()),
          key = "user_id", factTs = "ts", ctxTs = "ts",
          before = "30 MINUTES", after = "30 MINUTES")
        .select($"event_id", $"ctx_value").as[(Long, Double)]
        .collect().sorted.toSeq
      assert(streamed === batch)
      assert(streamed === Seq((100L, 1.0), (100L, 2.0), (101L, 8.0)))
    } finally q.stop()
  }

  test("windowed distinct users: chained stateful dedup+agg under " +
      "append mode; closed windows equal the batch distinct counts; " +
      "within-window duplicates deduplicate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = windowedDistinctUsers(
        withEventWatermark(stream.toDF()
          .toDF("event_id", "ts", "user_id", "event_type", "value"), "0 seconds"),
        "1 hour")
      .writeStream.format("memory").queryName("wdu_out")
      .outputMode(OutputMode.Append()).start()
    val rows = Seq(
      (1L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 10:20:00"), 1L, "click", 1.0), // dup user in-window
      (3L, ts("2024-01-01 10:30:00"), 2L, "view", 1.0),
      (4L, ts("2024-01-01 11:10:00"), 1L, "view", 1.0))  // next window
    try {
      stream.addData(rows.take(2))
      q.processAllAvailable()
      // user 1 again in the SAME window from a LATER micro-batch: the
      // dedup state, not batch-local distinct, must absorb it
      stream.addData(rows.drop(2))
      q.processAllAvailable()
      // advance the watermark past every window so they all close
      stream.addData(Seq((99L, ts("2024-01-01 13:00:00"), 9L, "click", 0.0)))
      q.processAllAvailable()
      val streamed = spark.table("wdu_out")
        .filter($"window_start" < ts("2024-01-01 12:00:00"))
        .select($"window_start", $"n_users").as[(Timestamp, Long)]
        .collect().sortBy(_._1.getTime).toSeq
      val batch = windowedDistinctUsers(rows
          .toDF("event_id", "ts", "user_id", "event_type", "value"), "1 hour")
        .select($"window_start", $"n_users").as[(Timestamp, Long)]
        .collect().sortBy(_._1.getTime).toSeq
      assert(streamed === batch)
      assert(streamed === Seq(
        (ts("2024-01-01 10:00:00"), 2L), (ts("2024-01-01 11:00:00"), 1L)))
    } finally q.stop()
  }

  test("stream-static join: a static dimension broadcasts into the " +
      "stream unchanged — streamed equals batch, no stream-side state") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val joined = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .join(org.apache.spark.sql.functions.broadcast(dim), "user_id")
      .select($"event_id", $"tier")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(eventRows.take(3))
      q.processAllAvailable()
      stream.addData(eventRows.drop(3))
      q.processAllAvailable()
      val streamed = spark.table("ssj_out").as[(Long, String)]
        .collect().sorted.toSeq
      val batch = eventsDf(eventRows).join(dim, "user_id")
        .select($"event_id", $"tier").as[(Long, String)]
        .collect().sorted.toSeq
      assert(streamed === batch)
      assert(streamed.map(_._2).distinct.sorted === Seq("basic", "gold"))
    } finally q.stop()
  }

  test("curation projections lift to streaming unchanged: fold + " +
      "deterministic stratified sample on a stream equal the batch run " +
      "row for row (pure hash-of-id filters — no state, no shuffle)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, String)]
    val streamed = graft.textops.Sampling.stratifiedSample(
        stream.toDF().toDF("doc_id", "source", "text")
          .withColumn("folded",
            graft.functions.TextExprs.foldText(col("text"))),
        stratumCol = "source", idCol = "doc_id",
        rates = Map("wiki" -> 1.0, "web" -> 0.5))
    val q = streamed.writeStream.format("memory")
      .queryName("curation_stream_out")
      .outputMode(OutputMode.Append()).start()
    val rows = (1L to 300L).map(i =>
      (i, if (i % 3 == 0) "wiki" else "web", s"Döc  number $i"))
    try {
      stream.addData(rows.take(150)); q.processAllAvailable()
      stream.addData(rows.drop(150)); q.processAllAvailable()
      val viaStream = spark.table("curation_stream_out")
        .select("doc_id", "folded").as[(Long, String)]
        .collect().toSeq.sorted
      val viaBatch = graft.textops.Sampling.stratifiedSample(
          rows.toDF("doc_id", "source", "text")
            .withColumn("folded",
              graft.functions.TextExprs.foldText(col("text"))),
          "source", "doc_id", Map("wiki" -> 1.0, "web" -> 0.5))
        .select("doc_id", "folded").as[(Long, String)]
        .collect().toSeq.sorted
      assert(viaStream === viaBatch)
      assert(viaStream.nonEmpty && viaStream.size < 300)
    } finally q.stop()
  }

  test("categorizer lifts to streaming unchanged (stateless projection)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String, Double)]
    val txStream = stream.toDF().toDF("account", "party", "amount")
      .withColumn("book_text", lit(null).cast("string"))
      .withColumn("purpose", lit(null).cast("string"))
      .withColumn("category_manual", lit(null).cast("string"))
    val q = EventStreams.categorizeStream(txStream)
      .writeStream.format("memory").queryName("cat_out")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(("giro", "REWE MARKT GMBH", -12.0),
        ("giro", "VISA APPLE.COM/BILL", -9.99))
      q.processAllAvailable()
      val cats = spark.table("cat_out").select("party", "category")
        .as[(String, String)].collect().toMap
      assert(cats("REWE MARKT GMBH") === "einkaufen")
      assert(cats("VISA APPLE.COM/BILL") === "media")
    } finally q.stop()
  }
}
