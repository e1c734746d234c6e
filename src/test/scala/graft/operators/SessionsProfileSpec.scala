package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch sessionization ([[Sessions]]) and exact percentile profiling
  * ([[Profile]]).
  */
class SessionsProfileSpec extends SparkSpec {
  import spark.implicits._

  private def ts(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  test("assignSessions: gap strictly greater than the threshold opens a " +
      "session; an exact-gap event stays") {
    val gap = 1000000L // 1s in micros
    val events = Seq(
      (1L, 0L), (1L, 1000000L),  // gap == threshold → same session
      (1L, 2000001L),            // gap 1000001 > threshold → new session
      (1L, 2500000L),
      (2L, 0L))                  // other key starts at 1 independently
      .map { case (k, us) => (k, ts(us)) }.toDF("k", "at")
    val got = Sessions.assignSessions(events, "k", "at", gap)
      .select($"k", $"at", $"session_seq")
      .as[(Long, Timestamp, Long)].collect()
      .sortBy(r => (r._1, r._2.getTime))
      .map(r => (r._1, r._3))
    assert(got.toSeq === Seq((1L, 1L), (1L, 1L), (1L, 2L), (1L, 2L),
      (2L, 1L)))
  }

  test("sessionStats rolls up bounds/counts/sums; one shuffle for " +
      "windows AND rollup") {
    val events = Seq(
      (1L, 0L, 1.0), (1L, 500000L, 2.0), (1L, 10000000L, 4.0))
      .map { case (k, us, v) => (k, ts(us), v) }.toDF("k", "at", "v")
    def stats = Sessions.sessionStats(events, "k", "at", "v",
      gapMicros = 1000000L)
    val got = stats.orderBy("session_seq")
      .select($"session_seq", $"n_events", $"sum_value")
      .as[(Long, Long, Double)].collect()
    assert(got.toSeq === Seq((1L, 2L, 3.0), (2L, 1L, 4.0)))
    val aqeKey = "spark.sql.adaptive.enabled"
    val prior = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    val plan = try stats.queryExecution.executedPlan
      finally spark.conf.set(aqeKey, prior)
    assert(plan.collect { case e: ShuffleExchangeLike => e }.size === 1,
      plan.toString)
  }

  test("percentilesDisc: rank-ceil selection, ties, singleton group, " +
      "p=1 takes the max") {
    val df = ((1 to 10).map(i => ("a", i.toDouble)) ++
      Seq(("b", 1.0), ("b", 2.0), ("b", 2.0), ("b", 2.0), ("b", 5.0)) ++
      Seq(("c", 42.0)))
      .toDF("g", "x")
    val got = Profile.percentilesDisc(df, "g", "x",
        ps = Seq(0.5, 0.9, 1.0))
      .orderBy("g")
      .select($"g", $"p50", $"p90", $"p100", $"n_rows")
      .as[(String, Double, Double, Double, Long)].collect()
    assert(got.toSeq === Seq(
      ("a", 5.0, 9.0, 10.0, 10L),   // ranks ceil(5)=5, ceil(9)=9, 10
      ("b", 2.0, 5.0, 5.0, 5L),     // rank 3 lands inside the tie run
      ("c", 42.0, 42.0, 42.0, 1L))) // singleton: every quantile = value
  }

  test("percentilesHistogram: one-sided upper-edge estimate within one " +
      "bin width of the exact type-1 percentile; constant group exact") {
    val df = ((1 to 1000).map(i => ("a", i.toDouble)) ++
      Seq.fill(7)(("k", 3.5))).toDF("g", "x")
    val bins = 64
    val got = Profile.percentilesHistogram(df, "g", "x",
        ps = Seq(0.5, 0.9, 0.99), bins = bins)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(2), r.getLong(3)))).toMap
    // exact type-1 references for group a: value at rank ceil(p*1000)
    val exact = Map("p50" -> 500.0, "p90" -> 900.0, "p99" -> 990.0)
    val width = (1000.0 - 1.0) / bins
    exact.foreach { case (pn, ex) =>
      val (est, n) = got(("a", pn))
      assert(n === 1000L)
      assert(est >= ex, s"$pn: upper edge must bound the exact value")
      assert(est - ex <= width + 1e-9, s"$pn: error beyond one bin width")
    }
    // constant group: every percentile IS the constant
    Seq("p50", "p90", "p99").foreach { pn =>
      assert(got(("k", pn))._1 === 3.5)
    }
  }

  test("percentilesHistogram: histogram state is bin-bounded and the " +
      "value pass has no sort (no window over raw rows)") {
    val df = (1 to 5000).map(i => ("g" + (i % 3), i.toDouble)).toDF("g", "x")
    val plan = Profile.percentilesHistogram(df, "g", "x", Seq(0.5), 32)
      .queryExecution.executedPlan.toString
    // the only Window runs over the per-(group, bin) frame — raw values
    // must reach it pre-aggregated (count per bin), never row-by-row
    assert(plan.contains("Window"),
      "expected the cumulative window over bins")
    val windowSection = plan.substring(plan.indexOf("Window"))
    assert(windowSection.contains("graft_cnt"),
      "cumulative window must consume per-bin counts, not raw rows:\n" +
        plan)
  }

  test("describe: per-column null/distinct counters, NATIVE-order " +
      "min/max rendered to string after aggregation, nulls excluded " +
      "from extrema") {
    val df = Seq[(java.lang.Long, String)](
      (10L, "b"), (2L, null), (10L, "a"), (null, "a"))
      .toDF("num", "s")
    val got = Profile.describe(df, Seq("num", "s"))
      .orderBy("column")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSeq
    assert(got === Seq(
      // 2 < 10 in the column's NATIVE order (the r15 semantics: extrema
      // aggregate natively, the string render happens once on the one
      // aggregated row — describeApprox keeps the lexicographic order
      // of its already-stringified unpivot, the documented seam)
      ("num", 4L, 1L, 2L, "2", "10"),
      ("s", 4L, 1L, 2L, "a", "b")))
  }

  test("robustOutliers: type-1 median and MAD, k*MAD flags the planted " +
      "spike but not the tail, constant group flags everything unequal") {
    val df = (Seq.fill(9)(("a", 10.0)) ++ Seq(("a", 10.4), ("a", 500.0)) ++
      Seq(("b", 1.0), ("b", 1.0), ("b", 1.0), ("b", 7.0)))
      .toDF("g", "x")
    val got = Profile.robustOutliers(df, "g", "x", k = 3.0)
      .orderBy("g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSeq
    // group a: n=11, median = rank ceil(5.5)=6 -> 10.0; deviations are
    // nine 0s, 0.4, 490 -> MAD = rank-6 pick = 0.0?? no: sorted devs
    // [0x9, 0.4, 490], rank 6 -> 0.0; MAD=0 -> any dev > 0 flags: 2 rows
    assert(got(0) === (("a", 11L, 10.0, 0.0, 2L)))
    // group b: n=4, median = rank ceil(2)=2 -> 1.0; devs [0,0,0,6],
    // MAD = rank-2 -> 0.0; outliers = the single 7.0
    assert(got(1) === (("b", 4L, 1.0, 0.0, 1L)))
  }

  test("quantileDiscNoSort equals percentilesDisc on random corpora " +
      "with ties, constant groups and adversarial in-bucket " +
      "concentration (property)") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val rows = (1 to 2000).map { _ =>
        val g = "g" + rnd.nextInt(4)
        // heavy ties + a mass concentrated near 0 with a stretched tail:
        // most values land in the histogram's first buckets
        val x = rnd.nextInt(4) match {
          case 0 => rnd.nextInt(5).toDouble
          case 1 => rnd.nextDouble() * 0.01
          case 2 => 7.0
          case _ => rnd.nextDouble() * 10000.0
        }
        (g, x)
      } ++ Seq(("const", 3.25), ("const", 3.25), ("const", 3.25))
      val df = rows.toDF("g", "x")
      for (p <- Seq(0.5, 0.9)) {
        val exact = Profile.percentilesDisc(df, "g", "x", Seq(p))
          .select($"g", col("p" + math.round(p * 100)))
          .as[(String, Double)].collect().toMap
        val noSort = Profile.quantileDiscNoSort(df, "g", "x", p)
          .as[(String, Double)].collect().toMap
        assert(noSort === exact, s"trial $trial p=$p")
      }
      // the multi-quantile twin: every p in ONE histogram + ONE bucket
      // pass must match the window formulation column for column,
      // n_rows included (two ps deliberately landing in the same bin
      // exercise the duplicate-target-bin path)
      val ps = Seq(0.5, 0.52, 0.9, 1.0)
      val names = ps.map(p => "p" + math.round(p * 100))
      def rowsOf(d: org.apache.spark.sql.DataFrame) = d
        .select($"g" +: names.map(col) :+ $"n_rows": _*)
        .collect().map(r => r.getString(0) ->
          (names.indices.map(i => r.getDouble(i + 1)),
            r.getLong(names.size + 1))).toMap
      assert(rowsOf(Profile.percentilesDiscNoSort(df, "g", "x", ps))
        === rowsOf(Profile.percentilesDisc(df, "g", "x", ps)),
        s"trial $trial multi-quantile")
      // the one-pass native-aggregate twin: percentile_disc's
      // smallest-value-with-cume_dist≥p IS the rank-ceil(p·n) element,
      // so it must match the window formulation bit for bit too
      assert(rowsOf(Profile.percentilesDiscAgg(df, "g", "x", ps))
        === rowsOf(Profile.percentilesDisc(df, "g", "x", ps)),
        s"trial $trial percentile_disc aggregate")
    }
  }

  test("robustOutliersApprox: same schema, exact n_rows, med/mad " +
      "within one bin width above the exact screen; constant group " +
      "exact") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 3000).map(i => ("a", rnd.nextDouble() * 100.0)) ++
      Seq.fill(5)(("k", 9.75))
    val df = rows.toDF("g", "x")
    val bins = 256
    val exact = Profile.robustOutliers(df, "g", "x", k = 3.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = Profile.robustOutliersApprox(df, "g", "x", k = 3.0,
        bins = bins)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val (nE, medE, madE) = exact("a")
    val (nA, medA, madA) = approx("a")
    assert(nA === nE)
    // one-sided: estimate >= exact, error <= one bin width of the range
    assert(medA >= medE && medA - medE <= 100.0 / bins + 1e-9)
    // the dev range is bounded by the value range; allow its bin width
    assert(madA >= 0 && math.abs(madA - madE) <= 2 * 100.0 / bins + 1e-9)
    assert(approx("k") === exact("k")) // constant group: both exact
  }

  test("describeApprox: same schema/counters as describe with the " +
      "distinct estimate inside HLL++ error") {
    val df = spark.range(20000)
      .select((col("id") % 3000).cast("string").as("s"),
        (col("id") % 7).as("m"))
    val exact = Profile.describe(df, Seq("s", "m"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val approx = Profile.describeApprox(df, Seq("s", "m"), p = 12)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    Seq("s", "m").foreach { c =>
      val (nE, nullE, dE) = exact(c)
      val (nA, nullA, dA) = approx(c)
      assert((nA, nullA) === ((nE, nullE))) // rows/nulls stay exact
      assert(math.abs(dA - dE) <= math.max(1L, (dE * 0.1).toLong),
        s"$c: approx $dA vs exact $dE")
    }
  }

  test("robustOutliers at high group cardinality equals a brute-force " +
      "median/MAD reference (the in-plan locate path, G x O(1) driver " +
      "traffic)") {
    val rnd = new scala.util.Random(43)
    val rows = (1 to 8000).map { _ =>
      ("g" + rnd.nextInt(200), (rnd.nextGaussian() * 50).floor / 4.0)
    }
    val got = Profile.robustOutliers(rows.toDF("g", "x"), "g", "x",
        k = 3.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    val ref = rows.groupBy(_._1).map { case (gv, rs) =>
      val xs = rs.map(_._2).sorted
      def med(s: Seq[Double]): Double = s(math.ceil(s.size * 0.5).toInt - 1)
      val m = med(xs)
      val devs = xs.map(x => math.abs(x - m)).sorted
      val ma = med(devs)
      gv -> ((xs.size.toLong, m, ma, devs.count(_ > 3.0 * ma).toLong))
    }
    assert(got === ref)
  }

  test("funnelTimes: greedy earliest strictly-increasing matching, " +
      "drop-off nulls, no row without step 0") {
    import java.sql.Timestamp
    def ts(x: String) = Timestamp.valueOf(x)
    val ev = Seq(
      // user 1: click BEFORE any view must not fill the click slot;
      // the view at the same instant as signup must not match (strict >)
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 09:59:00"), "click"),
      (1L, ts("2024-01-01 10:05:00"), "view"),
      (1L, ts("2024-01-01 10:06:00"), "click"),
      // user 2: completes nothing past signup
      (2L, ts("2024-01-01 11:00:00"), "signup"),
      // user 3: no signup at all -> no row
      (3L, ts("2024-01-01 12:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val out = Sessions.funnelTimes(ev,
        steps = Seq("signup", "view", "click"),
        key = "user_id", ts = "ts", typeCol = "event_type")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect().toSeq.sortBy(_._1)
    assert(out === Seq(
      (1L, Some(ts("2024-01-01 10:00:00")),
        Some(ts("2024-01-01 10:05:00")), Some(ts("2024-01-01 10:06:00"))),
      (2L, Some(ts("2024-01-01 11:00:00")), None, None)))
  }

  test("matchPattern with every step required reproduces funnelTimes " +
      "exactly (the special case)") {
    import java.sql.Timestamp
    import Sessions.PatternStep
    def ts(x: String) = Timestamp.valueOf(x)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 09:59:00"), "click"),
      (1L, ts("2024-01-01 10:05:00"), "view"),
      (1L, ts("2024-01-01 10:06:00"), "click"),
      (2L, ts("2024-01-01 11:00:00"), "signup"),
      (3L, ts("2024-01-01 12:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val steps = Seq("signup", "view", "click")
    val viaFunnel = Sessions.funnelTimes(ev, steps,
      key = "user_id", ts = "ts", typeCol = "event_type")
    val viaPattern = Sessions.matchPattern(ev,
      steps.map(s => PatternStep(s, col("event_type") === s)),
      key = "user_id", ts = "ts")
    assert(viaPattern.columns.toSeq === viaFunnel.columns.toSeq)
    assert(viaPattern.exceptAll(viaFunnel).isEmpty &&
      viaFunnel.exceptAll(viaPattern).isEmpty)
  }

  test("matchPattern: optional middle step — suffix anchors through the " +
      "skip; a matched optional step anchors the suffix (greedy)") {
    import java.sql.Timestamp
    import Sessions.PatternStep
    def ts(x: String) = Timestamp.valueOf(x)
    val ev = Seq(
      // user 1: no qualifying view (value too small) → bigview null,
      // purchase anchors on signup
      (1L, ts("2024-01-01 10:00:00"), "signup", 1.0),
      (1L, ts("2024-01-01 10:01:00"), "view", 5.0),
      (1L, ts("2024-01-01 10:02:00"), "purchase", 9.0),
      // user 2: qualifying view AFTER the purchase — greedy matches the
      // view, and no purchase follows it → purchase slot null
      (2L, ts("2024-01-01 11:00:00"), "signup", 1.0),
      (2L, ts("2024-01-01 11:02:00"), "purchase", 9.0),
      (2L, ts("2024-01-01 11:03:00"), "view", 50.0),
      // user 3: full chain in order
      (3L, ts("2024-01-01 12:00:00"), "signup", 1.0),
      (3L, ts("2024-01-01 12:01:00"), "view", 50.0),
      (3L, ts("2024-01-01 12:02:00"), "purchase", 9.0))
      .toDF("user_id", "ts", "event_type", "value")
    val out = Sessions.matchPattern(ev, Seq(
        PatternStep("signup", col("event_type") === "signup"),
        PatternStep("bigview",
          col("event_type") === "view" && col("value") > 10,
          optional = true),
        PatternStep("purchase", col("event_type") === "purchase")),
      key = "user_id", ts = "ts")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect().toSeq.sortBy(_._1)
    assert(out === Seq(
      (1L, Some(ts("2024-01-01 10:00:00")), None,
        Some(ts("2024-01-01 10:02:00"))),
      (2L, Some(ts("2024-01-01 11:00:00")),
        Some(ts("2024-01-01 11:03:00")), None),
      (3L, Some(ts("2024-01-01 12:00:00")),
        Some(ts("2024-01-01 12:01:00")),
        Some(ts("2024-01-01 12:02:00")))))
  }

  test("matchPattern: optional head step — pattern entry at the first " +
      "required step; a failed required step nulls everything above it") {
    import java.sql.Timestamp
    import Sessions.PatternStep
    def ts(x: String) = Timestamp.valueOf(x)
    val ev = Seq(
      // user 1: no click at all — enters at the error step
      (1L, ts("2024-01-01 10:00:00"), "error"),
      (1L, ts("2024-01-01 10:01:00"), "purchase"),
      // user 2: greedy — the click IS matched even though every error
      // precedes it, so the required error step fails and the user gets
      // NO row (no backtracking to the skip that would have matched)
      (2L, ts("2024-01-01 11:00:00"), "error"),
      (2L, ts("2024-01-01 11:01:00"), "click"),
      (2L, ts("2024-01-01 11:02:00"), "purchase"),
      // user 3: purchase only, no error → no row (first required missed)
      (3L, ts("2024-01-01 12:00:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = Sessions.matchPattern(ev, Seq(
        PatternStep("click", col("event_type") === "click", optional = true),
        PatternStep("error", col("event_type") === "error"),
        PatternStep("purchase", col("event_type") === "purchase")),
      key = "user_id", ts = "ts")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect().toSeq.sortBy(_._1)
    assert(out === Seq(
      (1L, None, Some(ts("2024-01-01 10:00:00")),
        Some(ts("2024-01-01 10:01:00")))))
  }

  test("matchPattern property: random corpora and random optional " +
      "patterns match a brute-force chained-minimum reference") {
    import java.sql.Timestamp
    import Sessions.PatternStep
    val rnd = new scala.util.Random(42)
    val types = Vector("a", "b", "c", "d")
    for (trial <- 1 to 4) {
      val events = (1 to 400).map { _ =>
        (rnd.nextInt(40).toLong,
          new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
          types(rnd.nextInt(types.size)), rnd.nextInt(100).toDouble)
      }.distinct // (key, ts) duplicates would make min-ties ambiguous? no
        // — chained-min is over values; duplicates are fine. distinct
        // only to keep the frame tidy.
      val steps = (0 until 3).map { i =>
        val t = types(rnd.nextInt(types.size))
        val thresh = rnd.nextInt(80)
        (s"s$i", t, thresh, if (i == 0) rnd.nextBoolean()
          else rnd.nextBoolean())
      }
      // brute-force reference: literal chained-min over FINAL values
      def refFor(evs: Seq[(Long, Timestamp, String, Double)])
          : Seq[(Long, Seq[Option[Timestamp]])] = {
        val byKey = evs.groupBy(_._1)
        val universe = byKey.filter { case (_, es) =>
          es.exists(e => steps.exists(s => e._3 == s._2 && e._4 > s._3))
        }.keys.toSeq
        universe.flatMap { k =>
          val es = byKey(k)
          val t = Array.fill[Option[Timestamp]](3)(None)
          for (i <- 0 until 3) {
            val (_, st, sv, _) = steps(i)
            val prior = (0 until i).reverse
            val (opts, rest) = prior.span(j => steps(j)._4)
            val chain = opts ++ rest.headOption
            val anchor = chain.flatMap(j => t(j)).headOption
            val cond: Timestamp => Boolean =
              if (chain.isEmpty) _ => true
              else if (rest.nonEmpty)
                ts => anchor.exists(a => ts.after(a))
              else ts => anchor.forall(a => ts.after(a))
            val cands = es.filter(e => e._3 == st && e._4 > sv)
              .map(_._2).filter(cond)
            if (cands.nonEmpty) t(i) = Some(cands.minBy(_.getTime))
          }
          val firstReq = steps.indexWhere(!_._4)
          val keep = if (firstReq >= 0) t(firstReq).isDefined
            else t.exists(_.isDefined)
          if (keep) Some((k, t.toSeq)) else None
        }
      }
      val df = events.toDF("user_id", "ts", "event_type", "value")
      val got = Sessions.matchPattern(df,
          steps.map { case (n, t, v, opt) =>
            PatternStep(n, col("event_type") === t && col("value") > v,
              optional = opt) },
          key = "user_id", ts = "ts")
        .collect().map(r => (r.getLong(0),
          (1 to 3).map(i => Option(r.getTimestamp(i))).toSeq))
        .sortBy(_._1).toSeq
      assert(got === refFor(events).sortBy(_._1),
        s"trial $trial steps=$steps")
    }
  }

  test("retentionMatrix property: random corpora match a brute-force " +
      "cohort/offset reference") {
    import java.sql.Timestamp
    val rnd = new scala.util.Random(7)
    val events = (1 to 500).map { _ =>
      (rnd.nextInt(30).toLong,
        Timestamp.valueOf(f"2024-01-${1 + rnd.nextInt(20)}%02d " +
          f"${rnd.nextInt(24)}%02d:00:00"))
    }
    val byKey = events.groupBy(_._1)
    val cohort = byKey.view.mapValues(
      _.map(_._2.toLocalDateTime.toLocalDate).min).toMap
    val cells = events.map { case (k, t) =>
      (cohort(k), java.time.temporal.ChronoUnit.DAYS.between(
        cohort(k), t.toLocalDateTime.toLocalDate).toInt, k)
    }.distinct.groupBy(c => (c._1, c._2)).view.mapValues(_.size.toLong)
    val sizes = cohort.values.groupBy(identity).view.mapValues(_.size.toLong)
    val expect = cells.map { case ((c, off), n) =>
      (c.toString, off, n, sizes(c),
        math.round(n.toDouble / sizes(c) * 10000) / 10000.0)
    }.toSeq.sortBy(r => (r._1, r._2))
    val got = Sessions.retentionMatrix(events.toDF("user_id", "ts"),
        "user_id", "ts", "day")
      .orderBy("cohort", "offset")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got === expect)
  }

  test("retentionMatrix: day cohorts, multi-event days count once, " +
      "offset-0 row equals the cohort size") {
    import java.sql.Timestamp
    def ts(x: String) = Timestamp.valueOf(x)
    val ev = Seq(
      // cohort 01-01: users 1,2. User 1 active d0,d1 (twice on d1);
      // user 2 active d0 and d2
      (1L, ts("2024-01-01 08:00:00")), (1L, ts("2024-01-02 09:00:00")),
      (1L, ts("2024-01-02 10:00:00")),
      (2L, ts("2024-01-01 23:59:59")), (2L, ts("2024-01-03 00:00:01")),
      // cohort 01-02: user 3, only its first day
      (3L, ts("2024-01-02 12:00:00")))
      .toDF("user_id", "ts")
    val got = Sessions.retentionMatrix(ev, "user_id", "ts", "day")
      .orderBy("cohort", "offset")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got === Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 1L, 2L, 0.5),
      ("2024-01-01", 2, 1L, 2L, 0.5),
      ("2024-01-02", 0, 1L, 1L, 1.0)))
  }
}
