package graft.operators

import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HyperLogLog sketch ([[Sketches.hllDistinct]]): the register/estimator
  * pipeline is re-implemented HERE in plain Scala over the same xxhash64
  * values (collected once) — an in-process independent mirror of the
  * DuckDB oracle's full restatement (q71 gate), pinning each piece:
  * bucket split, bin-length rank, exact register sum, both estimator
  * branches, rounding.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val p = 10
  private val m = 1 << p
  private val sw = 64 - p

  /** Reference HLL over raw hash values — independent of the DataFrame
    * formulation (plain var/loop arithmetic, java.lang.Long bit ops).
    */
  private def referenceHll(hashes: Seq[Long]): (Long, Long) = {
    val regs = new Array[Int](m)
    hashes.foreach { h =>
      val b = (h >>> sw).toInt
      val v = h & ((1L << sw) - 1)
      val rho = if (v == 0) sw + 1 else java.lang.Long.numberOfLeadingZeros(v) - p + 1
      if (rho > regs(b)) regs(b) = rho
    }
    val vEmpty = regs.count(_ == 0)
    var t = java.math.BigDecimal.ZERO
    regs.foreach { r =>
      t = t.add(new java.math.BigDecimal(
        java.math.BigInteger.ONE.shiftLeft(sw + 1 - r)))
    }
    val alphaC = Sketches.alphaM(m) * m * m * math.pow(2.0, sw + 1)
    val raw = alphaC / t.doubleValue()
    val est =
      if (raw <= 2.5 * m && vEmpty > 0) m * math.log(m.toDouble / vEmpty)
      else raw
    // math.round = floor(x+0.5) ≡ HALF_UP for the positive estimates here,
    // matching Spark's round() and DuckDB's round()
    (vEmpty.toLong, math.round(est))
  }

  private def runOp(values: Seq[Long]): (Long, Long) = {
    val df = values.toDF("v")
    val row = Sketches.hllDistinct(df, lit("g"), col("v"), p).head()
    (row.getLong(row.fieldIndex("v_empty")),
      row.getLong(row.fieldIndex("hll_est")))
  }

  private def sparkHashes(values: Seq[Long]): Seq[Long] =
    values.toDF("v").select(xxhash64(col("v"))).as[Long].collect().toSeq

  test("hllDistinct matches the plain-Scala reference register-for-register " +
      "in both estimator regimes") {
    for (n <- Seq(37, 500, 20000)) {
      val values = (1L to n)
      val expected = referenceHll(sparkHashes(values))
      assert(runOp(values) === expected, s"n=$n")
    }
  }

  test("hllDistinct constructs and estimates sanely across the full " +
      "advertised p range, including the small-m alpha constants") {
    // p in 4..6 needs the tabulated alpha_16/32/64 (the asymptotic
    // formula starts at m = 128) — round-8 ADVICE: these used to throw
    for (pp <- Seq(4, 5, 6, 7, 16)) {
      val mm = 1 << pp
      val n = 500
      val row = Sketches.hllDistinct((1L to n).toDF("v"),
        lit("g"), col("v"), pp).head()
      val est = row.getLong(row.fieldIndex("hll_est"))
      val se = 1.04 / math.sqrt(mm.toDouble)
      assert(math.abs(est - n).toDouble / n <= 6 * se,
        s"p=$pp est=$est")
    }
  }

  test("hllDistinct estimate stays within 5 standard errors of the truth") {
    val se = 1.04 / math.sqrt(m.toDouble)
    for (n <- Seq(100, 5000, 50000)) {
      val (_, est) = runOp(1L to n.toLong)
      assert(math.abs(est - n).toDouble / n <= 5 * se,
        s"n=$n est=$est (bound ${5 * se})")
    }
  }

  test("hllDistinct is insensitive to duplication — a 90%-hot value " +
      "changes nothing") {
    val distinct = 1L to 400L
    val skewed = distinct ++ Seq.fill(4000)(7L)
    assert(runOp(distinct) === runOp(skewed))
  }

  test("hllDistinct groups estimate independently") {
    val df = (1L to 3000L).map(i => (s"g${i % 3}", i)).toDF("g", "v")
    val got = Sketches.hllDistinct(df, col("g"), col("v"), p)
      .orderBy("scope").collect()
    assert(got.length === 3)
    got.foreach { r =>
      val est = r.getLong(r.fieldIndex("hll_est"))
      assert(math.abs(est - 1000) < 1000 * 5 * 1.04 / math.sqrt(m.toDouble))
    }
    // groups sharing values must not bleed registers into each other:
    // same value set per group → identical estimates
    val same = (1L to 500L).flatMap(i => Seq(("a", i), ("b", i)))
      .toDF("g", "v")
    val ests = Sketches.hllDistinct(same, col("g"), col("v"), p)
      .select("hll_est").as[Long].collect().toSet
    assert(ests.size === 1)
  }

  test("hllDistinct register aggregation partial-aggregates (map-side " +
      "combine absorbs hot values before the shuffle)") {
    val df = (1L to 1000L).toDF("v")
    // AQE wraps the tree in AdaptiveSparkPlanExec, which hides its
    // children from collect() until execution — plan with AQE off
    val aqeKey = "spark.sql.adaptive.enabled"
    val prior = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    val plan =
      try Sketches.hllDistinct(df, lit("g"), col("v"), p)
        .queryExecution.executedPlan
      finally spark.conf.set(aqeKey, prior)
    val partials = plan.collect {
      case h: HashAggregateExec if h.aggregateExpressions.exists(
        _.mode.toString == "Partial") => h
      case o: ObjectHashAggregateExec if o.aggregateExpressions.exists(
        _.mode.toString == "Partial") => o
    }
    assert(partials.nonEmpty, "expected a partial (map-side) aggregate:\n" +
      plan.toString)
  }

  // ------------------------------------------------------------- count-min

  test("cmsHeavyHitters matches a plain-Scala count-min mirror and always " +
      "overestimates") {
    val docs = Seq(
      "the cat sat on the mat the cat",
      "a dog and the cat met a dog",
      "the the the dog cat mat a on").toDF("text")
    val d = 4
    val logW = 6 // tiny table → collisions guaranteed → real overcounts
    val w = 1L << logW
    val got = Sketches.cmsHeavyHitters(docs, col("text"), d, logW, topK = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // reference: exact counts in Scala, hashes from the SAME expression
    val tokens = docs.as[String].collect()
      .flatMap(_.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
    val exact = tokens.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val hashes = exact.keys.toSeq.toDF("t")
      .select(col("t"), graft.functions.TextExprs.krHash64(col("t")))
      .as[(String, Long)].collect().toMap
    val table = Array.fill(d, w.toInt)(0L)
    exact.foreach { case (t, n) =>
      val h = hashes(t)
      val lo = h & 0xffffffffL
      val hi = (h >>> 32) | 1L
      (0 until d).foreach { i =>
        table(i)(((lo + i * hi) % w).toInt) += n
      }
    }
    def estimate(t: String): Long = {
      val h = hashes(t)
      val lo = h & 0xffffffffL
      val hi = (h >>> 32) | 1L
      (0 until d).map(i => table(i)(((lo + i * hi) % w).toInt)).min
    }
    val expectTop = exact.toSeq.sortBy { case (t, n) => (-n, t) }.take(5)
    assert(got.map(r => (r._1, r._2)).toSeq === expectTop)
    got.foreach { case (t, n, e) =>
      assert(e === estimate(t), s"estimate mismatch for '$t'")
      assert(e >= n, s"count-min must never undercount ('$t': $e < $n)")
    }
  }

  test("cmsHeavyHitters releasable twin frees its cache entry") {
    val docs = Seq("x y z", "y z z").toDF("text")
    val before = spark.sparkContext.getPersistentRDDs.size
    val (df, release) = Sketches.cmsHeavyHittersReleasable(docs, col("text"))
    df.collect()
    assert(spark.sparkContext.getPersistentRDDs.size > before)
    release()
    // unpersist(blocking=false): poll briefly
    val deadline = System.currentTimeMillis() + 5000
    while (spark.sparkContext.getPersistentRDDs.size > before &&
      System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(spark.sparkContext.getPersistentRDDs.size === before)
  }

  // ---------------------------------------------------------------- bloom

  private lazy val bloomProbe = (1L to 5000L).map(i => (i % 500, i))
    .toDF("k", "payload")
  private lazy val bloomBuild = (0L to 49L).map(i => (i * 7, s"d$i"))
    .toDF("bk", "attr")

  test("bloomPrunedJoin equals the plain join (inner and left_semi)") {
    for (jt <- Seq("inner", "left_semi")) {
      val got = Sketches.bloomPrunedJoin(bloomProbe, bloomBuild,
        "k", "bk", joinType = jt)
      val want = bloomProbe.join(bloomBuild,
        bloomProbe("k") === bloomBuild("bk"), jt)
      assert(got.columns.toSeq === want.columns.toSeq, jt)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty, jt)
    }
  }

  test("bloomPrunedJoin: null probe keys are pruned, matching join " +
      "semantics; empty build side prunes everything") {
    val probeWithNull = bloomProbe.unionByName(
      Seq((Option.empty[Long], 0L)).toDF("k", "payload"))
    val got = Sketches.bloomPrunedJoin(probeWithNull, bloomBuild, "k", "bk")
    val want = probeWithNull.join(bloomBuild,
      probeWithNull("k") === bloomBuild("bk"), "inner")
    assert(got.count() === want.count())
    assert(Sketches.bloomPrunedJoin(bloomProbe, bloomBuild.limit(0),
      "k", "bk").count() === 0)
  }

  test("bloom build AND probe paths both reject out-of-range logBits/k " +
      "(a probe past the bitmap length would silently false-negative)") {
    import org.apache.spark.sql.functions.col
    for (bad <- Seq(5, 27, 40)) {
      intercept[IllegalArgumentException] {
        Sketches.bloomBitmap(bloomBuild, col("bk"), logBits = bad)
      }
      intercept[IllegalArgumentException] {
        Sketches.bloomMightContain(col("k"), col("graft_bloom"),
          logBits = bad)
      }
    }
    intercept[IllegalArgumentException] {
      Sketches.bloomMightContain(col("k"), col("graft_bloom"), k = 0)
    }
    intercept[IllegalArgumentException] {
      Sketches.bloomBitmap(bloomBuild, col("bk"), k = 17)
    }
  }

  test("bloomPrunedJoin prunes the probe side: pass-through count is " +
      "near the true match count (FP rate small), far below the input") {
    val obs = new org.apache.spark.sql.Observation()
    val out = Sketches.bloomPrunedJoin(bloomProbe, bloomBuild, "k", "bk",
      passObs = Some(obs))
    val matches = out.count()
    val passed = obs.get("n_pass_bloom").asInstanceOf[Long]
    val input = bloomProbe.count()
    // true matches: k in {0,7,...,343} ∩ [0,500) → 50 keys × 10 rows
    assert(matches === 500L)
    assert(passed >= matches, "bloom must never drop a true match")
    assert(passed < input / 2,
      s"bloom pruned almost nothing: $passed of $input")
    // 2^16 bits, 50 keys, 5 hashes → FP rate ~(kn/m)^k ≈ 1e-12: the pass
    // set should be exactly the matches on this corpus
    assert(passed === matches, s"unexpected false positives: $passed")
  }

  test("bloomPrunedJoin: the probe filter sits BELOW the join Exchange " +
      "(pruned rows never shuffle)") {
    val aqeKey = "spark.sql.adaptive.enabled"
    val bcKey = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(aqeKey)
    val priorBc = spark.conf.get(bcKey)
    spark.conf.set(aqeKey, "false")
    spark.conf.set(bcKey, "-1") // force the shuffle join the operator targets
    try {
      val plan = Sketches.bloomPrunedJoin(bloomProbe, bloomBuild, "k", "bk")
        .queryExecution.executedPlan
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(shuffles.nonEmpty, "expected a shuffle join under bc=-1")
      // every shuffle of probe columns must contain the bloom membership
      // filter beneath it
      val probeShuffles = shuffles.filter(
        _.output.exists(_.name == "payload"))
      assert(probeShuffles.nonEmpty)
      probeShuffles.foreach { ex =>
        // the membership conjunction may survive as a FilterExec or be
        // folded into the bitmap-attach BroadcastNestedLoopJoin's
        // condition — either way it must sit BELOW this exchange
        val below = ex.child.toString
        assert(below.contains("graft_bloom") && below.contains("shiftleft"),
          s"probe-side shuffle without bloom membership test below it:\n$ex")
      }
    } finally {
      spark.conf.set(aqeKey, prior)
      spark.conf.set(bcKey, priorBc)
    }
  }
}
