package graft.textops

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contamination overlap ([[Overlap.fingerprintOverlap]]) and
  * deterministic sampling ([[Sampling.stratifiedSample]]).
  */
class OverlapSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprintOverlap finds a planted shared passage and nothing " +
      "between unrelated docs") {
    val passage = "the experiment protocol requires careful calibration " +
      "of every sensor before the measurement series begins"
    val train = Seq(
      (0L, s"introductory remarks and then $passage with some closing"),
      (2L, "entirely unrelated training document about cooking pasta " +
        "with tomatoes and fresh basil leaves in summer"))
      .toDF("doc_id", "text")
    val eval_ = Seq(
      (1L, s"$passage plus an answer key appended here"),
      (3L, "another clean evaluation item concerning medieval history " +
        "and the construction of stone bridges across rivers"))
      .toDF("doc_id", "text")
    val out = Overlap.fingerprintOverlap(train, eval_, minShared = 2)
      .select("id_a", "id_b", "n_shared")
      .as[(Long, Long, Long)].collect()
    assert(out.map(r => (r._1, r._2)).toSet === Set((0L, 1L)),
      s"expected exactly the planted pair, got ${out.toSeq}")
    // a >100-char shared passage selects MANY common fingerprints (one
    // per ~w characters), not just the minimum the guarantee promises
    assert(out.head._3 >= 5, s"n_shared=${out.head._3}")
  }

  test("fingerprintOverlap: shared-run guarantee — any w+k-1 char shared " +
      "substring yields >=1 common fingerprint") {
    // k=8, w=8: any shared run of >=15 chars guarantees >=1 shared
    // fingerprint; use minShared=1 to observe the guarantee itself
    val shared = "abcdefghijklmno" // exactly 15 chars
    val a = Seq((0L, s"prefix text $shared")).toDF("doc_id", "text")
    val b = Seq((1L, s"$shared completely different suffix material"))
      .toDF("doc_id", "text")
    val out = Overlap.fingerprintOverlap(a, b, minShared = 1).count()
    assert(out === 1L)
  }

  test("fingerprintOverlap caps ubiquitous fingerprints observably while " +
      "keeping genuine low-frequency overlap") {
    val boiler = "this standard license boilerplate header appears in " +
      "every single document of the corpus without variation"
    val planted = "a genuinely shared research passage that only these " +
      "two particular documents contain verbatim"
    def tail(side: String, i: Long) =
      s"unique $side document payload number $i with enough trailing " +
        s"characters to select its own fingerprints $i"
    val train = (0L until 40L by 2).map(i =>
      (i, s"$boiler ${if (i == 0) planted else ""} ${tail("train", i)}"))
      .toDF("doc_id", "text")
    val eval_ = (1L until 40L by 2).map(i =>
      (i, s"$boiler ${if (i == 1) planted else ""} ${tail("eval", i)}"))
      .toDF("doc_id", "text")
    val (obsA, obsB) = (Observation(), Observation())
    // cap of 8 (< the 20 docs per side sharing every boilerplate
    // fingerprint): boilerplate evidence is dropped, the planted passage
    // (posting size 1-2) survives — the cap trades exactly the matches
    // that carry no contamination signal. Broadcast joins are disabled
    // for the action: CollectMetrics inside a broadcast subtree never
    // reaches the Observation listener (the documented caveat — these
    // tiny test frames would otherwise all broadcast).
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val pairs = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = Overlap.fingerprintOverlap(train, eval_, minShared = 1,
        maxPostingList = 8, dropStatsA = Some(obsA), dropStatsB = Some(obsB))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      out
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    assert(pairs.contains((0L, 1L)), s"planted pair lost: $pairs")
    assert(!pairs.contains((2L, 3L)),
      "boilerplate-only pair should not survive the cap")
    assert(obsA.get("dropped_groups").asInstanceOf[Long] >= 1L)
    assert(obsB.get("dropped_groups").asInstanceOf[Long] >= 1L)
  }

  test("stratifiedSample: rate 1 keeps everything, rate 0 nothing, and " +
      "the kept set is deterministic and monotone in the rate") {
    val docs = (0L until 2000L).map(i =>
      (i, if (i % 2 == 0) "en" else "de")).toDF("doc_id", "lang")
    assert(Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 1.0, "de" -> 1.0)).count() === 2000L)
    assert(Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.0), defaultRate = 0.0).count() === 0L)
    def keep(rEn: Double): Set[Long] = Sampling.stratifiedSample(
        docs, "lang", "doc_id", Map("en" -> rEn), defaultRate = 0.3)
      .select("doc_id").as[Long].collect().toSet
    val half = keep(0.5)
    assert(keep(0.5) === half, "same rate => identical set (no RNG)")
    assert(half.subsetOf(keep(0.7)),
      "raising a rate must grow the kept set monotonically")
    // achieved rate is close to nominal (hash uniformity, 1000 en docs)
    val en = half.count(_ % 2 == 0)
    assert(en > 400 && en < 600, s"en kept $en of 1000 at rate 0.5")
    // absent stratum falls back to defaultRate
    val de = half.count(_ % 2 == 1)
    assert(de > 220 && de < 380, s"de kept $de of 1000 at default 0.3")
  }

  test("rebalanceToUniform: smallest stratum kept whole, big strata " +
      "downsampled near its size, set deterministic, big side unshuffled") {
    // 1500 web / 400 books / 100 wiki — wiki is the floor
    val docs = (0L until 2000L).map { i =>
      val s = if (i < 1500) "web" else if (i < 1900) "books" else "wiki"
      (i, s)
    }.toDF("doc_id", "source")
    val kept = Sampling.rebalanceToUniform(docs, "source", "doc_id")
      .select("doc_id", "source").as[(Long, String)].collect()
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("wiki") === 100, "the smallest stratum is kept in full")
    // achieved counts are hash-binomial around 100 (rate min/n_s)
    assert(bySrc("web") > 60 && bySrc("web") < 140, s"web=${bySrc("web")}")
    assert(bySrc("books") > 60 && bySrc("books") < 140,
      s"books=${bySrc("books")}")
    val again = Sampling.rebalanceToUniform(docs, "source", "doc_id")
      .select("doc_id", "source").as[(Long, String)].collect()
    assert(kept.toSet === again.toSet, "no RNG: identical kept set")
    // keep rule cross-check against an independent per-row formulation
    val expected = docs
      .withColumn("b", pmod(xxhash64(col("doc_id")), lit(10000L)))
      .as[(Long, String, Long)].collect()
      .filter { case (_, s, b) =>
        val n = Map("web" -> 1500L, "books" -> 400L, "wiki" -> 100L)(s)
        b * n < 100L * 10000L
      }.map(t => (t._1, t._2)).toSet
    assert(kept.toSet === expected)
    // scale shape: the corpus side reaches the filter without an Exchange
    // (both joins broadcast); only the tiny counts agg shuffles
    val plan = Sampling.rebalanceToUniform(docs, "source", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("weightedSample: kept set deterministic, monotone in the target " +
      "AND in the row's own weight, proportional to weight, zero-weight " +
      "rows never kept, corpus side unshuffled") {
    // weights 1 vs 9, 1000 rows each → p(heavy) = 9·p(light)
    val docs = (0L until 2000L).map(i =>
      (i, if (i % 2 == 0) 1L else 9L)).toDF("doc_id", "w")
    def keep(tPM: Int): Set[Long] = Sampling.weightedSample(
        docs, col("w"), "doc_id", tPM)
      .select("doc_id").as[Long].collect().toSet
    val k300 = keep(300)
    assert(keep(300) === k300, "same target => identical set (no RNG)")
    assert(k300.subsetOf(keep(500)),
      "raising the target must grow the kept set monotonically")
    // w̄=5: p(light)=0.3/5=0.06, p(heavy)=0.3·9/5=0.54 over 1000 each
    val light = k300.count(_ % 2 == 0)
    val heavy = k300.count(_ % 2 == 1)
    assert(light > 30 && light < 95, s"light kept $light of 1000")
    assert(heavy > 470 && heavy < 610, s"heavy kept $heavy of 1000")
    // raising your own weight never drops you: light rows go w=1→3
    // (Σw grows 10000→12000, but each light row's threshold still
    // rises 600→1500 buckets), so every light keep must survive
    val docs3 = (0L until 2000L).map(i =>
      (i, if (i % 2 == 0) 3L else 9L)).toDF("doc_id", "w")
    val k3 = Sampling.weightedSample(docs3, col("w"), "doc_id", 300)
      .select("doc_id").as[Long].collect().toSet
    assert(k300.filter(_ % 2 == 0).subsetOf(k3),
      "a light row kept at w=1 was dropped after its weight rose to 3")
    // exact kept-set cross-check against the independent per-row rule
    val expected = docs
      .withColumn("b", pmod(xxhash64(col("doc_id")), lit(10000L)))
      .as[(Long, Long, Long)].collect()
      .filter { case (_, w, b) =>
        BigInt(b) * 1000 * 10000 < BigInt(w) * 300 * 2000 * 10000
      }.map(_._1).toSet
    assert(k300 === expected)
    // zero weight => never kept, even at target 1000
    val withZero = (0L until 100L).map(i =>
      (i, if (i < 50) 0L else 7L)).toDF("doc_id", "w")
    val keptZ = Sampling.weightedSample(withZero, col("w"), "doc_id", 1000)
      .select("doc_id").as[Long].collect()
    assert(keptZ.forall(_ >= 50L))
    // scale shape: corpus reaches the filter without an Exchange — only
    // the one-row stats agg shuffles, then broadcasts back
    val plan = Sampling.weightedSample(docs, col("w"), "doc_id", 300)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
  }

  test("deterministicShuffle: reproducible, seed-sensitive, batches " +
      "balanced, assignment plan shuffle-free") {
    val docs = (0L until 4096L).toDF("doc_id")
    def keys(seed: Long) =
      Sampling.deterministicShuffle(docs, "doc_id", seed, logBatches = 3)
        .select("doc_id", "shuffle_key", "batch")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
    val a = keys(1L)
    assert(a.toSeq === keys(1L).toSeq, "same seed → same permutation")
    val b = keys(2L)
    assert(a.map(_._2).toSeq !== b.map(_._2).toSeq,
      "a different seed must be a different permutation")
    // batch = top 3 bits of the key — consistent within every row
    a.foreach { case (_, k, bat) => assert(bat === (k >>> 61)) }
    // 8 batches over 4096 rows: all within 3σ-ish of 512
    val sizes = a.groupBy(_._3).view.mapValues(_.length)
    assert(sizes.size === 8)
    sizes.foreach { case (bat, n) =>
      assert(n > 512 - 150 && n < 512 + 150, s"batch $bat size $n") }
    // assignment itself is a pure projection — no Exchange
    val plan = Sampling.deterministicShuffle(docs, "doc_id", 1L, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("deterministicShuffle: logBatches=0 puts every row in batch 0 " +
      "(a 64-bit JVM shift would wrap to a no-op)") {
    val docs = (0L until 64L).toDF("doc_id")
    val batches = Sampling.deterministicShuffle(docs, "doc_id", 0L, 0)
      .select("batch").as[Long].collect().toSet
    assert(batches === Set(0L))
  }

  test("exactNgramContamination: planted exact n-gram found with correct " +
      "counts, clean docs absent, train side joins via broadcast") {
    val shared = "alpha beta gamma delta epsilon" // 5 words -> one 5-gram
    val train = Seq(
      (0L, s"intro words $shared closing words here"),
      (2L, "completely unrelated content with no overlap at all"),
      (4L, shared)) // exactly the gram, nothing else
      .toDF("doc_id", "text")
    val bench = Seq(
      (1L, s"prefix $shared suffix tokens"),
      (3L, "other benchmark material")).toDF("doc_id", "text")
    val got = Overlap.exactNgramContamination(train, bench, n = 5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // doc 0: 10 words -> 6 distinct 5-grams, exactly 1 matches; doc 4:
    // its single gram matches; doc 2 clean -> absent
    assert(got.toSeq === Seq((0L, 1L, 6), (4L, 1L, 1)))

    val plan = Overlap.exactNgramContamination(train, bench, n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark gram set must broadcast:\n$plan")
  }

  test("exactNgramContamination: shorter-than-n docs use the whole text " +
      "as one gram (the shingles contract)") {
    val train = Seq((0L, "tiny doc")).toDF("doc_id", "text")
    val bench = Seq((1L, "tiny doc")).toDF("doc_id", "text")
    val got = Overlap.exactNgramContamination(train, bench, n = 13)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq === Seq((0L, 1L, 1)))
  }

  test("tokenBudgetMixture: two-level prefix equals the naive global " +
      "rule, is monotone in the budget, and never windows a whole " +
      "stratum") {
    val docs = (0L until 200L).map { id =>
      val lang = if (id % 3 == 0) "en" else if (id % 3 == 1) "de" else "xx"
      (id, lang, Seq.fill(1 + (id % 7).toInt)("w").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val budgets = Map("en" -> 90L, "de" -> 40L) // xx absent -> dropped
    // small logBuckets so buckets genuinely hold multiple docs (the
    // boundary-bucket doc-level path is exercised, not just full buckets)
    val out = Sampling.tokenBudgetMixture(docs, "lang", budgets,
      logBuckets = 3)
    val got = out.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("n_tokens"))).toSet

    // naive reference: per stratum, unsigned-xxhash64 order, running sum
    val hashed = docs.select(col("doc_id"), col("lang"),
        TextStats.tokenCount(col("text")).cast("long").as("n"),
        xxhash64(col("doc_id")).as("h")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val want = hashed.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      val budget = budgets.getOrElse(lang, 0L)
      var cum = 0L
      rows.sortBy { case (id, _, _, h) => (h ^ Long.MinValue, id) }
        .flatMap { case (id, l, n, _) =>
          cum += n
          if (cum <= budget) Some((id, l, n)) else None
        }
    }.toSet
    assert(got === want)
    assert(want.nonEmpty && want.size < 200, s"degenerate fixture: $want")
    assert(!got.exists(_._2 == "xx"), "unbudgeted stratum must be dropped")

    // monotone: a raised budget keeps a superset
    val more = Sampling.tokenBudgetMixture(docs, "lang",
        budgets.map { case (k, v) => k -> (v + 25L) }, logBuckets = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("n_tokens"))).toSet
    assert(got.subsetOf(more), "raised budget must keep a superset")

    // skew posture: the DOC-level window (the one ordered by the hash)
    // must partition by (stratum, bucket) — a stratum-only window there
    // would funnel a whole language through one task. The stratum-only
    // window over the AGGREGATED per-bucket frame is fine (config-sized).
    // Plan-string match: AQE wraps stages in leaf QueryStageExec nodes,
    // so TreeNode.collect can't reach the WindowExec — toString can.
    val winLines = out.queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("windowspecdefinition"))
    val docWins = winLines.filter(_.matches(""".*h#\d+L ASC.*"""))
    assert(docWins.nonEmpty,
      s"expected the hash-ordered doc window in:\n${winLines.mkString("\n")}")
    docWins.foreach(l => assert(l.contains("bkt#"),
      s"doc-level window must include the hash bucket, got: $l"))
  }
}
