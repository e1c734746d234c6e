package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Every decision is a
  * pure function of the row's id — no RNG, no seed plumbing, no
  * partition-order dependence — so samples are reproducible across runs,
  * cluster sizes AND engines (Spark's `xxhash64` over a BIGINT is
  * restated in the DuckDB oracle bit-for-bit, q52), and a rerun with a
  * raised rate yields a SUPERSET of the previous sample (the kept set is
  * `hash mod granularity < rate·granularity` — monotone in the rate),
  * which is what incremental corpus scaling needs.
  */
object Sampling {

  /** `xxhash64(id) mod granularity` — the per-row sampling bucket. */
  def bucketOf(idCol: Column, granularity: Int): Column =
    pmod(xxhash64(idCol), lit(granularity.toLong))

  /** Stratified deterministic sample: keep a row iff its bucket falls
    * below `rate(stratum)·granularity` (rounded to an integer threshold —
    * achieved rates are exact multiples of 1/granularity). Strata absent
    * from `rates` fall back to `defaultRate`. A pure projection+filter:
    * no shuffle, no state, scale-free.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      granularity: Int = 10000): DataFrame = {
    require(granularity >= 1, s"granularity must be >= 1, got $granularity")
    val all = rates.values.toSeq :+ defaultRate
    require(all.forall(r => r >= 0.0 && r <= 1.0),
      s"rates must be in [0,1], got $all")
    val thresh = rates.foldLeft(
      lit(math.round(defaultRate * granularity))) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum,
          lit(math.round(rate * granularity))).otherwise(acc)
    }
    df.filter(bucketOf(col(idCol), granularity) < thresh)
  }

  /** Corpus mixture rebalancing — the data-mixing step of a training
    * pipeline: deterministically downsample every stratum (source, lang,
    * domain …) to the size of the smallest one, yielding an approximately
    * uniform mixture. The keep rule for a row in stratum s of size n_s is
    * the exact integer comparison `bucket(id)·n_s < min_count·granularity`
    * (⇔ bucket < rate·granularity in exact rational arithmetic — no float
    * threshold, no rounding seam), so the kept SET is reproducible across
    * runs, cluster sizes and engines, monotone under corpus growth of
    * OTHER strata only through the rate, and the smallest stratum is kept
    * in full (rate = 1 ⇒ every bucket passes).
    *
    * Scale shape: one partial-agg pass for per-stratum counts (the count
    * shuffle carries ≤ |strata| rows per map task), counts and their
    * scalar min broadcast back onto the corpus, and the keep decision is
    * a pure filter — the big side never shuffles or sorts. Null strata
    * are dropped (inner-join semantics, matching the oracle's USING
    * join).
    */
  def rebalanceToUniform(df: DataFrame, stratumCol: String, idCol: String,
      granularity: Int = 10000): DataFrame = {
    require(granularity >= 1, s"granularity must be >= 1, got $granularity")
    val counts = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("graft_n"))
    val minC = counts.agg(min(col("graft_n")).as("graft_min"))
    df.join(broadcast(counts), stratumCol)
      .crossJoin(broadcast(minC))
      .filter(bucketOf(col(idCol), granularity) * col("graft_n") <
        col("graft_min") * lit(granularity.toLong))
      .drop("graft_n", "graft_min")
  }

  /** Weighted (probability-proportional-to-size) deterministic sample —
    * the importance-downsampling step of LLM data curation: keep each row
    * with probability proportional to its weight (quality score, token
    * count …), targeting `targetPerMille`/1000 of the corpus overall.
    * Row i with integer weight w_i keeps iff
    *
    *   bucket(id) · 1000 · Σw  <  w_i · targetPerMille · N · granularity
    *
    * ⇔ bucket/granularity < (targetPerMille/1000) · w_i/w̄ in exact
    * rational arithmetic — the [[rebalanceToUniform]] integer-threshold
    * construction with per-ROW rates. Rows whose scaled weight clips the
    * probability at 1 are kept in full (the expected sample then lands
    * slightly under the target — the standard PPS clipping behavior).
    *
    * Exactness contract: the comparison runs in DECIMAL(38,0) (Spark) /
    * HUGEINT (the oracle) — MULTIPLICATION only, no division, no pow —
    * so the kept SET is bit-reproducible across runs, cluster sizes and
    * engines. This is why the operator is Poisson/Bernoulli PPS rather
    * than the exact-k Efraimidis–Spirakis scheme (key u^{1/w}): the ES
    * key needs pow/ln, whose last-ulp behavior differs across libms — no
    * hash gate could pin it. Weight preference, determinism and
    * monotonicity (raising `targetPerMille` yields a SUPERSET; raising
    * only your own weight never drops you) all survive the restatement.
    *
    * Scale shape: one partial-agg pass for (Σw, N) broadcast back as a
    * one-row scalar, then a pure filter — the corpus never shuffles.
    * Weights must be non-negative integers (w = 0 ⇒ never kept); rates
    * are exact multiples of 1/granularity per unit weight.
    */
  def weightedSample(df: DataFrame, weightCol: Column, idCol: String,
      targetPerMille: Int, granularity: Int = 10000): DataFrame = {
    require(targetPerMille >= 0 && targetPerMille <= 1000,
      s"targetPerMille out of [0,1000]: $targetPerMille")
    require(granularity >= 1, s"granularity must be >= 1, got $granularity")
    val dec = "decimal(38,0)"
    val stats = df.agg(
      sum(weightCol.cast("long")).as("graft_sw"),
      count(lit(1)).as("graft_n"))
    df.crossJoin(broadcast(stats))
      .filter(
        bucketOf(col(idCol), granularity).cast(dec) * lit(1000L).cast(dec) *
          col("graft_sw").cast(dec) <
        weightCol.cast("long").cast(dec) *
          lit(targetPerMille.toLong).cast(dec) *
          col("graft_n").cast(dec) * lit(granularity.toLong).cast(dec))
      .drop("graft_sw", "graft_n")
  }

  /** Deterministic corpus shuffle + batch assignment — the global order
    * randomization a training run needs (an epoch must not replay the
    * corpus in source/crawl order, and re-runs must see the SAME order).
    * Each row gets `shuffle_key = xxhash64(id XOR seed)` (a new seed is a
    * new permutation; a pure projection) and `batch = top `logBatches`
    * bits of the key` — 2^logBatches equal-in-expectation batches WITHOUT
    * a global rank: computing "row number in shuffled order" would need
    * either a single-partition window or a two-pass range partitioner,
    * and every downstream consumer (batch writers, curriculum samplers)
    * only needs a stable batch id + a within-batch sort key, which the
    * hash already is.
    *
    * Scale shape: zero shuffles to ASSIGN (projection only); producing
    * physically shuffled output is `ORDER BY (shuffle_key, id)` — Spark's
    * range-partitioned sort, the TeraSort shape, which is exactly what a
    * fleet writer does per output partition. Ties between distinct ids
    * hashing to the same key break deterministically on the id.
    *
    * The whole assignment is restated in the DuckDB oracle (the q52
    * xxhash64 restatement over `xor(id, seed)`), so the gate proves the
    * permutation bit-for-bit, not statistically.
    */
  /** Token-budget mixture: per stratum (language, source, …), keep the
    * maximal prefix of documents — in deterministic UNSIGNED
    * `xxhash64(id)` order, `id` tiebreak — whose running token total
    * stays ≤ the stratum's budget. This is how mixture configs are
    * actually applied in pre-training pipelines: weights arrive as
    * per-source token counts, and the selection must be reproducible
    * run-over-run and monotone in the budget (a raised budget keeps a
    * SUPERSET — the kept set is a prefix of a fixed global order).
    * Strata absent from `budgets` are dropped (budget 0).
    *
    * Scale shape — the naive formulation (one running-sum window
    * partitioned by stratum) funnels each stratum's ENTIRE corpus
    * through one task; with a handful of languages at fleet scale that
    * is the canonical skew death. This runs the two-level prefix
    * instead: docs land in 2^`logBuckets` hash buckets per stratum
    * (bucket = top hash bits, so bucket order ≡ unsigned hash order);
    * one map-side-combined aggregate produces per-bucket token totals,
    * the strata×buckets frame (driver-small by construction) gets
    * per-stratum EXCLUSIVE running totals via a window over aggregated
    * rows only, broadcast back, and the doc-level running sum runs
    * inside each (stratum, bucket) — partitions bounded at n/2^logBuckets
    * regardless of stratum skew. A doc is kept iff
    * `cum_before(bucket) + cum_within ≤ budget` — exactly the global
    * prefix rule, proven against the one-window oracle restatement.
    *
    * Degenerate edge, part of the contract: a budget-0 (or absent)
    * stratum keeps NOTHING — including its zero-token documents, which
    * a bare `running_total ≤ 0` window rule would admit. (The q109
    * oracle's window restatement is equivalent on any corpus whose
    * documents tokenize non-empty, which TESTDATA.md's do; the property
    * spec pins the operator's drop-entirely semantics directly.)
    *
    * Returns (idCol, stratumCol, n_tokens) for every kept document.
    */
  def tokenBudgetMixture(df: DataFrame, stratumCol: String,
      budgets: Map[String, Long], idCol: String = "doc_id",
      textCol: String = "text", logBuckets: Int = 12): DataFrame = {
    require(logBuckets >= 1 && logBuckets <= 30,
      s"logBuckets out of range: $logBuckets")
    require(budgets.values.forall(_ >= 0), "budgets must be >= 0")
    import org.apache.spark.sql.expressions.Window
    // budget-0 strata are dropped HERE, not at the end: the filter pushes
    // to the scan, and it bounds the broadcast frame below at
    // |budgets| × 2^logBuckets — config-sized by construction (budgets is
    // already a driver-side Map), independent of the data's stratum
    // cardinality
    val base = df.select(col(idCol), col(stratumCol),
        TextStats.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .filter(col(stratumCol).isin(
        budgets.filter(_._2 > 0).keys.toSeq: _*))
      .withColumn("h", xxhash64(col(idCol)))
      .withColumn("bkt", shiftrightunsigned(col("h"), 64 - logBuckets))
    // within a bucket all rows share the hash's top logBuckets bits —
    // including the sign bit — so SIGNED h order within the bucket equals
    // unsigned order, and (bkt, h, id) is the global unsigned-hash order
    val perBucket = base.groupBy(col(stratumCol), col("bkt"))
      .agg(sum("n_tokens").as("bucket_tokens"))
    val wB = Window.partitionBy(col(stratumCol)).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumB = perBucket
      .withColumn("cum_before",
        sum("bucket_tokens").over(wB) - col("bucket_tokens"))
      .select(col(stratumCol), col("bkt"), col("cum_before"))
    val wD = Window.partitionBy(col(stratumCol), col("bkt"))
      .orderBy(col("h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budgetCol = budgets.foldLeft(lit(0L)) { case (acc, (s, bud)) =>
      when(col(stratumCol) === s, lit(bud)).otherwise(acc) }
    base.join(broadcast(cumB), Seq(stratumCol, "bkt"))
      .withColumn("cum", col("cum_before") + sum("n_tokens").over(wD))
      .filter(col("cum") <= budgetCol)
      .select(col(idCol), col(stratumCol), col("n_tokens"))
  }

  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long = 0L,
      logBatches: Int = 8): DataFrame = {
    require(logBatches >= 0 && logBatches <= 30,
      s"logBatches out of range: $logBatches")
    val key = xxhash64(col(idCol).bitwiseXOR(lit(seed)))
    // logBatches=0: a JVM shift of 64 is a no-op (shift amounts wrap mod
    // 64), so the single-batch case must be literal zero
    val batch =
      if (logBatches == 0) lit(0L)
      else shiftrightunsigned(col("shuffle_key"), 64 - logBatches)
    df.withColumn("shuffle_key", key).withColumn("batch", batch)
  }
}
