package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed sketch operators — the approximate-answer toolkit a 100 TB
  * engine serves interactive profiling from (Flajolet et al. 2007
  * "HyperLogLog: the analysis of a near-optimal cardinality estimation
  * algorithm").
  *
  * Spark ships `approx_count_distinct` (HyperLogLog++) natively, and that
  * is the right call inside an ad-hoc session. This implementation exists
  * for the property the builtin cannot give: ENGINE-PORTABLE DETERMINISM.
  * Every step — the xxhash64 hash, the register assignment, the estimator
  * arithmetic — is restatable in ANSI-ish SQL (the driver's DuckDB oracle
  * recomputes the whole sketch bit-for-bit, [[graft.OracleGen.q71Sql]]),
  * so the estimate is hash-gateable and reproducible across engines and
  * versions — the same reason the MinHash/SimHash family uses Karp–Rabin
  * hashes instead of Murmur3 ([[graft.textops.Dedup]]).
  *
  * Scale posture: registers are ONE groupBy (group, bucket) with a
  * map-side-combining `max` — 2^p rows per group reach the reducers, the
  * value column itself never shuffles. A hot value (one user at 10 % of
  * events) partial-aggregates to one row per map partition, same skew
  * armor as [[graft.textops.Dedup.exact]]. The estimator is a second tiny
  * aggregation over ≤ 2^p rows per group.
  */
object Sketches {

  /** HyperLogLog distinct-count estimate of `valueCol` per `groupExpr`.
    *
    * Geometry: the top `p` bits of `xxhash64(value)` pick one of m = 2^p
    * registers; the register keeps the maximum rank rho = (leading zeros
    * of the remaining 64−p bits) + 1. rho is computed EXACTLY in integer/
    * string arithmetic — `64−p+1 − length(bin(v))` (`bin` prints a long
    * without leading zeros, so its length is floor(log2 v)+1) — because a
    * float log2 can misround at power-of-two boundaries.
    *
    * FP determinism (the gate-critical design): the harmonic sum
    * Σ 2^−M_j is order-dependent in doubles, so it is computed as the
    * EXACT integer Σ 2^(64−p+1−M_j) in DECIMAL(38,0) (empty registers
    * contribute 2^(64−p+1)); only the final one-shot division
    * alphaM·m²·2^(64−p+1) / T happens in doubles — identical operands and
    * one correctly-rounded IEEE op on each engine, so both produce the
    * same double. The small-range (linear-counting) branch m·ln(m/V) uses
    * each engine's libm `ln` — its last-ulp seam is absorbed by rounding
    * the estimate to a whole count (a distinct COUNT is integral anyway).
    * The standard large-range correction is omitted: it matters only past
    * ~2^57 distinct values with a 64-bit hash.
    *
    * Returns one row per group: (scope, v_empty, hll_est) — `v_empty`
    * (registers never touched) is published because it is the linear-
    * counting input and the cheapest register-state checksum.
    *
    * Standard error ≈ 1.04/√m: p=10 → ~3.3 %.
    */
  def hllDistinct(df: DataFrame, groupExpr: Column, valueCol: Column,
      p: Int = 10): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val sw = 64 - p // suffix width: bits available for the rank
    val h = xxhash64(valueCol)
    val bucket = shiftrightunsigned(h, sw)
    val v = h.bitwiseAND(lit((1L << sw) - 1))
    val rho = when(v === 0, lit(sw + 1))
      .otherwise(lit(sw + 1) - length(bin(v)))
    val emptyContrib = 1L << (sw + 1) // 2^(sw+1), ≤ 2^61 for p ≥ 4
    val alphaC = alphaM(m) * m * m * math.pow(2.0, sw + 1)
    val regs = df
      .select(groupExpr.as("scope"), bucket.as("graft_b"), rho.as("graft_rho"))
      .groupBy("scope", "graft_b")
      .agg(max("graft_rho").as("graft_m"))
    regs.groupBy("scope")
      .agg(
        // Scala shiftleft() pins numBits to Int; the SQL builtin takes a
        // column exponent (still codegen'd ShiftLeft)
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${sw + 1} - graft_m)")
          .cast("decimal(38,0)")).as("graft_tp"),
        count(lit(1)).as("graft_np"))
      .select(col("scope"), {
        val vEmpty = lit(m) - col("graft_np")
        vEmpty.cast("long").as("v_empty")
      }, {
        val t = col("graft_tp") +
          (lit(m) - col("graft_np")).cast("decimal(38,0)") *
            lit(emptyContrib).cast("decimal(38,0)")
        val raw = lit(alphaC) / t.cast("double")
        val vEmpty = lit(m) - col("graft_np")
        val lc = lit(m.toDouble) * log(lit(m.toDouble) / vEmpty.cast("double"))
        val est = when(raw <= lit(2.5 * m) && vEmpty > 0, lc).otherwise(raw)
        round(est).cast("long").as("hll_est")
      })
  }

  /** alpha_m bias constant (Flajolet et al. 2007): tabulated for the
    * small register counts (m = 16/32/64), the asymptotic formula for
    * m ≥ 128 — covers the full advertised p ∈ [4,16] range.
    */
  private[graft] def alphaM(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ =>
      require(m >= 128, s"alphaM needs m in {16,32,64} or >= 128, got $m")
      0.7213 / (1.0 + 1.079 / m)
  }

  // -------------------------------------------------------------- count-min

  /** Count-min-sketch heavy hitters (Cormode & Muthukrishnan 2005): token
    * frequencies estimated from a fixed d×2^logW counter table — the
    * streaming/profiling answer when per-token exact state (a full
    * vocabulary aggregation) is too large. Estimates only OVERCOUNT
    * (cms_est ≥ true count, the sketch's one-sided error), by ≤ εN with
    * ε = e/w at the usual guarantees.
    *
    * Output: the exact top-`topK` tokens (count desc, token asc — fully
    * deterministic) with BOTH the exact count and the sketch estimate, so
    * the one-sided error is visible in the gated result. Like
    * [[hllDistinct]], every step is engine-portable: the token hash is
    * the splitmix64-finalized Karp–Rabin ([[graft.functions.TextExprs
    * .KrHash64]] — the q30 SimHash hash), the d cells come from
    * Kirsch–Mitzenmacher double hashing of its halves, and the whole
    * sketch + estimator is restated in the DuckDB oracle
    * ([[graft.OracleGen.q74Sql]]) — integer arithmetic end to end, no FP
    * seam at all.
    *
    * Scale shape: one token-count aggregation (map-side combine absorbs
    * Zipf head tokens), then the sketch is a second aggregation over the
    * VOCABULARY (not the token stream — summing per-token counts into
    * cells yields the identical table to streaming every occurrence, at
    * vocabulary volume), ≤ d·2^logW cells total; estimate probes join the
    * top-k tokens against the (broadcast-sized) cell table. The
    * token-count frame is persisted (two consumers); this plain variant
    * registers the release handle with [[graft.CacheHandles]] (freed at
    * the harness's next releaseAll) — pipeline callers managing their
    * own lifecycle use [[cmsHeavyHittersReleasable]].
    */
  def cmsHeavyHitters(docs: DataFrame, textCol: Column, d: Int = 4,
      logW: Int = 12, topK: Int = 30): DataFrame =
    { val (r, release) = cmsHeavyHittersReleasable(docs, textCol, d,
        logW, topK)
      graft.CacheHandles.register(release); r }

  /** [[cmsHeavyHitters]] plus the release handle for the persisted
    * token-count frame. */
  def cmsHeavyHittersReleasable(docs: DataFrame, textCol: Column,
      d: Int = 4, logW: Int = 12, topK: Int = 30)
      : (DataFrame, () => Unit) = {
    require(d >= 1 && d <= 8, s"d out of range: $d")
    require(logW >= 4 && logW <= 24, s"logW out of range: $logW")
    val w = 1L << logW
    val tokenCounts = docs
      .select(explode(graft.textops.TextStats.words(textCol)).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kr = graft.functions.TextExprs.krHash64(col("token"))
    val lo = kr.bitwiseAND(lit(0xffffffffL))
    val hi = shiftrightunsigned(kr, 32).bitwiseOR(lit(1L))
    def cellCols = array((0 until d).map(i =>
      struct(lit(i).as("i"), pmod(lo + lit(i.toLong) * hi, lit(w))
        .as("cell"))): _*)
    val sketch = tokenCounts
      .select(col("n"), explode(cellCols).as("ic"))
      .groupBy(col("ic.i").as("i"), col("ic.cell").as("cell"))
      .agg(sum("n").as("c"))
    val top = tokenCounts.orderBy(col("n").desc, col("token")).limit(topK)
    val result = top
      .select(col("token"), col("n"), explode(cellCols).as("ic"))
      .select(col("token"), col("n"), col("ic.i").as("i"),
        col("ic.cell").as("cell"))
      .join(sketch, Seq("i", "cell"))
      .groupBy("token", "n").agg(min(col("c")).as("cms_est"))
      .select(col("token"), col("n").as("n_exact"), col("cms_est"))
      .orderBy(col("n_exact").desc, col("token"))
    (result, () => { tokenCounts.unpersist(blocking = false); () })
  }

  // ------------------------------------------------------------------ bloom

  /** Equi-join with a Bloom-filter pre-filter on the probe side — the
    * 100 TB join shape when the build side is selective but too large to
    * broadcast as a hash table: an m-bit bitmap of the build keys (8 KiB
    * at logBits=16 — constant size regardless of build row count) is
    * built distributed, broadcast, and applied to the probe rows BEFORE
    * the join's Exchange, so probe rows that cannot match never shuffle.
    * Bloom filters have no false negatives, so the result EQUALS the
    * plain join for every input (the q72 oracle is the plain SQL join);
    * false positives only cost wasted shuffle rows, bounded by
    * (1−e^(−kn/m))^k.
    *
    * Spark can inject runtime bloom filters itself
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) when a
    * creation-side filter is selective; this operator is the explicit,
    * composable form — the pipeline decides where the bloom pays, and the
    * k probe positions come from ONE xxhash64 evaluation
    * (Kirsch–Mitzenmacher double hashing: pos_i = h_lo + i·(h_hi|1)
    * mod m), engine-portable like every hash in this library.
    *
    * The bitmap is built as a one-row DataFrame (explode positions →
    * bit_or per 64-bit word → densify) and attached via
    * crossJoin(broadcast(...)) — no driver-side collect; the bitmap
    * travels the same torrent broadcast path as any dimension table.
    *
    * `joinType` must be inner or left_semi: an outer join must keep
    * probe rows the bloom would prune. NULL probe keys are NOT pruned
    * here — Spark's xxhash64 maps NULL to the (non-null) seed hash, so a
    * null key probes real positions and may pass the membership test;
    * the equi-join itself then drops it (null never equals), preserving
    * inner/left_semi semantics either way.
    *
    * `passObs` (optional) observes `n_pass_bloom` — the probe rows that
    * survived pruning — so callers can measure the realized
    * false-positive rate against the join's output count.
    */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, logBits: Int = 16, k: Int = 5,
      joinType: String = "inner",
      passObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(joinType == "inner" || joinType == "left_semi",
      s"bloom pruning preserves only inner/left_semi semantics, got $joinType")
    val bitmap = bloomBitmap(build, col(buildKey), logBits, k)
    val pruned0 = probe.crossJoin(broadcast(bitmap))
      .filter(bloomMightContain(col(probeKey), col("graft_bloom"),
        logBits, k))
      .drop("graft_bloom")
    val prunedProbe = passObs match {
      case Some(o) => pruned0.observe(o, count(lit(1)).as("n_pass_bloom"))
      case None    => pruned0
    }
    prunedProbe.join(build, prunedProbe(probeKey) === build(buildKey),
      joinType)
  }

  /** The distributed Bloom BITMAP build [[bloomPrunedJoin]] uses,
    * exposed for callers that apply the membership test somewhere a
    * pre-join filter cannot reach — e.g. inside an array `filter` HOF
    * before an explode materializes candidate rows at all
    * ([[graft.textops.Overlap.exactNgramContamination]]'s gram
    * pre-screen). One row, one column `graft_bloom`: the m-bit bitmap
    * densified as array<bigint> (m/64 words), built by a distributed
    * bit_or per word — no driver collect; attach with
    * `crossJoin(broadcast(...))`.
    */
  def bloomBitmap(build: DataFrame, buildKey: Column, logBits: Int = 16,
      k: Int = 5): DataFrame = {
    val m = 1L << logBits
    val nWords = (m / 64).toInt
    val bits = build
      .select(explode(array(bloomPositions(buildKey, logBits, k): _*))
        .as("pos"))
      .groupBy(expr("pos DIV 64").as("w"))
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"))
        .as("bits"))
    bits
      .agg(map_from_arrays(collect_list("w"), collect_list("bits")).as("wm"))
      .select(transform(sequence(lit(0L), lit(nWords.toLong - 1)),
        i => coalesce(element_at(col("wm"), i), lit(0L))).as("graft_bloom"))
  }

  /** Membership test against a [[bloomBitmap]] column — a PURE Column
    * expression (no named intermediate columns, no `expr` string
    * references), so it composes anywhere a Column does: plain filters,
    * join conditions, and higher-order-function lambdas over array
    * elements. False positives possible, false negatives never — the
    * [[bloomPrunedJoin]] contract — PROVIDED the probe's (logBits, k)
    * EQUAL the bitmap's build values: the positions are derived from
    * them, so a mismatched probe reads the wrong bits and silently
    * yields false negatives. Both paths validate the range (a probe
    * logBits past the bitmap's word count would index off its end);
    * the equality is the caller's contract, checked by construction in
    * [[bloomPrunedJoin]] which passes one pair to both.
    * The variable-amount bit shifts go
    * through the Catalyst nodes directly (the Scala wrappers pin shift
    * amounts to Int literals; the SQL builtins they wrap accept column
    * amounts).
    */
  def bloomMightContain(key: Column, bloom: Column, logBits: Int = 16,
      k: Int = 5): Column = {
    import org.apache.spark.sql.graftshim.{columnExpr, exprColumn}
    import org.apache.spark.sql.catalyst.expressions.ShiftRightUnsigned
    def shiftRU(v: Column, n: Column): Column =
      exprColumn(ShiftRightUnsigned(columnExpr(v), columnExpr(n)))
    bloomPositions(key, logBits, k).map { pos =>
      val word = element_at(bloom,
        (shiftRU(pos, lit(6)) + lit(1L)).cast("int"))
      shiftRU(word, pos.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** k bit positions from ONE xxhash64 evaluation (Kirsch–Mitzenmacher
    * double hashing: pos_i = h_lo + i·(h_hi|1) mod m). h_lo/h_hi are
    * < 2^32, so h_lo + (k−1)·h_hi stays far from long overflow.
    */
  private def bloomPositions(key: Column, logBits: Int,
      k: Int): Seq[Column] = {
    // validated HERE so both the build (bloomBitmap) and the probe
    // (bloomMightContain) paths reject out-of-range parameters — a
    // probe-only caller with logBits past the bitmap length would
    // otherwise silently break the no-false-negatives contract
    require(logBits >= 6 && logBits <= 26, s"logBits out of range: $logBits")
    require(k >= 1 && k <= 16, s"k out of range: $k")
    val m = 1L << logBits
    val h = xxhash64(key)
    val lo = h.bitwiseAND(lit(0xffffffffL))
    val hi = shiftrightunsigned(h, 32).bitwiseOR(lit(1L))
    (0 until k).map(i => pmod(lo + lit(i.toLong) * hi, lit(m)))
  }
}
