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

  /** alpha_m bias constant (Flajolet et al. 2007, m ≥ 128). */
  private[graft] def alphaM(m: Int): Double = {
    require(m >= 128, s"alphaM constant table needs m >= 128, got $m")
    0.7213 / (1.0 + 1.079 / m)
  }
}
