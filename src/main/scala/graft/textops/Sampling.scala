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
}
