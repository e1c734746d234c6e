package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-profiling percentiles: EXACT discontinuous (type-1) quantiles per
  * group — the value at 1-based sorted rank `ceil(p·n)`. Selecting an
  * EXISTING value (never interpolating) keeps the result engine-portable
  * bit for bit: interpolation formulas differ subtly across engines
  * (index base, midpoint arithmetic order), but "the element at rank k of
  * the sorted column" has exactly one answer, and ties by value cannot
  * perturb it (equal values at the boundary yield the same selected
  * value under any tie order — no explicit tie-break column needed).
  *
  * Shape: one shuffle on the group key, one distributed sort per group
  * (rank via `row_number`), the selection itself a conditional aggregate.
  * This is the profiling VERIFICATION twin: at 100 TB the serving path is
  * `approx_percentile` (t-digest-style mergeable sketch, no global sort);
  * the exact-rank formulation exists because it is SQL-restatable and
  * hash-checkable — run it on samples/partitions to bound the sketch's
  * error, not on the full corpus.
  */
object Profile {

  /** One row per group: `p<nn>` columns for each requested quantile plus
    * `n_rows`. Quantiles in (0, 1].
    */
  def percentilesDisc(df: DataFrame, groupCol: String, valCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"quantiles must be in (0,1], got $ps")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valCol))
    val n = Window.partitionBy(col(groupCol))
    val ranked = df
      .withColumn("graft_rn", row_number().over(w))
      .withColumn("graft_n", count(lit(1)).over(n))
    val picks: Seq[Column] = ps.map { p =>
      val name = "p" + math.round(p * 100).toString
      max(when(col("graft_rn") ===
        ceil(col("graft_n") * lit(p)).cast("long"), col(valCol))).as(name)
    }
    ranked.groupBy(col(groupCol))
      .agg(picks.head, picks.tail :+ count(lit(1)).as("n_rows"): _*)
  }
}
