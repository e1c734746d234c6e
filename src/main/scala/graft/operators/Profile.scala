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

  /** Approximate percentiles from an equi-width HISTOGRAM — the
    * fixed-memory, sort-free serving path [[percentilesDisc]]'s scaladoc
    * promises: per group only (bin → count) state (≤ `bins` cells), built
    * in one map-side-combining aggregation over the values — no global
    * sort, no per-row window, mergeable across partitions/batches by
    * construction. The reported value is the UPPER EDGE of the first bin
    * whose cumulative count reaches rank ⌈p·n⌉ — a one-sided guarantee
    * (estimate ≥ the exact type-1 percentile, error ≤ one bin width =
    * (max−min)/bins), the [[graft.operators.Sketches]] one-sided-error
    * pattern applied to quantiles.
    *
    * Engine-portable determinism: bin indices and the edge value are pure
    * elementary IEEE arithmetic over identical operands (width =
    * (hi−lo)/bins, bin = floor((v−lo)/width) clamped, est = lo +
    * width·(bin+1)) — each op correctly rounded, so both engines produce
    * the same doubles; ranks are exact integers. A constant group
    * (hi = lo) reports lo for every p.
    *
    * Needs one prior (min, max, count) pass — ranges are broadcast back;
    * at fleet scale ranges are usually known schema metadata and the
    * histogram pass is the only scan.
    */
  def percentilesHistogram(df: DataFrame, groupCol: String, valCol: String,
      ps: Seq[Double], bins: Int = 1024): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"quantiles must be in (0,1], got $ps")
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val g = col(groupCol)
    val v = col(valCol)
    val stats = df.groupBy(g)
      .agg(min(v).as("graft_lo"), max(v).as("graft_hi"),
        count(lit(1)).as("graft_n"))
    val width = (col("graft_hi") - col("graft_lo")) / lit(bins.toDouble)
    val binned = df.join(broadcast(stats), groupCol)
      .withColumn("graft_bin",
        when(col("graft_hi") === col("graft_lo"), lit(0L))
          .otherwise(least(lit(bins.toLong - 1),
            floor((v - col("graft_lo")) / width))))
      .groupBy(g, col("graft_bin"))
      .agg(count(lit(1)).as("graft_cnt"))
    val cum = binned.withColumn("graft_cum",
      sum("graft_cnt").over(Window.partitionBy(g).orderBy("graft_bin")))
    val psDf = {
      val spark = df.sparkSession
      import spark.implicits._
      ps.map(p => ("p" + math.round(p * 100), p))
        .toDF("graft_p_name", "graft_p")
    }
    cum.join(broadcast(stats.select(g.as("graft_g2"), col("graft_lo"),
        col("graft_hi"), col("graft_n"))), g === col("graft_g2"))
      .crossJoin(broadcast(psDf))
      .filter(col("graft_cum") >=
        ceil(col("graft_n") * col("graft_p")).cast("long"))
      .groupBy(g, col("graft_p_name"))
      .agg(min("graft_bin").as("graft_minbin"),
        first("graft_lo").as("graft_lo"), first("graft_hi").as("graft_hi"),
        first("graft_n").as("graft_n"))
      .select(g, col("graft_p_name").as("p"),
        when(col("graft_hi") === col("graft_lo"), col("graft_lo"))
          .otherwise(col("graft_lo") +
            (col("graft_hi") - col("graft_lo")) / lit(bins.toDouble) *
              (col("graft_minbin") + lit(1L))).as("est"),
        col("graft_n").as("n_rows"))
  }

  /** One-pass table profile — the dbt-docs/`describe` summary every
    * dataset publication step wants: per column, row count, null count,
    * EXACT distinct count, lexicographic min/max (values cast to string
    * first, so one report schema covers every column type; callers
    * needing typed extrema have plain min/max). For approximate
    * distincts at fleet scale swap in [[Sketches.hllDistinct]] per
    * column — this operator is the exact variant.
    *
    * Shape: the columns UNPIVOT under a column-name tag (one scan,
    * explode ×|cols| — each output row carries one string, never the
    * whole input row), then ONE aggregation per tag computes all
    * counters; the exact distinct is the only expensive piece and it
    * partial-aggregates per (column, value) like any distinct-count
    * decomposition. Adding a column to the profile adds explode rows,
    * not jobs or scans. Binary/float formatting is ENGINE-SPECIFIC
    * (Spark renders 1.0, DuckDB 1.0 vs 1 — the usual cast seam), so the
    * gate profiles the cast-stable types; the operator itself takes any
    * column.
    */
  /** Robust per-group outlier screen — the median/MAD rule data-curation
    * pipelines prefer over mean/σ (a contaminated tail corrupts the mean
    * and σ it is judged against; the median and the median absolute
    * deviation stay put up to 50 % contamination). Per group: n, the
    * type-1 median, MAD = type-1 median of |x − med|, and the count of
    * rows with |x − med| > k·MAD.
    *
    * Exact (both medians are [[percentilesDisc]] rank-ceil selections of
    * ACTUAL data values, deviations are single correctly-rounded IEEE
    * subtractions) and therefore engine-portable — the q100 oracle
    * replays the whole chain in SQL and hash-matches. Cost is the
    * honest price of exact MAD: two windowed median passes + one
    * counting pass (each one shuffle on the group key). For a
    * fixed-memory approximate screen compose [[percentilesHistogram]]
    * instead. Contract: `valCol` non-null (as [[percentilesDisc]] —
    * engines disagree on null sort order).
    */
  def robustOutliers(df: DataFrame, groupCol: String, valCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val med = percentilesDisc(df, groupCol, valCol, Seq(0.5))
      .select(col(groupCol), col("p50").as("graft_med"))
    val dev = df.join(med, groupCol)
      .withColumn("graft_dev", abs(col(valCol) - col("graft_med")))
    val mad = percentilesDisc(dev, groupCol, "graft_dev", Seq(0.5))
      .select(col(groupCol), col("p50").as("graft_mad"))
    dev.join(mad, groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        max(col("graft_med")).as("med"),
        max(col("graft_mad")).as("mad"),
        sum(when(col("graft_dev") > lit(k) * col("graft_mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.distinct == cols, s"bad cols: $cols")
    // the unpivot tag is the POSITION, not the column-name string — the
    // tag rides every row through the distinct-count shuffles, and a
    // constant per-row string is dead shuffle weight at any scale; the
    // name rejoins from an array literal on the final (|cols|-row) frame
    df.select(posexplode(array(cols.map(c => col(c).cast("string")): _*))
        .as(Seq("graft_i", "v")))
      .groupBy("graft_i")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("min_str"),
        max(col("v")).as("max_str"))
      .select(element_at(lit(cols.toArray), col("graft_i") + 1)
          .as("column"),
        col("n_rows"), col("n_nulls"), col("n_distinct"),
        col("min_str"), col("max_str"))
  }
}
