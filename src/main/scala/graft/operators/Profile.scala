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

  /** EXACT type-1 per-group quantile WITHOUT a per-row sort — histogram
    * bucket localization. The value at 1-based rank ⌈p·n⌉ is found by
    * (1) a (min, max, n) stats pass, (2) a 1024-bin histogram pass whose
    * per-group counts collect into ONE bounded array (≤ `bins` cells) and
    * a higher-order-function walk locates the bucket containing the rank
    * plus the residual rank inside it, (3) one NARROW pass over just that
    * bucket's rows, collapsed to per-distinct-value counts, walked the
    * same way to the exact value. No `row_number` Window, no global or
    * per-group sort of data rows — the histogram array is positional
    * (index = bin, no sort at all) and the only `array_sort` runs over
    * the bounded in-bucket distinct values (expected n/bins).
    * Bit-identical to [[percentilesDisc]] IN THE SELECTED VALUE for
    * non-null group keys: the selected value is an ACTUAL element at an
    * exact integer rank, and the bin index is the same IEEE expression
    * at locate and filter time, so localization cannot disagree with
    * itself. Two deliberate contract differences from
    * [[percentilesDisc]]: (1) NULL group keys DROP — the stats
    * equi-join eliminates them, where the window/groupBy path retains
    * them as their own group; (2) the output schema is (group, q) only,
    * without percentilesDisc's `n_rows` column. Degenerate hi = lo
    * groups fall out naturally (every row bins to 0, the walk returns the
    * single value). Contract: `valCol` non-null, numeric.
    *
    * 100 TB posture: three scan-bound passes, all aggregations map-side
    * combining; per-group driver-free state is the bounded histogram
    * array. The in-bucket collect is bounded by DISTINCT values within
    * one bucket (expected n/bins after duplicate collapse) — a
    * distribution adversarially concentrating its mass inside 1/bins of
    * its own min–max range degrades that bound; for strictly fixed
    * memory use [[percentilesHistogram]] / [[robustOutliersApprox]].
    */
  def quantileDiscNoSort(df: DataFrame, groupCol: String, valCol: String,
      p: Double, bins: Int = 1024): DataFrame =
    quantileWithStats(df, groupCol, valCol, p, bins,
      rangeStats(df, groupCol, valCol))

  /** Multi-quantile [[quantileDiscNoSort]] with [[percentilesDisc]]'s
    * exact output schema (`p<nn>` columns + `n_rows`) — the q64 serving
    * path. One histogram aggregate locates EVERY requested rank (the
    * walk repeats per p over the same in-row positional array — G×bins
    * cells, no data sort), then ONE bucket-filter pass collects the ≤|ps|
    * target bins' distinct values and the per-p in-bucket walk selects
    * the exact type-1 element. Same contract deltas as
    * [[quantileDiscNoSort]] (NULL group keys drop; `valCol` non-null) —
    * and unlike the window formulation, no group ever funnels through a
    * single sort task: both passes are map-side-combining aggregates, so
    * a 5-group × 20 B-row profile parallelizes by split, not by group.
    * Spec-pinned equal to [[percentilesDisc]] on random corpora with
    * ties (SessionsProfileSpec).
    *
    * TWO full scans, not three (the r16 formulation's dedicated
    * (min, max, n) range pass is gone): bin domains are SEEDED from a
    * LIMIT-bounded sample — a near-free job that stops each scan task
    * after its first rows — and binning clamps BOTH edges, so a seed
    * range that fails to bound the data stays EXACT (clamping is
    * monotone and applied identically at locate and filter time; rank
    * localization only degrades into fatter edge buckets). Groups the
    * sample missed fall back to the sample's global range. The
    * degradation bound changes accordingly: in-bucket distinct volume
    * is n/bins only to the extent a group's seed range resembles its
    * true range — a group concentrated inside a sliver of its seed
    * range funnels into few buckets (exact, but the bucket collect
    * grows); the three-pass [[quantileWithStats]] path remains for
    * callers wanting per-group measured ranges. */
  def percentilesDiscNoSort(df: DataFrame, groupCol: String,
      valCol: String, ps: Seq[Double], bins: Int = 1024,
      seedRows: Int = 65536): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"quantiles must be in (0,1], got $ps")
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val g = col(groupCol)
    val v = col(valCol).cast("double")
    // seed job: ONE global (lo, hi) over the first `seedRows` rows —
    // LocalLimit short-circuits each scan task, so this reads ~one row
    // group per split, not the table. A GLOBAL seed (not per-group)
    // keeps the locate pass join-free: binning becomes a pure literal
    // expression over the value column.
    val seedRow = df.filter(g.isNotNull && v.isNotNull)
      .select(v.as("graft_v")).limit(seedRows)
      .agg(min(col("graft_v")), max(col("graft_v"))).head()
    val (glo, ghi) =
      if (seedRow.isNullAt(0)) (0.0, 1.0)
      else (seedRow.getDouble(0), seedRow.getDouble(1))
    // both-edge clamp: monotone, identical at locate and filter time —
    // a non-bounding seed range cannot break rank localization
    def binOf(lo: Column, hi: Column): Column =
      when(hi <= lo, lit(0L))
        .otherwise(greatest(lit(0L), least(lit(bins.toLong - 1),
          floor((v - lo) / ((hi - lo) / lit(bins.toDouble))))))
    def walk(cells: Column, rank: Column): Column =
      aggregate(cells,
        struct(lit(0L).as("cum"), lit(false).as("found"),
          lit(0.0).as("key"), lit(0L).as("before")),
        (acc, x) => when(acc("found"), acc).otherwise(
          when(acc("cum") + x("cnt") >= rank,
            struct((acc("cum") + x("cnt")).as("cum"), lit(true).as("found"),
              x("key").as("key"), acc("cum").as("before")))
            .otherwise(struct((acc("cum") + x("cnt")).as("cum"),
              lit(false).as("found"), lit(0.0).as("key"),
              lit(0L).as("before")))))
    // locate pass (full scan 1): one fixed-state histogram per group,
    // every rank walked over the same positional array — JOIN-FREE:
    // the bin expression is a literal-range function of the value
    val seededBin = binOf(lit(glo), lit(ghi))
    val hist = df.filter(g.isNotNull)
      .groupBy(g)
      .agg(graft.functions.AggExprs.binCounts(seededBin, bins)
          .as("graft_hist"),
        count(lit(1)).as("graft_n"))
      .select(Seq(g, col("graft_n"),
        transform(col("graft_hist"),
          (c, i) => struct(i.cast("double").as("key"), c.as("cnt")))
          .as("graft_cells")): _*)
    val located = hist.select(
      Seq(g, col("graft_n")) ++
        ps.zipWithIndex.flatMap { case (p, i) =>
          val rank = ceil(col("graft_n") * lit(p)).cast("long")
          val w = walk(col("graft_cells"), rank)
          Seq(w.getField("key").cast("long").as(s"graft_tbin_$i"),
            (rank - w.getField("before")).as(s"graft_kin_$i"))
        }: _*)
      .withColumn("graft_tbins",
        array(ps.indices.map(i => col(s"graft_tbin_$i")): _*))
    // bucket pass (full scan 2): only rows in a target bin survive;
    // per-bin distinct values sort inside a bounded array, never a
    // data-row sort. Same literal bin expression → same bin per value.
    val cellsByBin = df.join(broadcast(located), groupCol)
      .filter(array_contains(col("graft_tbins"), seededBin))
      .groupBy(g, seededBin.as("graft_bin"), v.as("graft_v"))
      .agg(count(lit(1)).as("graft_cnt"))
      .groupBy(g, col("graft_bin"))
      .agg(sort_array(collect_list(struct(col("graft_v").as("key"),
        col("graft_cnt").as("cnt")))).as("graft_bcells"))
      .groupBy(g)
      .agg(map_from_entries(collect_list(struct(col("graft_bin"),
        col("graft_bcells")))).as("graft_bymap"))
    val picks: Seq[Column] = ps.zipWithIndex.map { case (p, i) =>
      val name = "p" + math.round(p * 100).toString
      walk(element_at(col("graft_bymap"), col(s"graft_tbin_$i")),
        col(s"graft_kin_$i")).getField("key").as(name)
    }
    located.join(cellsByBin, groupCol)
      .select(Seq(g) ++ picks :+ col("graft_n").as("n_rows"): _*)
  }

  /** ONE-PASS exact type-1 percentiles via Spark's native
    * `percentile_disc` aggregate — the serving path when the value
    * domain's DISTINCT count per group is bounded (prices, durations,
    * scores): the aggregate's partial state is a (value → count) map,
    * map-side combining, merged across partitions, and only the final
    * per-group merge walks the sorted distinct values — no data-row
    * sort, no window, ONE job. `percentile_disc(p)` selects the
    * smallest value with cume_dist ≥ p, which IS the rank-⌈p·n⌉
    * element, so this is bit-identical to [[percentilesDisc]] (spec-
    * pinned). Same output schema (`p<nn>` + `n_rows`); NULL group keys
    * are RETAINED (groupBy semantics, like [[percentilesDisc]]).
    * Two caveats keep [[percentilesDiscNoSort]] the default serving
    * path: the per-group map grows with DISTINCT values (unbounded for
    * raw floats at 100 TB), and the aggregate is an un-codegen'd
    * TypedImperativeAggregate whose per-row boxed map update measured
    * ~30 % SLOWER than the two-scan histogram path at sf1 (1.6 s vs
    * 1.2 s isolated) despite being one job — the one-job shape only
    * wins when job-scheduling latency dominates the scan. */
  def percentilesDiscAgg(df: DataFrame, groupCol: String,
      valCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"quantiles must be in (0,1], got $ps")
    val picks: Seq[Column] = ps.map { p =>
      val name = "p" + math.round(p * 100).toString
      expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY $valCol)")
        .cast("double").as(name)
    }
    df.groupBy(col(groupCol))
      .agg(picks.head, picks.tail :+ count(lit(1)).as("n_rows"): _*)
  }

  /** Per-group (graft_lo, graft_hi, graft_n) over `valCol` as doubles —
    * the range-statistics frame [[quantileWithStats]] consumes.
    */
  private[operators] def rangeStats(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val v = col(valCol).cast("double")
    df.groupBy(col(groupCol))
      .agg(min(v).as("graft_lo"), max(v).as("graft_hi"),
        count(lit(1)).as("graft_n"))
  }

  /** [[quantileDiscNoSort]] with the range stats supplied by the caller —
    * `graft_lo`/`graft_hi` need only BOUND the values (lo ≤ every v ≤
    * hi), not equal the true min/max: bins partition [lo, hi] either
    * way, and the rank walk is exact under any consistent binning. This
    * is what lets [[robustOutliers]] skip the deviation-stats scan: dev
    * bounds derive algebraically from the value stats and the median
    * (lo = 0, hi = max(hi − med, med − lo)).
    */
  private[operators] def quantileWithStats(df: DataFrame, groupCol: String,
      valCol: String, p: Double, bins: Int, stats: DataFrame): DataFrame = {
    // NOTE: `stats` appears twice in the returned plan (the locate join
    // and the final stats.join(located) broadcast). The documented
    // "three scan-bound passes" cost relies on Spark's ReusedExchange /
    // subquery reuse deduplicating the stats scan+aggregate; absent that
    // reuse (e.g. a planner that re-optimizes the subtrees apart) the
    // worst case is four passes. Callers needing a GUARANTEED pass count
    // should materialize stats first, as robustOutliers' eager path does.
    require(p > 0 && p <= 1, s"quantile must be in (0,1], got $p")
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val g = col(groupCol)
    val v = col(valCol).cast("double")
    // the bin expression — used identically in the locate pass and the
    // bucket-filter pass, so the same row maps to the same bin both times
    def binOf: Column =
      when(col("graft_hi") === col("graft_lo"), lit(0L))
        .otherwise(least(lit(bins.toLong - 1),
          floor((v - col("graft_lo")) /
            ((col("graft_hi") - col("graft_lo")) / lit(bins.toDouble)))))
    // walk a (key ASC)-ordered array of (key, cnt) cells: first cell
    // where the running count reaches `rank`, plus the count BEFORE it
    def walk(cells: Column, rank: Column): Column =
      aggregate(cells,
        struct(lit(0L).as("cum"), lit(false).as("found"),
          lit(0.0).as("key"), lit(0L).as("before")),
        (acc, x) => when(acc("found"), acc).otherwise(
          when(acc("cum") + x("cnt") >= rank,
            struct((acc("cum") + x("cnt")).as("cum"), lit(true).as("found"),
              x("key").as("key"), acc("cum").as("before")))
            .otherwise(struct((acc("cum") + x("cnt")).as("cum"),
              lit(false).as("found"), lit(0.0).as("key"),
              lit(0L).as("before")))))
    val rank = ceil(col("graft_n") * lit(p)).cast("long")
    // locate: ONE fixed-state aggregate ([[graft.functions.AggExprs
    // .BinCounts]] — long[bins] per group, map-side combining) builds the
    // whole histogram; the positional array walks in-row, no sort at all
    val located = df.join(broadcast(stats), groupCol)
      .groupBy(g)
      .agg(graft.functions.AggExprs.binCounts(binOf, bins)
          .as("graft_hist"),
        first(rank).as("graft_rank"))
      .select(g, col("graft_rank"),
        walk(transform(col("graft_hist"),
            (c, i) => struct(i.cast("double").as("key"), c.as("cnt"))),
          col("graft_rank")).as("graft_w"))
      .select(g,
        col("graft_w").getField("key").cast("long").as("graft_tbin"),
        (col("graft_rank") - col("graft_w").getField("before"))
          .as("graft_kin"))
    df.join(broadcast(stats.join(located, groupCol)), groupCol)
      .filter(binOf === col("graft_tbin"))
      .groupBy(g, v.as("graft_v"))
      .agg(count(lit(1)).as("graft_cnt"), first("graft_kin").as("graft_kin"))
      .groupBy(g)
      .agg(sort_array(collect_list(struct(col("graft_v").as("key"),
          col("graft_cnt").as("cnt")))).as("graft_cells"),
        first("graft_kin").as("graft_kin"))
      .select(g, walk(col("graft_cells"), col("graft_kin"))
        .getField("key").as("q"))
  }

  /** Robust per-group outlier screen — the median/MAD rule data-curation
    * pipelines prefer over mean/σ (a contaminated tail corrupts the mean
    * and σ it is judged against; the median and the median absolute
    * deviation stay put up to 50 % contamination). Per group: n, the
    * type-1 median, MAD = type-1 median of |x − med|, and the count of
    * rows with |x − med| > k·MAD.
    *
    * Exact and engine-portable (both medians are rank-ceil selections of
    * ACTUAL data values, deviations are single correctly-rounded IEEE
    * subtractions) — the q100 oracle replays the chain as windowed SQL
    * and hash-matches, while the Spark side runs NO Window at all. The
    * implementation is an EAGER five-job pipeline (the [[Layout
    * .zOrderKey]] statistics discipline — driver traffic is per-group
    * scalars, proportional to the operator's own G-row output): (1)
    * range stats, (2) median histogram ([[graft.functions.AggExprs
    * .BinCounts]] — fixed long[bins]/group, map-side combining), (3) the
    * median bucket's exact values, (4) deviation histogram — its bounds
    * DERIVE from (1)+median, no extra scan — and (5) the MAD bucket plus
    * every bin the k·MAD threshold could land in (≤ ⌈k⌉+2 bins), from
    * which the outlier count resolves exactly on the driver (full bins
    * below the threshold bin from the histogram, the threshold bin by
    * value) — no sixth scan, no Window, no per-group sort anywhere; the
    * result returns as a local relation. Driver and executors evaluate
    * the SAME IEEE bin expression, so localization cannot disagree with
    * itself. Per-median exactness logic is [[quantileDiscNoSort]]'s
    * (lazy, spec-pinned against [[percentilesDisc]]); for a strictly
    * fixed-memory approximate screen use [[robustOutliersApprox]].
    * Driver-memory caveat (same bound as [[quantileDiscNoSort]]'s
    * in-bucket collect): the bucket jobs ship per-(group, candidate-bin,
    * distinct-value) counts to the driver — expected n/bins distinct
    * values per group, but a distribution adversarially concentrating a
    * group's mass inside 1/bins of its own min–max range degrades that
    * to O(distinct values in the group); size driver memory accordingly
    * or fall back to [[robustOutliersApprox]].
    * Contract: `valCol` non-null (engines disagree on null sort order);
    * null GROUP keys drop (join semantics, as before).
    */
  def robustOutliers(df: DataFrame, groupCol: String, valCol: String,
      k: Double = 3.0, bins: Int = 1024): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val spark = df.sparkSession
    val g = col(groupCol)
    val v = col(valCol).cast("double")
    val gField = df.schema(groupCol)

    // Driver-side twin of the executor bin expression — IDENTICAL IEEE
    // operand order ((x−lo) / ((hi−lo)/bins)), so a driver-computed bin
    // index can never disagree with the executors' binning of the same
    // value. Doubles round-trip the driver exactly (typed rows, no
    // string formatting).
    def binOfD(x: Double, lo: Double, hi: Double): Long =
      if (hi == lo) 0L
      else math.min(bins - 1L,
        math.floor((x - lo) / ((hi - lo) / bins.toDouble)).toLong)
    def binExpr(vc: Column): Column =
      when(col("graft_hi") === col("graft_lo"), lit(0L))
        .otherwise(least(lit(bins.toLong - 1),
          floor((vc - col("graft_lo")) /
            ((col("graft_hi") - col("graft_lo")) / lit(bins.toDouble)))))
    def localDf(rows: Seq[org.apache.spark.sql.Row],
        fields: org.apache.spark.sql.types.StructField*): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        org.apache.spark.sql.types.StructType(gField +: fields))
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField}
    val loF = StructField("graft_lo", DoubleType)
    val hiF = StructField("graft_hi", DoubleType)

    // job 1 — per-group range stats. G×3 scalars come back to the driver
    // and re-enter each later pass as a LOCAL relation (the zOrderKey
    // discipline: driver traffic is the statistics themselves, and G is
    // the operator's own output cardinality). All later joins broadcast
    // local frames — no recomputed aggregate subtrees, no repeated scans.
    // null group keys drop (equi-join semantics, as the previous
    // join-based formulation and the oracle's JOIN ... USING)
    val statsRows = df.groupBy(g)
      .agg(min(v).as("lo"), max(v).as("hi"), count(lit(1)).as("n"))
      .collect()
      .filter(_.get(0) != null)
    val stats = statsRows.map(r =>
      r.get(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap

    // One LOCATE job: BinCounts histogram (fixed long[bins]/group,
    // map-side combining) + the rank walk evaluated IN-PLAN, so the
    // driver receives (bucket, residual rank, candidate-bin cumulative
    // counts) — G × O(1) scalars, NEVER the G × bins histogram (at 10⁵
    // profiling groups that collect would ship ~1 GB of data the
    // executors can reduce themselves). With `thresholdK` set, each row
    // also carries cum-below counts for every bin the k·median outlier
    // threshold could land in (median ∈ bucket tb ⇒ k·median ∈
    // [k·tb·w, k·(tb+1)·w] ⇒ bin ∈ [⌊k·tb⌋, ⌈k·(tb+1)⌉], clamped into
    // [0, bins) on BOTH ends — a threshold beyond the top edge still
    // resolves to bin bins−1, which must stay coverable).
    def locateJob(src: DataFrame, vc: Column,
        bounds: Map[Any, (Double, Double)], thresholdK: Option[Double])
        : Map[Any, (Long, Long, Map[Long, Long])] = {
      val bDf = localDf(bounds.toSeq.map { case (gv, (lo, hi)) =>
        Row(gv, lo, hi, stats(gv)._3) }, loF, hiF,
        StructField("graft_n", LongType))
      val histed = src.join(broadcast(bDf), groupCol)
        .groupBy(g)
        .agg(graft.functions.AggExprs.binCounts(binExpr(vc), bins)
            .as("h"),
          first(col("graft_n")).as("n"))
      val rank = ceil(col("n") * lit(0.5)).cast("long")
      val cells = transform(col("h"),
        (c, i) => struct(i.cast("long").as("b"), c.as("cnt")))
      val w = aggregate(cells,
        struct(lit(0L).as("cum"), lit(false).as("found"),
          lit(0L).as("b"), lit(0L).as("before")),
        (acc, x) => when(acc("found"), acc).otherwise(
          when(acc("cum") + x("cnt") >= rank,
            struct((acc("cum") + x("cnt")).as("cum"),
              lit(true).as("found"), x("b").as("b"),
              acc("cum").as("before")))
            .otherwise(struct((acc("cum") + x("cnt")).as("cum"),
              lit(false).as("found"), lit(0L).as("b"),
              lit(0L).as("before")))))
      val withLoc = histed
        .withColumn("graft_w", w)
        .withColumn("graft_tbin", col("graft_w").getField("b"))
        .withColumn("graft_kin",
          rank - col("graft_w").getField("before"))
      val projected = thresholdK match {
        case None =>
          withLoc.select(g, col("graft_tbin"), col("graft_kin"),
            array().cast("array<struct<b:bigint,below:bigint>>")
              .as("graft_cands"))
        case Some(kk) =>
          // padded ±1 bin: the range bound is real-arithmetic exact, but
          // the driver's floor((k·median)/width) evaluates a different
          // FP expression order — at an exact bin boundary its rounding
          // could land one bin outside the unpadded range
          val loC = greatest(lit(0L), least(lit(bins - 1L),
            floor(lit(kk) * col("graft_tbin")).cast("long") - 1L))
          val hiC = least(lit(bins - 1L),
            ceil(lit(kk) * (col("graft_tbin") + 1)).cast("long") + 1L)
          withLoc.select(g, col("graft_tbin"), col("graft_kin"),
            transform(sequence(loC, hiC), b => struct(b.as("b"),
              aggregate(slice(col("h"), lit(1), b.cast("int")), lit(0L),
                (acc, x) => acc + x).as("below"))).as("graft_cands"))
      }
      projected.collect().map { r =>
        val cands = r.getSeq[org.apache.spark.sql.Row](3)
          .map(c => c.getLong(0) -> c.getLong(1)).toMap
        r.get(0) -> ((r.getLong(1), r.getLong(2), cands))
      }.toMap
    }

    // One bucket job: per-(group, bin, value) counts for each group's
    // CANDIDATE bin set (|set| ≤ k+2 — never the whole histogram).
    def bucketJob(src: DataFrame, vc: Column,
        bounds: Map[Any, (Double, Double)],
        cand: Map[Any, Seq[Long]]): Map[Any, Map[Long, Seq[(Double, Long)]]] = {
      val bDf = localDf(bounds.toSeq.map { case (gv, (lo, hi)) =>
        Row(gv, lo, hi, cand(gv)) }, loF, hiF,
        StructField("graft_cand",
          org.apache.spark.sql.types.ArrayType(LongType, false)))
      src.join(broadcast(bDf), groupCol)
        .filter(array_contains(col("graft_cand"), binExpr(vc)))
        .groupBy(g, binExpr(vc).as("b"), vc.as("vv"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(_.get(0))
        .map { case (gv, rows) =>
          gv -> rows.groupBy(_.getLong(1)).map { case (b, rs) =>
            b -> rs.map(r => (r.getDouble(2), r.getLong(3)))
              .sortBy(_._1).toSeq
          }
        }
    }

    // The exact value at residual rank `kin` among sorted (value, cnt).
    def pick(cells: Seq[(Double, Long)], kin: Long): Double = {
      var cum = 0L
      cells.find { case (_, c) => cum += c; cum >= kin }.get._1
    }

    // jobs 2+3 — exact median per group
    val medBounds = stats.map { case (gv, (lo, hi, _)) => gv -> ((lo, hi)) }
    val medLoc = locateJob(df, v, medBounds, thresholdK = None)
    val medCells = bucketJob(df, v, medBounds,
      medLoc.map { case (gv, (tb, _, _)) => gv -> Seq(tb) })
    val med = medLoc.map { case (gv, (tb, kin, _)) =>
      gv -> pick(medCells(gv)(tb), kin) }

    // jobs 4+5 — exact MAD. Deviation bounds need NO extra scan
    // (0 ≤ |x−med| ≤ max(hi−med, med−lo)); the dev frame joins the
    // local medians in. The locate job also returns cum-below counts
    // for every bin the k·mad outlier threshold could land in, and the
    // bucket job collects those bins' exact values — which makes the
    // final counting scan unnecessary: outliers = n − (cum below the
    // threshold bin) − (exact count inside it).
    val medDf = localDf(med.toSeq.map { case (gv, m) => Row(gv, m) },
      StructField("graft_med", DoubleType))
    val devBounds = stats.map { case (gv, (lo, hi, _)) =>
      gv -> ((0.0, math.max(hi - med(gv), med(gv) - lo))) }
    val devSrc = df.join(broadcast(medDf), groupCol)
    val devCol = abs(v - col("graft_med"))
    val devLoc = locateJob(devSrc, devCol, devBounds, thresholdK = Some(k))
    val devCand = devLoc.map { case (gv, (tb, _, cands)) =>
      gv -> (Seq(tb) ++ cands.keys).distinct
    }
    val devCells = bucketJob(devSrc, devCol, devBounds, devCand)
    val mad = devLoc.map { case (gv, (tb, kin, _)) =>
      gv -> pick(devCells(gv)(tb), kin) }

    // driver — exact outlier counts from the candidate-bin cumulatives
    // + the threshold bin's exact values (same IEEE binning both sides)
    val out = stats.toSeq.map { case (gv, (_, hiB, n)) =>
      val m = mad(gv)
      val t = k * m
      val (_, devHiB) = devBounds(gv)
      val nOut =
        if (devHiB == 0.0) 0L // every deviation is exactly 0 ≤ t
        else {
          val bStar = binOfD(t, 0.0, devHiB)
          val below = devLoc(gv)._3(bStar) // clamped range covers bStar
          val inStar = devCells(gv).getOrElse(bStar, Seq.empty)
          val leThr = inStar.collect { case (dv, c) if dv <= t => c }.sum
          n - below - leThr
        }
      Row(gv, n, med(gv), m, nOut)
    }
    localDf(out, StructField("n_rows", LongType),
      StructField("med", DoubleType), StructField("mad", DoubleType),
      StructField("n_outliers", LongType))
  }

  /** Fixed-memory APPROXIMATE twin of [[robustOutliers]] — both medians
    * come from [[percentilesHistogram]] (upper-bin-edge estimates, error
    * ≤ one bin width of the respective value range), so per-group state
    * is strictly ≤ `bins` cells end to end regardless of the data
    * distribution — the serving-path variant the exact screen's scaladoc
    * promises. One-sided per-median error (estimate ≥ exact type-1
    * median); the outlier count is exact COUNTING against the
    * approximate thresholds. Same output schema as the exact screen.
    */
  def robustOutliersApprox(df: DataFrame, groupCol: String, valCol: String,
      k: Double = 3.0, bins: Int = 1024): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val med = percentilesHistogram(df, groupCol, valCol, Seq(0.5), bins)
      .select(col(groupCol), col("est").as("graft_med"))
    val dev = df.join(broadcast(med), groupCol)
      .withColumn("graft_dev", abs(col(valCol) - col("graft_med")))
    val mad = percentilesHistogram(dev, groupCol, "graft_dev", Seq(0.5), bins)
      .select(col(groupCol), col("est").as("graft_mad"))
    dev.join(broadcast(mad), groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        max(col("graft_med")).as("med"),
        max(col("graft_mad")).as("mad"),
        sum(when(col("graft_dev") > lit(k) * col("graft_mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** EXACT table profile — the AUDIT variant, not the default. Per
    * column: row count, null count, EXACT distinct count, and the
    * NATIVE-order min/max rendered to string AFTER aggregation (one
    * report schema covers every column type at two casts per column
    * instead of one per row; note the deliberate semantics seam vs
    * [[describeApprox]], whose unpivoted sketch pass min/maxes the
    * string RENDERINGS — lexicographic — because its values are already
    * strings in flight). **The documented default profile is
    * [[describeApprox]]**
    * (HLL distincts, one pass, fixed-size mergeable state — 0.16× the
    * oracle at sf1 where this exact decomposition runs ~30×): reach for
    * `describe` only when the distinct counts must be exact — schema
    * audits, reconciliation, oracle generation — and accept that an
    * exact per-(column, value) decomposition is inherently the
    * expensive twin at any scale.
    *
    * Shape: one plain global aggregate for ALL counters (3·|cols|+1
    * counters riding a single un-expanded scan, one row out), plus ONE
    * INDEPENDENT two-phase distinct aggregate PER COLUMN — deliberately
    * not fused: Catalyst plans fused multi-distinct with an
    * Expand×|cols| of the scanned rows (measured 12 s vs 2.2 at sf1
    * when the counters fuse in), while the per-column chains share no
    * dependency, so the scheduler runs their stages CONCURRENTLY inside
    * the one assembly job — wall ≈ the widest column, not the sum. Each
    * distinct keeps map-side partial aggregation (skew-safe on
    * low-cardinality columns: partials collapse before the exchange —
    * the reason this is NOT the repartition-first shape
    * [[graft.operators.Quality]] uses for ~unique audit keys).
    * Binary/float
    * formatting is ENGINE-SPECIFIC (Spark renders 1.0, DuckDB 1.0 vs
    * 1 — the usual cast seam), so the gate profiles the cast-stable
    * types; the operator itself takes any column.
    */
  /** Fleet-scale twin of [[describe]]: one-unpivot-scan, same counters,
    * but the distinct count is a HyperLogLog ESTIMATE with fixed
    * per-column state — at 100 TB the exact variant's per-value
    * partial aggregation is the profiler's only super-constant term;
    * here the whole register array lives inside ONE aggregate buffer
    * per column (2^p ints, map-side combining — one buffer per
    * column × map partition ever shuffles, no matter the value
    * cardinality). Column named `n_distinct_approx` so readers can't
    * mistake it for exact.
    *
    * The sketch is [[Sketches.hllDistinct]]'s geometry verbatim (same
    * register/rank arithmetic, same exact-integer harmonic sum and
    * linear-counting branch — see its scaladoc for the FP-determinism
    * contract), with the value hash swapped to the splitmix64-finalized
    * Karp–Rabin string hash ([[graft.functions.TextExprs.KrHash64]] —
    * the q30/q74 hash), because the unpivoted values are strings and
    * that hash has an engine-portable restatement
    * ([[graft.OracleGen.krSplitmix64Sql]]) — the q105 gate replays the
    * whole sketch in DuckDB. Standard error ≈ 1.04/√2^p: p=10 → ~3.3 %
    * (the KR hash's 2^30 pre-finalizer range adds a ~n²/2·10⁹
    * collision undercount — negligible below ~10⁷ distincts; raise the
    * KR modulus before profiling beyond that).
    *
    * The other counters (n_rows, n_nulls, min/max) ride the SAME
    * two-level aggregation: per-(column, register) partials first
    * (count/min/max are all register-decomposable), null values in a
    * reserved register −1 excluded from the estimator.
    */
  def describeApprox(df: DataFrame, cols: Seq[String],
      p: Int = 10): DataFrame = {
    require(cols.nonEmpty && cols.distinct == cols, s"bad cols: $cols")
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val alphaC = Sketches.alphaM(m) * m * m * math.pow(2.0, 64 - p + 1)
    // ONE aggregation at column granularity: the register array lives
    // INSIDE the aggregate ([[graft.functions.AggExprs.HllSummary]] —
    // fixed 2^p ints/column, map-side combining, harmonic sum finished
    // exactly in the aggregate's eval), and the row/null/min/max
    // counters ride the same 4-group hash agg. The previous two-level
    // (column, register) SQL composition shuffled ≤ |cols|·2^p rows but
    // paid per-row bin()-string rank math and string min/max buffer
    // updates across 4096 groups — measured 3× this shape at sf1.
    df.select(posexplode(array(cols.map(c => col(c).cast("string")): _*))
        .as(Seq("graft_i", "v")))
      .groupBy("graft_i")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
        min("v").as("min_str"), max("v").as("max_str"),
        graft.functions.AggExprs.hllSummary(
          graft.functions.TextExprs.krHash64(col("v")), p).as("graft_s"))
      .select(element_at(lit(cols.toArray), col("graft_i") + 1)
          .as("column"),
        col("n_rows"), col("n_nulls"), {
          val vEmpty = col("graft_s").getField("v_empty")
          val raw = lit(alphaC) / col("graft_s").getField("tp")
            .cast("double")
          val lc = lit(m.toDouble) * log(lit(m.toDouble) /
            vEmpty.cast("double"))
          val est = when(raw <= lit(2.5 * m) && vEmpty > 0, lc)
            .otherwise(raw)
          round(est).cast("long").as("n_distinct_approx")
        },
        col("min_str"), col("max_str"))
  }

  /** Exact distinct count of an INTEGER-domain column as a bitmap
    * rollup — the [[Quality.UniqueBoundedTail]] trick turned on a
    * single column: group values by `v div 64`, OR each group's tail
    * bits into one long (`bit_or(1 << (v mod 64))`), and Σ popcount is
    * the EXACT distinct count. vs `countDistinct`: the exchange carries
    * one long per OCCUPIED 64-value window instead of one row per
    * distinct value (64× less for dense domains — surrogate keys, the
    * common profiled shape), and the map-side partial is a bit-OR
    * instead of a hash-set insert. Floor division keeps negative
    * domains consistent (`v = 64·floor(v/64) + pmod(v,64)`). NULLs
    * excluded, matching countDistinct. */
  private def bitmapDistinct(df: DataFrame, c: String,
      alias: String): DataFrame = {
    import org.apache.spark.sql.graftshim.{columnExpr, exprColumn}
    import org.apache.spark.sql.catalyst.expressions.ShiftLeft
    val v = col(c).cast("long")
    val bit = exprColumn(ShiftLeft(columnExpr(lit(1L)),
      columnExpr(pmod(v, lit(64L)).cast("int"))))
    df.filter(col(c).isNotNull)
      .groupBy(floor(v / lit(64L)).as("graft_pfx"))
      .agg(bit_or(bit).as("graft_bm"))
      .agg(coalesce(sum(bit_count(col("graft_bm")).cast("long")), lit(0L))
        .as(alias))
  }

  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.distinct == cols, s"bad cols: $cols")
    // No unpivot Generate anywhere (the earlier explode×|cols| shape
    // multiplied the scanned row stream |cols|-fold just to tag rows —
    // at 100 TB that multiplier is the job), and no fused
    // multi-distinct (its Expand is the same multiplier wearing a
    // different hat). One counters aggregate + |cols| independent
    // per-column chains, assembled by broadcast cross-joins of one-row
    // frames; the per-column report rows explode out of the single
    // joined row, and the independent chains' stages run concurrently
    // inside the one assembly action. Column routing is where the r16
    // measurements landed (ProfDebug decomposition, sf1 orders):
    //  - INTEGER columns: [[bitmapDistinct]] rollup (900→220 ms on the
    //    1.5M-unique surrogate key: the exchange carries one long per
    //    occupied 64-value window, the partial is a bit-OR not a
    //    hash-set insert); min/max/nulls ride the counters aggregate,
    //    whose primitive buffers stay in HashAggregate's fast path.
    //  - STRING columns: min/max CANNOT ride the counters aggregate —
    //    a non-primitive buffer type evicts the WHOLE aggregate from
    //    hash aggregation into SortAggregate, sorting every row twice
    //    (measured 700 of the 1,150 ms counters wall). Instead one
    //    dedupe-first chain per string column: groupBy(value) (strings
    //    ARE fast-path GROUPING keys) collapses to the distinct set
    //    map-side, then n_distinct, n_nulls, min and max all fold over
    //    |distinct| rows — the sort the string extrema need now runs
    //    over the value domain, not the row count.
    //  - other types (date/timestamp/double/bool: primitive buffers)
    //    keep counters-riding min/max and a plain countDistinct chain.
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType,
      LongType, StringType}
    val isString = cols.map(c =>
      df.schema(c).dataType == StringType)
    val counterAggs = count(lit(1)).as("graft_nrows") +:
      cols.zipWithIndex.filterNot(ci => isString(ci._2))
        .flatMap { case (c, i) => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"graft_nn_$i"),
          min(col(c)).cast("string").as(s"graft_min_$i"),
          max(col(c)).cast("string").as(s"graft_max_$i")) }
    val counters = df.agg(counterAggs.head, counterAggs.tail: _*)
    val distincts = cols.zipWithIndex.map { case (c, i) =>
      df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          bitmapDistinct(df, c, s"graft_d_$i")
        case StringType =>
          df.groupBy(col(c).as("graft_v"))
            .agg(count(lit(1)).as("graft_cnt"))
            .agg(count(col("graft_v")).as(s"graft_d_$i"),
              coalesce(sum(when(col("graft_v").isNull, col("graft_cnt"))
                .otherwise(0L)), lit(0L)).as(s"graft_nn_$i"),
              min(col("graft_v")).as(s"graft_min_$i"),
              max(col("graft_v")).as(s"graft_max_$i"))
        case _ => df.agg(countDistinct(col(c)).as(s"graft_d_$i"))
      }
    }
    val joined = distincts.foldLeft(counters)((acc, d) =>
      acc.crossJoin(broadcast(d)))
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column"),
        coalesce(col(s"graft_nn_$i"), lit(0L)).as("n_nulls"),
        coalesce(col(s"graft_d_$i"), lit(0L)).as("n_distinct"),
        col(s"graft_min_$i").as("min_str"),
        col(s"graft_max_$i").as("max_str")) }
    joined
      .select(col("graft_nrows"), explode(array(entries: _*)).as("r"))
      .select(col("r.column").as("column"),
        col("graft_nrows").as("n_rows"), col("r.n_nulls"),
        col("r.n_distinct"), col("r.min_str"), col("r.max_str"))
  }
}
