package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, attach the single right row
  * with the LARGEST right timestamp ≤ the left timestamp within the same
  * key (time-series attribution: trade→quote, purchase→last-view). Spark
  * has no native ASOF JOIN (DuckDB/Pandas do); a naive range join
  * (`l.key = r.key AND r.ts <= l.ts` + max) explodes to O(|l|·|r|) pairs
  * per key before aggregating.
  *
  * This is the canonical single-shuffle formulation instead: UNION the two
  * inputs with a side tag, sort each key group once by (ts, side), and
  * carry the right-side payload forward with `last(..., ignoreNulls)` over
  * a running window. Cost = one shuffle on the key + one sort — identical
  * to a regular sort-merge join's shuffle, with NO pair explosion; a hot
  * key streams through the running window in O(1) state per row. Right
  * rows sort BEFORE left rows at equal timestamps (side tag 0 < 1), making
  * the match inclusive (`r.ts <= l.ts`), DuckDB ASOF semantics.
  *
  * Contract: `right` must be unique per (key, ts) — pre-aggregate if not —
  * otherwise "the" as-of row is ill-defined (DuckDB picks arbitrarily; we
  * refuse to be nondeterministic by contract rather than by luck).
  *
  * @param right  (key, ts, payload...) — every non-key, non-ts column is
  *               carried to the output, null when no right row precedes.
  */
object AsOf {

  def joinBackward(left: DataFrame, right: DataFrame,
      key: String, ts: String): DataFrame =
    joinDirectional(left, right, key, ts, backward = true)

  /** Forward as-of: the single right row with the SMALLEST right
    * timestamp ≥ the left timestamp (next-quote / next-event
    * attribution), inclusive at equal timestamps — DuckDB
    * `ASOF LEFT JOIN … ON l.ts <= r.ts` semantics. Same single-shuffle
    * union+tag shape, mirrored: the carry is a `first(…, ignoreNulls)`
    * over [current, unbounded following], and at equal timestamps LEFT
    * rows sort before right rows so the window still sees the tie.
    */
  def joinForward(left: DataFrame, right: DataFrame,
      key: String, ts: String): DataFrame =
    joinDirectional(left, right, key, ts, backward = false)

  private def joinDirectional(left: DataFrame, right: DataFrame,
      key: String, ts: String, backward: Boolean): DataFrame = {
    val payload = right.columns.filter(c => c != key && c != ts).toSeq
    val leftCols = left.columns.toSeq

    // Common layout: key, ts, side, every left col, every right payload
    // col (left rows carry null payload; right rows null left cols).
    // Side ordering makes equal-timestamp matches INCLUSIVE in either
    // direction: backward looks over preceding rows, so right sorts
    // first (0=right); forward looks over following rows, so left sorts
    // first (0=left).
    val (rightTag, leftTag) = if (backward) (0, 1) else (1, 0)
    val taggedRight = right
      .select(Seq(col(key), col(ts), lit(rightTag).as("graft_side")) ++
        leftCols.filter(c => c != key && c != ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col) : _*)
    val taggedLeft = left
      .select(Seq(col(key), col(ts), lit(leftTag).as("graft_side")) ++
        leftCols.filter(c => c != key && c != ts).map(col) ++
        payload.map(c =>
          lit(null).cast(right.schema(c).dataType).as(c)) : _*)

    val ordered = Window.partitionBy(col(key))
      .orderBy(col(ts), col("graft_side"))
    val w =
      if (backward)
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    // ALL carried columns in one select → a single Window operator (one
    // pass per partition), not one Window per payload column.
    val matchedTs = s"${ts}_matched"
    def carry(c: String) = {
      val fromRight = when(col("graft_side") === rightTag, col(c))
      if (backward) last(fromRight, ignoreNulls = true).over(w)
      else first(fromRight, ignoreNulls = true).over(w)
    }
    taggedRight.unionByName(taggedLeft)
      .select(Seq(col("graft_side")) ++ leftCols.map(col) ++
        (carry(ts).as(matchedTs) +: payload.map(c => carry(c).as(c))) : _*)
      .where(col("graft_side") === leftTag)
      .select((leftCols.map(col) :+ col(matchedTs)) ++
        payload.map(col) : _*)
  }

  /** Time-series resample + forward fill — the pandas
    * `resample(freq).ffill()` shape as a relational composition: per
    * key, an aligned timestamp grid from `date_trunc(unit, min ts)` to
    * `date_trunc(unit, max ts)` in `step` increments, each grid point
    * carrying the latest observation at-or-before it (so a key's value
    * holds between observations; grid points before the first
    * observation report null — the ffill contract).
    *
    * Shape: one grouped min/max aggregation (map-side combining) + a
    * per-key `sequence` explode generates the grid WITHOUT a cross join
    * against any calendar table; the fill itself is [[joinBackward]]'s
    * single-shuffle union+window formulation. Grid width is bounded per
    * key by its own observed span — a key active for a day costs 24
    * hourly rows regardless of corpus size.
    *
    * Contract: `obs` unique per (key, ts) — pre-aggregate if not (the
    * [[joinBackward]] contract, inherited).
    */
  def resampleFfill(obs: DataFrame, key: String, ts: String,
      unit: String = "hour",
      step: String = "INTERVAL 1 HOUR"): DataFrame = {
    val grid = obs.groupBy(col(key))
      .agg(date_trunc(unit, min(col(ts))).as("graft_lo"),
        date_trunc(unit, max(col(ts))).as("graft_hi"))
      .select(col(key),
        explode(sequence(col("graft_lo"), col("graft_hi"), expr(step)))
          .as(ts))
    joinBackward(grid, obs, key, ts)
  }
}
