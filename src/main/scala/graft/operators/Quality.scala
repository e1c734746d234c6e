package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the constraint-suite pattern of
  * dbt tests / AWS Deequ: a table plus a list of checks produces a
  * violations report (one row per check), the gate artifact every
  * large-scale ingestion pipeline runs before publishing a dataset.
  *
  * Scale shape, by check class:
  *   - ROW-LOCAL checks (not-null, range, accepted-values, custom
  *     predicate) all fuse into ONE aggregation pass over the table —
  *     a single scan with map-side partial aggregation, no matter how
  *     many checks; adding a check costs one counter, not one job.
  *   - UNIQUENESS runs a distinct count over the key columns (one
  *     hash-partitioned aggregate; map-side combine absorbs hot keys).
  *   - REFERENTIAL INTEGRITY is a LEFT ANTI join against the referenced
  *     key set — broadcast when the dimension is small, shuffle
  *     otherwise; Catalyst decides (the key set is projected to one
  *     column and made distinct before the join, so the build side is
  *     minimal either way).
  *
  * Violations are COUNTED, not materialized — the report is one row per
  * check: (check, n_violations, n_rows, pass). Callers wanting the
  * offending rows re-run the one failing predicate as a filter; the
  * audit itself stays O(checks) small.
  */
object Quality {

  sealed trait Check { def name: String }

  /** Column must be non-null (and, for strings, non-blank when
    * `blankIsNull`). */
  case class NotNull(col: String, blankIsNull: Boolean = false)
      extends Check {
    def name = s"not_null_$col"
  }

  /** Column must fall in [lo, hi] (inclusive); nulls violate. */
  case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"range_$col"
  }

  /** Column must be one of `values`; nulls violate. */
  case class AcceptedValues(col: String, values: Seq[String])
      extends Check {
    def name = s"accepted_$col"
  }

  /** Arbitrary row predicate that must hold. */
  case class Satisfies(label: String, predicate: Column) extends Check {
    def name = s"satisfies_$label"
  }

  /** `cols` must be a unique key. Contract: key columns non-null (pair
    * a [[NotNull]] with it) — engines disagree on whether part-null
    * tuples compare distinct, so the uniqueness count is only defined
    * over non-null keys.
    */
  case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique_${cols.mkString("_")}"
  }

  /** Every non-null `col` value must exist in `refCol` of `ref`
    * (foreign-key integrity; orphan rows violate). */
  case class RefIntegrity(col: String, ref: DataFrame, refCol: String)
      extends Check {
    def name = s"ref_${col}"
  }

  private def violation(c: Check): Column = c match {
    case NotNull(col1, blank) =>
      if (blank) col(col1).isNull || trim(col(col1).cast("string")) === ""
      else col(col1).isNull
    // null-in = violation: the raw predicate is null for null inputs and
    // `when(null, 1)` would silently count it as a PASS — coalesce the
    // inner condition to false before negating
    case InRange(col1, lo, hi) =>
      not(coalesce(
        col(col1).cast("double") >= lo && col(col1).cast("double") <= hi,
        lit(false)))
    case AcceptedValues(col1, vs) =>
      not(coalesce(col(col1).isin(vs: _*), lit(false)))
    case Satisfies(_, p) => !coalesce(p, lit(false))
    case _ => throw new IllegalArgumentException(s"not row-local: $c")
  }

  /** Run `checks` against `df`: one report row per check, ordered by
    * check name — (check, n_violations, n_rows, pass).
    *
    * The table row count is computed by ONE shared subtree
    * (`df.agg(count)`), cross-joined as a broadcast scalar into every
    * report branch that needs it. All branches broadcast the SAME
    * canonical plan, so Spark's exchange-reuse rule
    * (ReuseExchangeAndSubquery) evaluates the count once per audit —
    * a suite with u uniques and r RI checks costs one fused row-local
    * scan + one key-pruned distinct per unique + one anti join per RI,
    * never an extra full-table scan just to restate n_rows.
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      "duplicate check names — two checks of one class on the same " +
        "column collide in the fused aggregate: " +
        checks.groupBy(_.name).filter(_._2.size > 1).keys.mkString(", "))
    val rowLocal = checks.filter {
      case _: Unique | _: RefIntegrity => false
      case _ => true
    }
    // the one canonical row-count subtree every branch broadcasts
    val nRowsDf = df.agg(count(lit(1)).as("graft_total"))
    // all row-local counters + the row count in ONE aggregation pass;
    // over an empty table the sums come back null — coalesce to 0 so
    // the report still reads "0 violations over 0 rows, pass"
    val rowLocalReport = if (rowLocal.isEmpty) Nil else {
      val aggCols = rowLocal.map(c =>
        sum(when(violation(c), 1L).otherwise(0L)).as(c.name)) :+
        count(lit(1)).as("graft_n")
      Seq(df.agg(aggCols.head, aggCols.tail: _*)
        .select(
          explode(array(rowLocal.map(c =>
            struct(lit(c.name).as("check"),
              coalesce(col(c.name).cast("long"), lit(0L))
                .as("n_violations"))): _*)).as("r"),
          col("graft_n"))
        .select(col("r.check"), col("r.n_violations"),
          col("graft_n").as("n_rows")))
    }
    val setReports = checks.collect {
      case c @ Unique(cols1) =>
        // distinct over the key columns only — the scan prunes to the
        // key, and n_rows rides in on the shared broadcast scalar
        df.select(cols1.map(col): _*).distinct()
          .agg(count(lit(1)).as("graft_d"))
          .crossJoin(broadcast(nRowsDf))
          .select(lit(c.name).as("check"),
            (col("graft_total") - col("graft_d")).as("n_violations"),
            col("graft_total").as("n_rows"))
      case c @ RefIntegrity(col1, ref, refCol) =>
        val orphans = df.select(col(col1)).filter(col(col1).isNotNull)
          .join(ref.select(col(refCol).as(col1)).distinct(),
            Seq(col1), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
        orphans.crossJoin(broadcast(nRowsDf))
          .select(lit(c.name).as("check"), col("n_violations"),
            col("graft_total").as("n_rows"))
    }
    (rowLocalReport ++ setReports).reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("check")
  }
}
