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

  /** [[Unique]] specialized for the classic composite-key shape where
    * the LAST component is a small bounded non-negative integer — line
    * numbers, sequence-within-parent, array ordinals (TPC-H lineitem's
    * (orderkey, linenumber) is the canonical case). Instead of hashing
    * every ROW tuple, the check rolls the tail up into a per-prefix
    * BITMAP (`bit_or(1 << tail)`) with a row count: distinct
    * (prefix, tail) pairs = Σ popcount(bitmap), EXACT, no
    * hash-collision caveat at all. The rollup aggregates
    * repartition-then-complete (prefixes are ~unique, so a partial
    * phase would build per-task maps that reduce almost nothing — the
    * same call [[graft.operators.Temporal.applyChangelog]] exposes as
    * skipPartialAgg; a corpus with HOT prefixes wants the partial
    * phase back, per-key state is one long either way). The rollup is
    * also the natural probe frame for a
    * [[RefIntegrity]] on the same prefix column — [[audit]] reuses it,
    * shrinking that anti join's probe side from rows to prefixes.
    * Tail values outside [0, bits) fail LOUDLY (a silent shift wrap
    * would corrupt the count); a NULL tail contributes nothing to the
    * bitmap and therefore counts as a violation (stricter than
    * [[Unique]]'s hashed tuple — the non-null-keys contract stands).
    * `bits` ≤ 64 (one long).
    */
  case class UniqueBoundedTail(prefixCols: Seq[String], tailCol: String,
      bits: Int = 64) extends Check {
    require(prefixCols.nonEmpty, "need at least one prefix column")
    require(bits >= 1 && bits <= 64, s"bits must be in [1,64], got $bits")
    def name = s"unique_${(prefixCols :+ tailCol).mkString("_")}"
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
    * Every per-table counter — the row count, all row-local violation
    * counters, and each uniqueness check's `count(DISTINCT key)` —
    * fuses into ONE aggregation over ONE scan of the table: Spark plans
    * mixed distinct + regular aggregates with an Expand (one projection
    * per distinct group, each carrying only its own key columns), so u
    * uniques multiply the post-scan row stream (u+1)× but never re-read
    * the table, and every branch partial-aggregates map-side. The
    * resulting ONE-row frame feeds a SINGLE report branch (one explode
    * emits every fused check's row), so column pruning cannot
    * specialize per-consumer copies of the subtree and re-scan the
    * table. Referential integrity is the only check class with its own
    * (column-pruned) scan: a LEFT ANTI join per RI check against the
    * referenced key set, plus one shared count-only aggregate for
    * n_rows (a bare count over parquet reads row-group metadata, not
    * data). Net cost: one fused scan + one pruned anti join per RI —
    * never an extra full-table data pass to restate n_rows or count a
    * key's distincts.
    *
    * Uniqueness runs in its OWN branch, not fused: each unique check
    * counts `select(xxhash64(struct(key...))).repartition(hash)
    * .distinct()`. Three measured-at-sf1 reasons (each variant
    * min-of-reps, isolated JVM):
    *   - fusing `countDistinct` with the row-local sums plans an Expand
    *     (2× the row stream) feeding one aggregate — 5.0 s;
    *   - a lone `countDistinct`/`distinct()` still plans a PARTIAL
    *     aggregate whose per-task hash maps dedup nothing when the key
    *     is ~unique (6M entries built, 6M emitted) — 4.2 s;
    *   - `repartition(hash)` first makes the exchange a plain 8-byte
    *     shuffle write (no map build) and the post-shuffle distinct the
    *     ONLY hash table — 1.9 s, and the hash keeps the shuffle at
    *     8 B/row for any key width.
    * The struct is never null, so part-null key tuples count as
    * distinct values, exactly as a `select(keys).distinct().count()`
    * pass would (the [[Unique]] contract still says pair it with
    * [[NotNull]]). The count is exact up to 64-bit hash collisions: for
    * n distinct keys the probability ANY collision exists is ≤ n²/2⁶⁵
    * (~10⁻⁶ at n = 10⁷, ~10⁻² at n = 10⁹); a collision UNDERCOUNTS
    * distincts by its multiplicity, i.e. overstates violations by the
    * same — acceptable for a data-quality screen, and the bound is the
    * documented contract.
    *
    * Referential-integrity: a plain left-anti join of the probe keys
    * against the ref keys — the ref side deliberately NOT deduplicated
    * (anti-join semantics are existence checks; a `.distinct()` on the
    * build side planned its own useless partial aggregate, +0.9 s at
    * sf1) and the probe side deliberately NOT pre-aggregated (measured:
    * the (key, count) pre-agg wins only when the FK duplication factor
    * is large; at lineitem→orders' 4:1 it LOST 1.5 s to its own hash
    * maps — the anti join shuffles 8-byte keys either way, and violation
    * rows count directly). A bloom pre-filter was considered and
    * rejected: a bloom prunes only DEFINITE-ABSENT keys, which for an
    * FK-mostly-holds table are precisely the rare violations — it would
    * pass ~every probe row and pay its own broadcast for nothing.
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      "duplicate check names — two checks of one class on the same " +
        "column collide in the fused aggregate: " +
        checks.groupBy(_.name).filter(_._2.size > 1).keys.mkString(", "))
    val rowLocal = checks.filter {
      case _: Unique | _: UniqueBoundedTail | _: RefIntegrity => false
      case _ => true
    }
    val uniques = checks.collect { case u: Unique => u }
    val boundedUniques = checks.collect { case u: UniqueBoundedTail => u }
    val riChecks = checks.collect { case c: RefIntegrity => c }
    // ONE aggregation pass for every row-local counter + the row count;
    // over an empty table the sums come back null — coalesce to 0 so the
    // report still reads "0 violations over 0 rows, pass"
    val fusedAggs =
      rowLocal.map(c => sum(when(violation(c), 1L).otherwise(0L))
        .as(c.name)) :+
      count(lit(1)).as("graft_n")
    val fused = df.agg(fusedAggs.head, fusedAggs.tail: _*)
    // n_rows for the unique/RI branches: its own count-only aggregate,
    // NOT a projection of `fused` — column pruning would specialize a
    // pruned copy of the fused subtree per consumer (breaking exchange
    // reuse and re-scanning the table), whereas a bare count over a
    // parquet scan reads row-group metadata only
    val nRowsDf = df.agg(count(lit(1)).as("graft_total"))
    // ONE report branch for every fused counter: all rows explode out of
    // the same one-row aggregate, so the fused subtree has exactly one
    // consumer and cannot be pruned apart
    val fusedEntries =
      rowLocal.map(c => struct(lit(c.name).as("check"),
        coalesce(col(c.name).cast("long"), lit(0L))
          .as("n_violations")))
    val fusedReport = if (fusedEntries.isEmpty) Nil else {
      Seq(fused
        .select(explode(array(fusedEntries: _*)).as("r"), col("graft_n"))
        .select(col("r.check"), col("r.n_violations"),
          col("graft_n").as("n_rows")))
    }
    // bounded-tail uniques: one bitmap rollup per check (see
    // [[UniqueBoundedTail]]); the rollup persists (tracked) only when a
    // RefIntegrity on the same prefix column reuses it as its probe
    val rollups: Map[String, DataFrame] = boundedUniques.map { u =>
      val tail = col(u.tailCol).cast("long")
      val guarded = when(tail.isNotNull &&
          (tail < 0 || tail >= u.bits),
        raise_error(concat(
          lit(s"${u.name}: tail value out of [0,${u.bits}): "), tail)))
        .otherwise(tail)
      val bitExpr = shiftLeftCol(lit(1L), guarded.cast("int"))
      // NOT persisted even when an RI reuses it: a persist would force
      // the RI stage to WAIT for the rollup's materialization (a
      // serial critical path — measured +0.7 s on the q88 gate), while
      // the two consumers' plans share an identical Exchange subtree
      // that ReuseExchange dedups anyway; only the cheap final
      // aggregates run twice, in parallel stages
      u.name -> df
        .select((u.prefixCols.map(col) :+ bitExpr.as("graft_bit")): _*)
        // repartition-then-complete-aggregate (the ~unique-key lesson
        // from the Unique branch below): the partial phase would build
        // |keys|-sized per-task maps that reduce almost nothing
        .repartition(u.prefixCols.map(col): _*)
        .groupBy(u.prefixCols.map(col): _*)
        .agg(bit_or(col("graft_bit")).as("graft_bits"),
          count(lit(1)).as("graft_cnt"))
    }.toMap
    val boundedReports = boundedUniques.map { u =>
      // distinct (prefix, tail) pairs = Σ popcount; an all-null-tail
      // prefix contributes a null bitmap, which bit_count nulls and sum
      // skips — those rows read as violations, per the scaladoc
      val d = rollups(u.name)
        .agg(coalesce(sum(expr("bit_count(graft_bits)")), lit(0L))
          .as("graft_d"))
      d.crossJoin(broadcast(nRowsDf))
        .select(lit(u.name).as("check"),
          (col("graft_total") - col("graft_d")).as("n_violations"),
          col("graft_total").as("n_rows"))
    }
    // per-unique dedicated branch (see scaladoc: repartition-then-
    // distinct beats both the Expand fusion and a lone countDistinct's
    // useless partial aggregate on ~unique keys)
    val uniqueReports = uniques.map { u =>
      val d = df
        .select(xxhash64(struct(u.cols.map(col): _*)).as("graft_h"))
        .repartition(col("graft_h"))
        .distinct()
        .agg(count(lit(1)).as("graft_d"))
      d.crossJoin(broadcast(nRowsDf))
        .select(lit(u.name).as("check"),
          (col("graft_total") - col("graft_d")).as("n_violations"),
          col("graft_total").as("n_rows"))
    }
    val riReports = riChecks.map { c =>
      val col1 = c.col
      // when a bounded-tail unique already rolled the table up by this
      // column, its (prefix, count) frame IS the ideal probe: the anti
      // join ships |distinct keys| rows instead of |rows|, and the
      // violation count comes back as Σ graft_cnt over orphan keys —
      // identical to counting the orphan rows directly
      val rolled = boundedUniques.find(u => u.prefixCols == Seq(col1))
        .map(u => rollups(u.name))
      val orphans = rolled match {
        case Some(r) =>
          r.filter(col(col1).isNotNull)
            .join(c.ref.select(col(c.refCol).as(col1)), Seq(col1),
              "left_anti")
            .agg(coalesce(sum(col("graft_cnt")), lit(0L))
              .as("n_violations"))
        case None =>
          // plain anti join, no ref dedup, no probe pre-agg (scaladoc)
          df.select(col(col1)).filter(col(col1).isNotNull)
            .join(c.ref.select(col(c.refCol).as(col1)), Seq(col1),
              "left_anti")
            .agg(count(lit(1)).as("n_violations"))
      }
      orphans.crossJoin(broadcast(nRowsDf))
        .select(lit(c.name).as("check"), col("n_violations"),
          col("graft_total").as("n_rows"))
    }
    (fusedReport ++ uniqueReports ++ boundedReports ++ riReports)
      .reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("check")
  }

  // variable-amount shift: the Scala shiftleft() wrapper pins the shift
  // to an Int literal; the Catalyst node takes any expression
  private def shiftLeftCol(v: Column, n: Column): Column = {
    import org.apache.spark.sql.graftshim.{columnExpr, exprColumn}
    exprColumn(org.apache.spark.sql.catalyst.expressions.ShiftLeft(
      columnExpr(v), columnExpr(n)))
  }
}
