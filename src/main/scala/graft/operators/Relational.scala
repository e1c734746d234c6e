package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Core relational operator library over the TPC-H-ish testdata.
  *
  * Each method is one `queries()` entry in [[graft.SparkEntry]], exercising a
  * row of SURVEY.md §2's operator inventory. Design rules applied throughout:
  *
  *   - declarative DataFrame plans only — Catalyst chooses the join strategy,
  *     pushes predicates into the parquet scan, prunes columns;
  *   - small dimension tables are explicitly `broadcast()` so the 100TB plan
  *     never shuffles a fact table against a KB-sized dim;
  *   - every double aggregate is `round(_, 2)` so results hash-compare stably
  *     against the DuckDB oracle (float summation order differs per engine);
  *   - every output carries a deterministic ORDER BY on a unique key.
  */
object Relational {

  private def disc(priceCol: Column, discountCol: Column): Column =
    priceCol * (lit(1.0) - discountCol)

  /** Exact integer cents of a NON-NEGATIVE money double as
    * `floor(x·100 + 0.5)` — value-identical to `round(x·100)` on the
    * cents grid (TPC-H money is generated in cents, so x·100 sits
    * ≥1e-10 from every .5 boundary; a full-table equality sweep at sf1
    * found zero disagreement rows), but ~1.8× cheaper per row: Spark's
    * `Round` on DoubleType routes through BigDecimal
    * (`Round.doCodeGen` → `BigDecimal.valueOf(v).setScale(0,
    * HALF_UP)`) — two allocations per row — while floor is one fused
    * double op inside whole-stage codegen. Measured on the q61 shape:
    * the join+agg dropped 3.1→1.75 s at sf1 from this substitution
    * alone. NEGATIVE values would change semantics (HALF_UP rounds
    * −2.5 → −3, floor(−2.5+0.5) → −2) — money columns here are
    * non-negative by generation. */
  private def centsOf(c: Column): Column =
    floor(c * lit(100) + lit(0.5)).cast("long")

  /** TPC-H Q1-style pricing summary: full-scan partial-agg → 6-group final
    * agg. SURVEY §2.5 A1/A3/A6. Map-side combine makes this shuffle ~bytes.
    */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(disc(col("l_extendedprice"), col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Filter + projection; predicates and the 4-column ReadSchema both push
    * into the parquet scan (verify via explain: PushedFilters). SURVEY §2.2.
    */
  def q2FilterProject(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
             col("l_shipdate") <  lit("1997-03-01").cast("timestamp") &&
             col("l_quantity") < 3)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
              round(col("l_extendedprice"), 2).as("price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Star join through two broadcast dims (region→nation→customer).
    * SURVEY §2.4 J1/J3: dim lookups compile to broadcast hash joins — at
    * 100TB the fact side never moves.
    */
  def q3BroadcastJoin(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
            col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)),
            col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
           round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
      .orderBy(col("r_name"))

  /** Fact-to-fact equi-join (orders ⋈ lineitem) + aggregation: the one join
    * here that legitimately shuffles both sides on the key. AQE handles
    * skew/coalesce at scale. SURVEY §2.4.
    */
  def q4ShuffleJoinAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(disc(col("l_extendedprice"), col("l_discount"))), 2).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))

  /** Left-semi join: customers that placed at least one big order. */
  def q5SemiJoin(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir).where(col("o_totalprice") > 400000),
            col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Left-anti join: customers with no orders at all. */
  def q6AntiJoin(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir).where(col("o_totalprice") > 500000),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Running total per customer over order date (SURVEY §2.6 W1 — the
    * reference's cumulative-sum curve). Window partitioned by customer →
    * single shuffle, parallel across customers.
    */
  def q7WindowCumsum(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, sfDir)
      .where(col("o_custkey") < 50)
      .select(col("o_custkey"), col("o_orderkey"),
              round(sum(col("o_totalprice")).over(w), 2).as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Top-2 orders per customer via row_number window (SURVEY §2.7 top-k;
    * also the keep-first dedup device of §2.8 U2).
    */
  def q8WindowTopkPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2 && col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
              round(col("o_totalprice"), 2).as("totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** groupBy + pivot with explicit value list (SURVEY §2.5 A2). Explicit
    * values avoid the extra distinct-values job the implicit form runs.
    */
  def q9Pivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2))
      .na.fill(0.0, Seq("F", "O", "P"))
      .orderBy(col("o_orderpriority"))

  /** Rollup over region→nation with grand totals (SURVEY §2.5 A7: the
    * reference's Overall-Sum rows, done the Catalyst-native way).
    */
  def q10Rollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
           round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
      .select(coalesce(col("r_name"), lit("(all)")).as("region"),
              coalesce(col("n_name"), lit("(all)")).as("nation"),
              col("n_customers"), col("sum_acctbal"))
      .orderBy(col("region"), col("nation"))

  /** Exact distinct aggregation (expand + two-phase agg under the hood). */
  def q11DistinctAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
           countDistinct(col("o_orderpriority")).as("n_priorities"),
           count(lit(1)).as("n_orders"))

  /** Global top-k: ORDER BY + LIMIT compiles to TakeOrderedAndProject — no
    * global sort materialization, each partition ships only its local top-k.
    */
  def q12TopK(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"),
              round(col("o_totalprice"), 2).as("totalprice"))
      .limit(10)

  /** Union-all + deterministic keep-first dedup (SURVEY §2.8 U1/U2): rows
    * from the first branch win, encoded with an explicit source priority +
    * row_number — never bare dropDuplicates, which is nondeterministic.
    */
  def q13UnionDedupKeepFirst(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val store = orders.where(col("o_orderstatus") === "F").withColumn("src", lit(0))
    val batch = orders.where(col("o_totalprice") > 300000).withColumn("src", lit(1))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("src"), col("o_orderkey"))
    store.unionByName(batch)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("src"))
      .orderBy(col("o_custkey"))
  }

  /** String predicate battery (SURVEY §2.2 P7-P10): case-insensitive literal
    * contains, prefix match, case-insensitive regex alternation — all
    * null-safe by construction (testdata has no nulls; coalesce kept for
    * shape parity with the reference semantics).
    */
  def q14StringPredicates(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .where(lower(coalesce(col("p_name"), lit(""))).contains("red") &&
             !col("p_type").startsWith("SMALL") &&
             coalesce(col("p_name"), lit("")).rlike("(?i)(RED|BLUE) (widget|bolt|ring)"))
      .select(col("p_partkey"), col("p_name"), col("p_type"))
      .orderBy(col("p_partkey"))

  /** Regex capture-group extraction (SURVEY §2.9 F9) + numeric cast + agg. */
  def q15RegexExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
              regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Conditional column derivation (SURVEY §2.2 P12 — the amount_type
    * pattern) + grouped agg over the derived column.
    */
  def q16ConditionalCase(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("value_band",
        when(col("value") > 150, "high")
          .when(col("value") > 50, "mid")
          .otherwise("low"))
      .groupBy(col("event_type"), col("value_band"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("event_type"), col("value_band"))

  /** Last-writer-wins rule cascade (SURVEY §2.3) compiled the Spark-first
    * way: iterate rules in REVERSE order so the first matching `when` branch
    * is the reference's last writer. Overlapping patterns included on
    * purpose — they pin the precedence semantics.
    */
  def q17RuleCascade(spark: SparkSession, sfDir: String): DataFrame = {
    // (pattern, category) in reference textual order; later entries override.
    // "red widget" matches both rule 1 and rule 3 → must land in cat_widget.
    val rules = Seq(
      "red"    -> "cat_red",
      "blue"   -> "cat_blue",
      "widget" -> "cat_widget",
      "bolt"   -> "cat_bolt",
      "small"  -> "cat_small")
    val subject = lower(coalesce(col("p_name"), lit("")))
    // foldLeft in textual order: each later rule WRAPS the earlier chain, so
    // it is tested first at eval time — exactly last-writer-wins.
    val cat = rules.foldLeft(lit(null).cast("string")) {
      case (rest, (pat, c)) => when(subject.contains(pat), c).otherwise(rest)
    }
    Tables.part(spark, sfDir)
      .withColumn("category", cat)
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("category"), lit("uncategorized")).as("category"), col("n"))
      .orderBy(col("category"))
  }

  /** Natural-key sha-256 fingerprint (SURVEY §2.9 F13): explicit per-field
    * coalesce BEFORE concat_ws (concat_ws silently skips nulls — the
    * reference inserts ""). Codegen'd builtin, no UDF.
    */
  def q18FingerprintSha2(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .where(col("o_orderkey") < 100)
      .select(col("o_orderkey"),
        sha2(concat_ws("|",
          coalesce(col("o_orderkey").cast("string"), lit("")),
          coalesce(col("o_orderstatus"), lit("")),
          coalesce(date_format(col("o_orderdate"), "yyyy-MM-dd"), lit("")),
          coalesce(col("o_orderpriority"), lit(""))), 256).as("fingerprint"))
      .orderBy(col("o_orderkey"))

  /** JSON field extraction from the events.props payload (§2.9 note).
    *
    * History of this gate is the history of the parse cost: with Spark's
    * `get_json_object` (a Jackson streaming parser built per row) the
    * parse dominated the under-split scan so badly that rounds 5-15
    * carried a scan-shape-aware repartition to spread it across cores.
    * The r16 native expression ([[graft.functions.TextExprs
    * .JsonScalarField]] — one byte-scan of the flat object, whole-stage
    * codegen) removed the cost instead of spreading it: measured sf1
    * isolated, scan+agg floor 0.30 s, native parse 0.31 s (parse is
    * FREE at measurement noise; Jackson was 2.1 s unspread), while the
    * old repartition spread cost 0.70 s of pure exchange. So the
    * repartition is GONE — the plan is scan → project → partial agg →
    * 5-group final agg, shuffling only (event_type, k) pairs, which is
    * also exactly the fleet-scale shape.
    */
  def q19Json(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir).select("event_type", "props")
      .select(col("event_type"),
              graft.functions.TextExprs.jsonScalarField(col("props"), "$.k")
                .cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(round(avg(col("k")), 4).as("avg_k"), max(col("k")).as("max_k"))
      // global order on a |event_type|-row result: coalesce(1) + local
      // sort — a bare orderBy is a RangePartitioning exchange whose
      // sampling pass is a whole extra JOB, the single largest slice of
      // this query's local floor (and pure waste for a handful of rows)
      .coalesce(1).sortWithinPartitions(col("event_type"))
  }

  /** Tumbling 1-hour event-time window aggregation — written with the same
    * `window()` construct Structured Streaming uses, so the identical plan
    * runs under readStream + watermark (SURVEY §2.10).
    */
  def q20TumblingWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))
      .where(col("window_start") < lit("2024-01-03").cast("timestamp"))
      .orderBy(col("window_start"), col("event_type"))

  /** q80: higher-order array-function battery over the embedding vectors
    * — aggregate (left fold: L2 norm², L1 norm), filter+size (positive
    * component count), exists (threshold test), zip_with (self-reversed
    * elementwise product, folded). Everything stays inside whole-stage
    * codegen (no UDFs); folds are LEFT folds on both engines
    * (`aggregate` ↔ DuckDB `list_reduce` over the same element order), so
    * the doubles agree bit-for-bit before the cosmetic rounding.
    */
  def q80ArrayHof(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"),
        round(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x), 6)
          .as("l2_sq"),
        round(aggregate(col("v"), lit(0.0), (acc, x) => acc + abs(x)), 6)
          .as("l1"),
        size(filter(col("v"), x => x > 0)).as("n_pos"),
        exists(col("v"), x => abs(x) > lit(0.2)).cast("int").as("has_big"),
        round(aggregate(zip_with(col("v"), reverse(col("v")),
          (a, b) => a * b), lit(0.0), (acc, x) => acc + x), 6)
          .as("palindrome_dot"))
      .orderBy("vec_id")

  /** q79: tumbling-window exact distinct users
    * ([[graft.streaming.EventStreams.windowedDistinctUsers]]) — the
    * chained-stateful dedup→count decomposition that runs identically in
    * batch (gated here vs DuckDB COUNT(DISTINCT)) and under readStream
    * (EventStreamsSpec proves streamed-equals-batch with cross-micro-
    * batch dedup state).
    */
  def q79WindowedDistinct(spark: SparkSession, sfDir: String): DataFrame =
    graft.streaming.EventStreams.windowedDistinctUsers(
        Tables.events(spark, sfDir), "1 hour")
      .orderBy("window_start")

  /** q83: tumbling-window APPROXIMATE distinct users
    * ([[graft.streaming.EventStreams.windowedHllDistinct]], p=10) — the
    * sketch counterpart of q79, gated through the SAME
    * flatMapGroupsWithState function that runs under readStream
    * (EventStreamsSpec proves streamed == batch == the q71 Column
    * estimator). Exact per-window distinct counts ride along so the
    * estimate's error is visible in the gated result (the q71
    * convention); the oracle replays the whole per-window sketch in
    * DuckDB. window_start round-trips LTZ→NTZ for the typed boundary —
    * identity under the pinned UTC session.
    */
  def q83WindowedHll(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val est = graft.streaming.EventStreams
      .windowedHllDistinct(ev, "1 hour").toDF()
      .select(col("window_start").cast("timestamp_ntz").as("window_start"),
        col("v_empty"), col("hll_est"))
    val exact = ev
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count_distinct(col("user_id")).as("n_exact"))
      .select(col("window.start").as("window_start"), col("n_exact"))
    est.join(exact, "window_start")
      .select(col("window_start"), col("n_exact"), col("v_empty"),
        col("hll_est"))
      .orderBy("window_start")
  }

  /** The q90 probe taxonomy — the events table's full event-type set,
    * fixed up front (the telemetry shape the streaming CMS is for). */
  val FunnelEventTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  /** q90: tumbling-window count-min frequency estimates
    * ([[graft.streaming.EventStreams.windowedCmsFrequencies]], d=4,
    * logW=10) — the streaming-CMS cell of the sketch matrix (q74 batch
    * CMS, q83 streaming HLL), gated through the SAME
    * flatMapGroupsWithState function that runs under readStream
    * (EventStreamsSpec proves streamed == batch with cross-micro-batch
    * cell merges + eviction). Exact per-(window, type) counts ride along
    * (0 where the type never fired) so the sketch's one-sided error is
    * visible in the gated result; the oracle replays hash, cells and
    * estimates per window in DuckDB.
    */
  def q90WindowedCms(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val est = graft.streaming.EventStreams
      .windowedCmsFrequencies(ev, "1 hour", FunnelEventTypes).toDF()
      .select(col("window_start").cast("timestamp_ntz").as("window_start"),
        col("probe"), col("cms_est"))
    val exact = ev
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_exact"))
      .select(col("window.start").as("window_start"),
        col("event_type").as("probe"), col("n_exact"))
    // persist-before-sort: both join legs aggregate the full event
    // stream (the CMS state replay + the exact groupBy); the joined
    // summary is |windows|·|probes| rows, and the sort's range-sampling
    // job must not re-run the two aggregation legs to sample it
    est.join(exact, Seq("window_start", "probe"), "left")
      .select(col("window_start"), col("probe"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"), col("cms_est"))
      .transform(graft.CacheHandles.persistTracked)
      .orderBy("window_start", "probe")
  }

  /** Date-part functions battery (SURVEY §2.9 F3-F5). */
  def q21DateFunctions(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(year(col("o_orderdate")).as("y"),
              month(col("o_orderdate")).as("m"),
              round(col("o_totalprice"), 2).as("price"))
      .groupBy(col("y"), col("m"))
      .agg(count(lit(1)).as("n"), round(sum(col("price")), 2).as("sum_price"))
      .orderBy(col("y"), col("m"))

  /** Scalar min/max + null-coalesced max (SURVEY §2.5 A4/A5). */
  def q22MinMax(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .agg(min(col("o_orderdate")).as("min_date"),
           max(col("o_orderdate")).as("max_date"),
           coalesce(max(when(col("o_totalprice") < 0, col("o_orderkey"))), lit(0L)).as("max_neg_key"))

  /** Banker's-rounded integer-cents conversion (SURVEY §1.4): money as
    * exact LongType cents via bround, never floats, at any scale.
    */
  def q23CentsBround(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .where(col("o_orderkey") < 1000)
      .select(col("o_orderkey"),
              bround(col("o_totalprice") * 100, 0).cast("long").as("price_cents"))
      .orderBy(col("o_orderkey"))

  /** German-locale number normalization ("1.234,56" → 1234.56d), the
    * reference's ingest parse (SURVEY §2.9 F1/F2) as pure builtins.
    */
  def q24GermanNumberParse(spark: SparkSession, sfDir: String): DataFrame = {
    // Render a German-decimal string ("473274,17") then parse it back with
    // the reference's normalization — strip '.'-thousands, ','→'.' — so the
    // round-trip must equal round(x, 2). Pure codegen'd builtins, no UDF.
    val germanized = translate(bround(col("o_totalprice"), 2).cast("string"), ".", ",")
    Tables.orders(spark, sfDir)
      .where(col("o_orderkey") < 1000)
      .select(col("o_orderkey"),
        regexp_replace(regexp_replace(germanized, "\\.", ""), ",", ".")
          .cast("double").as("parsed"))
      .orderBy(col("o_orderkey"))
  }

  /** Set operators (SURVEY §2.7): customers ordering in BOTH 1994 and 1995
    * but NOT in 1996 — `intersect`/`except` (SQL INTERSECT/EXCEPT DISTINCT
    * semantics). Each compiles to a hash-distinct left-semi/anti join on
    * the shuffle key, map-side partial-distinct first — no row explosion
    * at scale, and AQE can broadcast the (smaller) distinct year-sets.
    */
  def q42SetOps(spark: SparkSession, sfDir: String): DataFrame = {
    def custsIn(yr: Int): DataFrame =
      Tables.orders(spark, sfDir)
        .where(year(col("o_orderdate")) === yr)
        .select(col("o_custkey"))
    custsIn(1994).intersect(custsIn(1995)).except(custsIn(1996))
      .orderBy(col("o_custkey"))
  }

  /** q57: backward as-of join ([[AsOf.joinBackward]]) — each purchase
    * attributed to the user's most recent view at or before the purchase
    * timestamp (last-touch attribution), NULL when no view precedes.
    * Views are pre-aggregated to one row per (user_id, ts) — the
    * operator's uniqueness contract — with `max(value)`. The oracle is
    * DuckDB's NATIVE `ASOF LEFT JOIN`, a fully independent implementation
    * of the same semantics (inclusive backward match), so the union+tag+
    * running-last formulation is verified against a real as-of engine,
    * not a restatement of itself.
    */
  def q57AsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value"), 2).as("purchase_value"))
    val views = ev.where(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(round(max(col("value")), 2).as("view_value"))
    AsOf.joinBackward(purchases, views, key = "user_id", ts = "ts")
      .orderBy("event_id")
  }

  /** q86: STREAMING backward as-of join gated through its batch
    * execution ([[graft.streaming.EventStreams.asofBackwardStream]]) —
    * the q57 purchases→views attribution through the stateful streaming
    * operator instead of the union+window batch formulation. The oracle
    * is DuckDB's native ASOF LEFT JOIN (the q57 oracle verbatim): batch
    * execution of the streaming function must land on identical
    * semantics, and EventStreamsSpec proves the streamed run equals the
    * batch operator across micro-batches.
    */
  def q86StreamingAsof(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value"), 2).as("purchase_value"))
    val views = ev.where(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(round(max(col("value")), 2).as("view_value"))
    graft.streaming.EventStreams.asofBackwardStream(
        purchases, views, key = "user_id", ts = "ts",
        factId = "event_id", factVal = "purchase_value",
        ctxVal = "view_value")
      .toDF()
      .select(col("fact_id").as("event_id"), col("key").as("user_id"),
        col("ts").cast("timestamp_ntz").as("ts"),
        col("fact_value").as("purchase_value"),
        col("ts_matched").cast("timestamp_ntz").as("ts_matched"),
        col("ctx_value").as("view_value"))
      .orderBy("event_id")
  }

  /** q61: adaptive skew join ([[SkewJoin.adaptiveSkewJoin]]) — lineitem
    * ⋈ part through the histogram-routed formulation: the sampled key
    * histogram is FLAT here (TPC-H partkeys are uniform), so the route
    * is the plain join and the ×buckets build replication never runs —
    * the r15 verdict measured the unconditional salt at 4.3× the plain
    * join on exactly this shape. The oracle is the PLAIN SQL join:
    * routing must be result-invariant (that is its whole contract), so
    * the gate proves the algebra while SkewJoinSpec proves both routes'
    * plan shapes and the 20× smoke proves the straggler ratio under a
    * 10 % hot key (where the histogram routes TO the salt).
    *
    * Revenue is accumulated in exact integer units of 1e-4 (price cents ×
    * discount percent): a double SUM is order-dependent — at sf1 the
    * Spark/DuckDB accumulation orders diverge by a cent in an 11-digit
    * total — and even per-row ROUND(double, 2) disagrees between engines
    * on ~1e-16 boundary rows. Rounding each factor to its generating
    * integer grid (cents, percent) is robust (≥1e-10 from any boundary),
    * and the integer product/sum is associative, i.e. scale-invariant.
    */
  def q61SaltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    val parts = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"))
    SkewJoin.adaptiveSkewJoin(li, parts, "l_partkey", "p_partkey",
        buckets = 8)
      .groupBy("p_brand")
      .agg((sum(centsOf(col("l_extendedprice"))
              * (lit(100L) - centsOf(col("l_discount"))))
            / lit(10000.0)).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  /** q62: SCD2 temporal join ([[Temporal]]) — signup events become
    * per-user validity epochs; purchases are attributed to the epoch
    * containing their timestamp (inclusive start, exclusive end, open
    * tail). The oracle restates epochs with LEAD/ROW_NUMBER and the
    * lookup as a plain range-predicated join.
    */
  def q62Scd2Join(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val dim = Temporal.epochs(
      ev.where(col("event_type") === "signup")
        .select(col("user_id"), col("ts")),
      key = "user_id", ts = "ts").drop("ts")
    val facts = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    Temporal.joinInEpoch(facts, dim, key = "user_id", factTs = "ts")
      .groupBy(col("user_id"), col("epoch_id"), col("valid_from"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy("user_id", "epoch_id")
  }

  /** q63: batch sessionization ([[Sessions]]) — 30-minute-gap sessions
    * per user over the full event stream, rolled up to session bounds and
    * value sums. The oracle restates the gaps-and-islands pattern (LAG
    * boundary flag → running SUM) with exact-microsecond gap arithmetic.
    */
  def q63Sessionize(spark: SparkSession, sfDir: String): DataFrame =
    Sessions.sessionStats(
        Tables.events(spark, sfDir)
          .select(col("user_id"), col("ts"), col("value")),
        key = "user_id", ts = "ts", valueCol = "value",
        gapMicros = 30L * 60 * 1000000)
      .orderBy("user_id", "session_seq")

  /** q64: exact discontinuous percentiles
    * ([[Profile.percentilesDiscNoSort]]) of order totals per priority
    * class. Type-1 quantiles (the element at rank ceil(p·n)) —
    * engine-portable by construction; the oracle restates the rank
    * selection, never an interpolating quantile. The no-sort histogram
    * localization replaced the window formulation in r16 (5 priority
    * classes would sort 300 k rows per SINGLE window task); r17 dropped
    * its dedicated per-group range pass — bin domains now seed from a
    * LIMIT-bounded sample with both-edge clamping, so the operator is
    * TWO full scans + one near-free seed job. The candidate one-job
    * alternatives were measured and rejected on this data: Spark's
    * native `percentile_disc` aggregate ([[Profile.percentilesDiscAgg]],
    * kept as the spec-pinned API twin) runs an un-codegen'd boxed
    * (value → count) map per row — 1.6 s vs 1.2 s at sf1 isolated.
    */
  def q64Percentiles(spark: SparkSession, sfDir: String): DataFrame =
    Profile.percentilesDiscNoSort(
        Tables.orders(spark, sfDir)
          .select(col("o_orderpriority"), col("o_totalprice")),
        groupCol = "o_orderpriority", valCol = "o_totalprice",
        ps = Seq(0.5, 0.9, 0.99))
      .orderBy("o_orderpriority")

  /** q65: FORWARD as-of join ([[AsOf.joinForward]]) — each purchase
    * attributed to the user's NEXT view at or after the purchase
    * (post-purchase engagement). Oracle: DuckDB's native
    * `ASOF LEFT JOIN … ON p.ts <= v.ts`, the independent-engine check
    * mirroring q57's backward gate.
    */
  def q65AsofForward(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value"), 2).as("purchase_value"))
    val views = ev.where(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(round(max(col("value")), 2).as("view_value"))
    AsOf.joinForward(purchases, views, key = "user_id", ts = "ts")
      .orderBy("event_id")
  }

  /** q87: hourly resample + forward fill ([[AsOf.resampleFfill]]) —
    * every user's observed value carried across an aligned hourly grid
    * spanning their activity (the pandas `resample('1h').ffill()`
    * workhorse). Oracle: DuckDB `generate_series` grid + native ASOF
    * LEFT JOIN — grid generation AND fill both independently
    * implemented.
    */
  def q87ResampleFfill(spark: SparkSession, sfDir: String): DataFrame = {
    val obs = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("ts"))
      .agg(round(max(col("value")), 2).as("value"))
    AsOf.resampleFfill(obs, key = "user_id", ts = "ts")
      .orderBy("user_id", "ts")
  }

  /** q88: data-quality audit ([[Quality.audit]] — the dbt-test/Deequ
    * constraint-suite pattern): lineitem checked for null-ness, value
    * ranges, accepted values, a custom predicate, key uniqueness and two
    * foreign-key integrities, reported as one row per check. The range
    * and accepted-values checks are deliberately violated by the data
    * (quantities run 1..50, returnflag includes 'N') so the gate proves
    * real violation COUNTS, not just all-zeros.
    */
  def q88QualityAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    Quality.audit(li, Seq(
      Quality.NotNull("l_shipdate"),
      Quality.InRange("l_quantity", 1, 25),
      Quality.AcceptedValues("l_returnflag", Seq("A", "R")),
      Quality.Satisfies("disc_price",
        col("l_extendedprice") * (lit(1) - col("l_discount")) >= 0),
      // bounded-tail form: linenumber is 1..7, so uniqueness rolls up
      // into a per-orderkey bitmap (16-byte rows on the exchange instead
      // of 6M hashes) and the orderkey RI reuses the rollup as its probe
      Quality.UniqueBoundedTail(Seq("l_orderkey"), "l_linenumber"),
      Quality.RefIntegrity("l_orderkey",
        Tables.orders(spark, sfDir), "o_orderkey"),
      Quality.RefIntegrity("l_partkey",
        Tables.part(spark, sfDir), "p_partkey")))
  }

  /** q89: ordered-funnel analysis ([[Sessions.funnelTimes]]) — each
    * user's earliest signup → view → click → purchase completion times,
    * strictly-increasing step matching, null from the first unreached
    * step (drop-off reads off the null pattern). One shuffle + one fold;
    * the oracle restates the equivalent chained-minimum definition
    * (t_i = min step-i ts > t_{i−1}) as plain SQL.
    */
  def q89Funnel(spark: SparkSession, sfDir: String): DataFrame =
    Sessions.funnelTimes(Tables.events(spark, sfDir),
        steps = Seq("signup", "view", "click", "purchase"),
        key = "user_id", ts = "ts", typeCol = "event_type")
      .orderBy("user_id")

  /** q92: generalized pattern matching ([[Sessions.matchPattern]]) —
    * two three-step patterns over the event stream, exercising exactly
    * what [[Sessions.funnelTimes]] cannot express: arbitrary per-step
    * predicates (value thresholds, not just type equality) and OPTIONAL
    * steps, in both positions that matter — an optional middle step
    * (pattern A: signup → [view > 100]? → purchase > 50, the suffix
    * anchors through the skip) and an optional HEAD step (pattern B:
    * [click > 200]? → error → purchase, pattern entry at the first
    * required step). Both patterns' step times union under generic
    * column names; the oracle restates the chained-minimum with
    * look-through-coalesce anchors per pattern as plain SQL.
    */
  def q92PatternMatch(spark: SparkSession, sfDir: String): DataFrame = {
    import Sessions.PatternStep
    val ev = Tables.events(spark, sfDir)
    def shaped(tag: String, names: Seq[String])(df: DataFrame): DataFrame =
      df.select(lit(tag).as("pattern") +: col("user_id") +:
        names.zipWithIndex.map { case (n, i) => col(s"t_$n").as(s"t_s$i") }: _*)
    val a = shaped("A", Seq("signup", "bigview", "bigbuy"))(
      Sessions.matchPattern(ev, Seq(
          PatternStep("signup", col("event_type") === "signup"),
          PatternStep("bigview",
            col("event_type") === "view" && col("value") > 100,
            optional = true),
          PatternStep("bigbuy",
            col("event_type") === "purchase" && col("value") > 50)),
        key = "user_id", ts = "ts"))
    val b = shaped("B", Seq("bigclick", "error", "buy"))(
      Sessions.matchPattern(ev, Seq(
          PatternStep("bigclick",
            col("event_type") === "click" && col("value") > 200,
            optional = true),
          PatternStep("error", col("event_type") === "error"),
          PatternStep("buy", col("event_type") === "purchase")),
        key = "user_id", ts = "ts"))
    a.unionAll(b).orderBy("pattern", "user_id")
  }

  /** q93: cohort retention matrix ([[Sessions.retentionMatrix]], day
    * grain) — users cohorted by first-event day; per (cohort, offset) the
    * active-member count, cohort size and retention rate. Two
    * (key, period)-sized shuffles and a cells×sizes join; the oracle
    * restates cohort assignment, activity dedup and the rate as plain
    * SQL.
    */
  def q93Retention(spark: SparkSession, sfDir: String): DataFrame =
    // persist-before-sort: the matrix is |cohorts|·|offsets| rows; the
    // sort's sampling job must not re-run the event aggregation
    Sessions.retentionMatrix(Tables.events(spark, sfDir),
        key = "user_id", ts = "ts", period = "day")
      .transform(graft.CacheHandles.persistTracked)
      .orderBy("cohort", "offset")

  /** q102: EXACT windowed top-k heavy hitters — the exact complement of
    * the q90 streaming CMS estimates: per tumbling hour the 3 most
    * frequent event types with counts, via [[graft.functions.AggExprs
    * .CollectTopK]] over the per-(window, type) counts. Both
    * aggregations map-side combine and the top-k state is O(k) per
    * window — the windowed-top-k cell of the sketch/exact matrix
    * (exact windowed distinct has q79, estimated frequency q90, exact
    * top-k frequency this). Ties total via (n, event_type) struct
    * order; the oracle is the per-window ROW_NUMBER restatement.
    */
  def q102WindowedTopk(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("window.start").as("window_start"))
      .agg(graft.functions.AggExprs.collectTopK(
        struct(col("n"), col("event_type")), 3).as("top"))
      .select(col("window_start"),
        posexplode(col("top")).as(Seq("rk", "t")))
      .select(col("window_start"),
        (col("rk") + 1).cast("int").as("rnk"),
        col("t.event_type").as("event_type"), col("t.n").as("n"))
      .orderBy("window_start", "rnk")

  /** q101: incremental aggregate maintenance
    * ([[Temporal.maintainSumCount]]) — a cents-exact (returnflag,
    * sum, count) materialized view maintained by a changelog synthesized
    * from lineitem (linenumber-1 rows delete, linenumber-2 rows insert
    * into a shifted flag, so deltas touch existing, shrinking AND new
    * groups). The oracle recomputes base + deltas directly; the spec
    * pins the IVM property (maintained ≡ recomputed from the edited
    * row set).
    */
  def q101IncrementalAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    // the q23 cents discipline: bround AFTER the *100 shift — the only
    // formulation that lands on the same integer in both engines
    val cents = bround(col("l_extendedprice") * 100, 0).cast("long")
    val base = li.groupBy(col("l_returnflag"))
      .agg(sum(cents).as("sum_v"), count(lit(1)).as("n"))
    val changes = li.filter(col("l_linenumber").isin(1, 2))
      .select(
        when(col("l_linenumber") === 2,
          concat(lit("N-"), col("l_returnflag")))
          .otherwise(col("l_returnflag")).as("l_returnflag"),
        cents.as("v_cents"),
        (col("l_linenumber") === 1).as("del"))
    Temporal.maintainSumCount(base, changes,
        key = "l_returnflag", valueCol = "v_cents", deleteCol = "del")
      .orderBy("l_returnflag")
  }

  /** q100: robust median/MAD outlier screen ([[Profile.robustOutliers]],
    * k = 3) over lineitem prices per return flag — per group the exact
    * type-1 median, MAD, and |x − med| > 3·MAD count, every step an
    * exact data-value selection or a single correctly-rounded IEEE op,
    * so the oracle replays the chain and hash-matches.
    */
  def q100Outliers(spark: SparkSession, sfDir: String): DataFrame =
    Profile.robustOutliers(Tables.lineitem(spark, sfDir),
        groupCol = "l_returnflag", valCol = "l_extendedprice", k = 3.0)
      .orderBy("l_returnflag")

  /** q99: one-pass table profile ([[Profile.describe]]) over orders'
    * cast-stable columns (ints, strings, timestamps — doubles render
    * differently across engines, the documented cast seam). Exact
    * per-column null/distinct/min/max counters from one unpivot scan;
    * the oracle restates each column's counters and unions them.
    */
  def q99Profile(spark: SparkSession, sfDir: String): DataFrame =
    Profile.describe(Tables.orders(spark, sfDir),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
      .orderBy("column")

  /** q105: the fleet-scale approximate profile ([[Profile
    * .describeApprox]]) over q99's exact columns — per-column HLL
    * distinct estimates from a (column, register)-bounded shuffle
    * (≤ |cols|·2^p rows in flight, vs q99's per-(column, value) exact
    * decomposition). The oracle replays the WHOLE sketch — KR-splitmix
    * hash, register maxima, exact-integer harmonic sum, linear-counting
    * branch — in DuckDB ([[graft.OracleGen.q105Sql]]), q71's pattern.
    */
  def q105DescribeApprox(spark: SparkSession, sfDir: String): DataFrame =
    Profile.describeApprox(Tables.orders(spark, sfDir),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
      .orderBy("column")

  /** q98: integer-grid PageRank ([[Graph.pageRank]], 3 iterations) over
    * the symmetrized part↔supplier co-occurrence graph from lineitem
    * (node ids namespaced even/odd; symmetrization kills dangling
    * nodes). Exact integer arithmetic end to end — the oracle unrolls
    * the same iterations in SQL and the hash gate proves the ranks
    * bit-for-bit ([[graft.OracleGen.q98Sql]]).
    */
  def q98PageRank(spark: SparkSession, sfDir: String): DataFrame = {
    // dedup rides pageRank's own src-keyed shuffle (dedupEdges) instead
    // of a caller-side distinct(): mirroring deduped pairs ≡ deduping
    // mirrored pairs, and this saves a full extra exchange of the edge
    // set (the caller's distinct() phase alone measured 4.2 s at sf1)
    val base = Tables.lineitem(spark, sfDir)
      .select((col("l_partkey") * 2).as("p"),
        (col("l_suppkey") * 2 + 1).as("s"))
    val edges = base.select(col("p").as("src"), col("s").as("dst"))
      .unionAll(base.select(col("s").as("src"), col("p").as("dst")))
    Graph.pageRank(edges, iters = 3, dedupEdges = true).orderBy("node")
  }

  /** q97: CDC changelog apply against a BUCKETED base
    * ([[Temporal.applyChangelogBucketed]]) — a versioned
    * upsert/tombstone changelog (synthesized deterministically from
    * lineitem: version = linenumber, tombstone = quantity < 2,
    * linenumber-7 rows re-keyed negative to exercise pure inserts)
    * folded into the orders snapshot held as a key-bucketed table
    * ([[Temporal.saveBucketedBase]], built once per corpus — the
    * persistent-store deployment shape): latest-wins via one map-side
    * max_by aggregate + one full-outer merge join whose BASE side reads
    * pre-partitioned and pre-sorted — no base Exchange, no base Sort
    * (TemporalSpec pins the plan). The oracle restates winner selection
    * as a window and the fold as a FULL OUTER JOIN. Result persisted
    * before the presentation sort so the range partitioner's sampling
    * pass cannot re-execute the merge (the q43 persist-before-sort
    * rule).
    */
  private val cdcBaseTable =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q97CdcApply(spark: SparkSession, sfDir: String): DataFrame = {
    val baseDf = Tables.orders(spark, sfDir).select(col("o_orderkey"),
      col("o_custkey"), round(col("o_totalprice"), 2).as("o_totalprice"),
      col("o_orderpriority"))
    val table = cdcBaseTable.getOrElseUpdate(sfDir, {
      // collision-resistant table name per corpus: an Int hashCode can
      // collide across two sfDir paths in one JVM (silently aliasing the
      // second corpus's base onto the first) and math.abs(Int.MinValue)
      // is negative — a hex MD5 prefix has neither failure mode
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(sfDir.getBytes("UTF-8")).take(8)
        .map(b => f"$b%02x").mkString
      val t = "graft_q97_base_" + digest
      Temporal.saveBucketedBase(baseDf, t, key = "o_orderkey",
        nBuckets = 32)
      t
    })
    // the testdata generator emits duplicate (orderkey, linenumber)
    // pairs, so the version is COMPOSITE (linenumber, then the payload
    // fields) — a total order up to fully-identical rows, which is
    // exactly the operator's determinism contract. PACKED into one long
    // (the [[Temporal.applyChangelog]] hash-path contract: a bounded
    // composite belongs in fixed-width bits, not a struct, so winner
    // selection plans as a codegen'd HashAggregate instead of
    // interpreted SortAggregate): linenumber≪59 | partkey≪27 |
    // cents≪3 | rfcode≪1 | del, 62 bits — identical total order to
    // the oracle's ORDER BY v, custkey, price, priority, del (rfcode
    // maps the single-char flag A<N<R to 0<1<2, its exact string order;
    // cents = round(round(price,2)·100) is the monotone integer image
    // of the rounded double both engines order by). The range guard
    // fails LOUDLY if any field outgrows its bits or the flag domain
    // drifts — a silent wrap would silently reorder winners.
    // cents = floor(d·100 + 0.5) for the 2-decimal double d: d is the
    // nearest double to k/100, so d·100 ∈ (k−1e-9, k+1e-9) and the
    // floor lands on k exactly — same integer as round(d·100) without
    // the per-row BigDecimal detour (measured −1.4 s of 6.7 at sf1)
    val rounded = round(col("l_extendedprice"), 2)
    val cents = floor(rounded * lit(100) + lit(0.5)).cast("long")
    val rfcode = when(col("l_returnflag") === "A", 0L)
      .when(col("l_returnflag") === "N", 1L)
      .when(col("l_returnflag") === "R", 2L)
    val packOk = col("l_linenumber").between(0, 7) &&
      col("l_partkey").between(0, (1L << 32) - 1) &&
      cents.between(0, (1L << 24) - 1) && rfcode.isNotNull
    val vpack = when(!packOk, raise_error(concat(
        lit("q97 version pack overflow: "), col("l_linenumber"),
        lit("/"), col("l_partkey"), lit("/"), cents, lit("/"),
        col("l_returnflag"))))
      .otherwise(shiftleft(col("l_linenumber").cast("long"), 59) +
        shiftleft(col("l_partkey").cast("long"), 27) +
        shiftleft(cents, 3) +
        shiftleft(rfcode, 1) +
        (col("l_quantity") < 2).cast("long"))
    val changes = Tables.lineitem(spark, sfDir).select(
      when(col("l_linenumber") === 7, -col("l_orderkey"))
        .otherwise(col("l_orderkey")).as("o_orderkey"),
      vpack.as("vord"),
      (col("l_quantity") < 2).as("del"),
      col("l_partkey").as("o_custkey"),
      round(col("l_extendedprice"), 2).as("o_totalprice"),
      concat(lit("U-"), col("l_returnflag")).as("o_orderpriority"))
    Temporal.applyChangelogBucketed(spark, table, changes,
        key = "o_orderkey", versionCol = "vord", deleteCol = "del")
      .transform(graft.CacheHandles.persistTracked)
      .orderBy("o_orderkey")
  }

  /** q96: grouped top-k WITHOUT a window sort
    * ([[graft.functions.AggExprs.CollectTopK]]) — the 3 most expensive
    * orders per priority class through one hash aggregate with O(k)
    * per-group state and map-side combine. The window formulation
    * (`row_number() <= k`) shuffles every row and SORTS each group's
    * full history to keep k rows — on a hot group at 100 TB that sort is
    * the job; this keeps k rows, period. Ties are total (the ordering
    * struct carries the key), and the oracle IS the window SQL, so the
    * gate proves the bounded aggregate ≡ the sort-based definition.
    */
  def q96GroupedTopK(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.AggExprs.collectTopK(
        struct(round(col("o_totalprice"), 2).as("price"),
          col("o_orderkey")), 3).as("top"))
      .select(col("o_orderpriority"),
        posexplode(col("top")).as(Seq("rk", "t")))
      .select(col("o_orderpriority"),
        (col("rk") + 1).cast("int").as("rnk"),
        col("t.price").as("price"), col("t.o_orderkey").as("o_orderkey"))
      .orderBy("o_orderpriority", "rnk")

  /** q95: STREAMING ordered funnel
    * ([[graft.streaming.EventStreams.funnelStream]]) — step-completion
    * rows from the same flatMapGroupsWithState function that runs under
    * readStream (EventStreamsSpec proves streamed == batch across
    * out-of-order micro-batches). A key's completion rows are exactly
    * its [[Sessions.funnelTimes]] row unpivoted with nulls dropped, so
    * the oracle is q89's chained-minimum CTEs union-all'd per step.
    */
  def q95StreamingFunnel(spark: SparkSession, sfDir: String): DataFrame =
    graft.streaming.EventStreams.funnelStream(
        Tables.events(spark, sfDir), FunnelSteps,
        key = "user_id", ts = "ts", typeCol = "event_type")
      .toDF()
      .select(col("key").as("user_id"), col("step"),
        col("ts").cast("timestamp_ntz").as("ts"))
      .orderBy("user_id", "ts", "step")

  /** The q89/q95 funnel step sequence. */
  val FunnelSteps: Seq[String] = Seq("signup", "view", "click", "purchase")

  /** q104: STREAMING cohort retention ([[graft.streaming.EventStreams
    * .retentionActivationsStream]]) — the incremental activation feed
    * aggregated back to the q93 retention matrix: n_active = activations
    * per (cohort, offset), n_cohort = the offset-0 count (every key
    * emits offset 0 from its first applied event). Runs the SAME
    * flatMapGroupsWithState function the stream runs (EventStreamsSpec
    * proves streamed == batch across out-of-order micro-batches); the
    * oracle is q93's verbatim — matching it proves the incremental
    * formulation computes exactly the batch matrix.
    */
  def q104StreamingRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val acts = graft.streaming.EventStreams.retentionActivationsStream(
        Tables.events(spark, sfDir), key = "user_id", ts = "ts",
        period = "day")
      .toDF()
      .select(date_add(to_date(lit("1970-01-01")), col("cohort_days"))
          .as("cohort"),
        col("offset"), col("key"))
    // cells → matrix via the shared finalizer (window over the tiny
    // cells frame — no sizes aggregate, no join)
    val cells = acts.groupBy("cohort", "offset")
      .agg(count(lit(1)).as("n_active"))
    Sessions.finalizeRetentionCells(cells)
      .transform(graft.CacheHandles.persistTracked)
      .orderBy("cohort", "offset")
  }

  /** q94: Z-order layout key ([[Layout.zOrderKey]]) over lineitem's
    * (l_partkey, l_suppkey) — min-max-normalized 8-bit Morton interleave,
    * the multi-dimensional clustering key a lakehouse OPTIMIZE-ZORDER
    * rewrite sorts by. Exact integer arithmetic end to end; the oracle
    * recomputes normalization and interleave bit-for-bit
    * ([[graft.OracleGen.q94Sql]]). The write-side layout operator
    * ([[Layout.zOrder]]) is plan- and locality-spec'd (range partition +
    * local sort, per-partition key spans shrink vs natural order).
    */
  def q94ZOrderKey(spark: SparkSession, sfDir: String): DataFrame =
    Layout.zOrderKey(Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        Seq("l_partkey", "l_suppkey"), bits = 8)
      .orderBy("l_orderkey", "l_linenumber")

  /** q71: HyperLogLog distinct-count profile ([[Sketches.hllDistinct]],
    * p=10) in BOTH estimator regimes on one board: per-event_type distinct
    * users (a few hundred → the linear-counting branch) and the global
    * distinct event_id count (tens of thousands → the raw harmonic
    * estimator), each alongside the exact distinct count so the estimate's
    * error is visible in the gated result itself. The DuckDB oracle
    * recomputes the ENTIRE sketch — xxhash64, register ranks via
    * `length(bin(v))`, the exact DECIMAL register sum, both estimator
    * branches — so the hash gate proves the sketch bit-for-bit, not just
    * "close enough" ([[graft.OracleGen.q71Sql]]).
    */
  def q71HllDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val byType = Sketches.hllDistinct(ev, col("event_type"), col("user_id"))
      .join(ev.groupBy(col("event_type").as("scope"))
        .agg(count_distinct(col("user_id")).as("n_exact")), "scope")
    val global = Sketches.hllDistinct(ev, lit("ALL"), col("event_id"))
      .join(ev.agg(count_distinct(col("event_id")).as("n_exact"))
        .select(lit("ALL").as("scope"), col("n_exact")), "scope")
    byType.unionByName(global)
      .select(col("scope"), col("n_exact"), col("v_empty"), col("hll_est"))
      .orderBy("scope")
  }

  /** q72: Bloom-pruned fact-to-dim join ([[Sketches.bloomPrunedJoin]]) —
    * lineitem probed against the selective p_size=1 slice of part (~2 %
    * of parts): the 8 KiB bitmap prunes ~98 % of lineitem rows before the
    * join's Exchange. Bloom filters have no false negatives, so the
    * result equals the PLAIN join — which is exactly what the oracle
    * runs: the gate proves the pruning is semantics-transparent, and the
    * plan/FP-rate evidence lives in SketchesSpec.
    */
  def q72BloomJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val lineitem = Tables.lineitem(spark, sfDir)
    val smallParts = Tables.part(spark, sfDir)
      .filter(col("p_size") === 1)
      .select(col("p_partkey"), col("p_brand"))
    // revenue in integer TEN-THOUSANDTHS: price and discount are exact
    // 2-dp values, so cents(price) · (100 − cents(discount)) is the
    // exact integer image of price·(1−discount) — a double SUM here
    // differs from DuckDB's by accumulation order at sf1 volumes (one
    // final cent), which is an FP seam, not a semantics difference
    Sketches.bloomPrunedJoin(lineitem, smallParts, "l_partkey", "p_partkey")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
        sum(centsOf(col("l_extendedprice")) *
          (lit(100L) - centsOf(col("l_discount")))).as("revenue_c4"))
      .orderBy("p_brand")
  }

  /** q74: count-min-sketch heavy hitters over the documents corpus
    * ([[Sketches.cmsHeavyHitters]]) — exact top-30 tokens with both the
    * exact count and the sketch estimate (the one-sided ≥ error visible
    * in the gated rows). Oracle recomputes the ENTIRE sketch in DuckDB —
    * integer arithmetic end to end, no FP seam.
    */
  def q74CmsHeavyHitters(spark: SparkSession, sfDir: String): DataFrame =
    Sketches.cmsHeavyHitters(Tables.documents(spark, sfDir), col("text"))

  /** q76: histogram approximate percentiles
    * ([[Profile.percentilesHistogram]], 256 bins) — the fixed-memory,
    * sort-free quantile path next to q64's exact ranks, same table and
    * quantiles so the two gates bracket each other. Oracle restates the
    * binning, cumulative ranks, and upper-edge arithmetic in DuckDB with
    * every float op in the identical order.
    */
  def q76HistPercentiles(spark: SparkSession, sfDir: String): DataFrame =
    Profile.percentilesHistogram(
        Tables.orders(spark, sfDir)
          .select(col("o_orderpriority"), col("o_totalprice")),
        groupCol = "o_orderpriority", valCol = "o_totalprice",
        ps = Seq(0.5, 0.9, 0.99), bins = 256)
      .orderBy("o_orderpriority", "p")

  /** q77: CUBE grouping sets — all four (returnflag × linestatus)
    * aggregation levels, with the Expand kept OFF the fact scan: `cube`
    * directly over lineitem fans EVERY input row into the 2^k grouping
    * combinations before the partial agg (4× the scanned rows through
    * the aggregate — at 100 TB that multiplier IS the job), but COUNT
    * and SUM are decomposable, so the full-key groupBy runs first
    * (≈|rf×ls| ≈ 6 partial rows) and the cube's Expand multiplies those
    * 6 rows, not 6M. Sum exactness across the two levels: l_quantity is
    * integral (1..50) in doubles, so partial sums and their re-sum are
    * exact integers well below 2^53 — no FP order seam against the
    * oracle's one-level SUM. `grouping()` flags still disambiguate
    * genuine NULL keys from subtotal rows (the pre-aggregate keys carry
    * NULLs through as ordinary group values).
    */
  def q77Cube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("graft_pn"),
        sum(col("l_quantity")).as("graft_pq"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("graft_pn")).as("n_items"),
        round(sum(col("graft_pq")), 2).as("sum_qty"),
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("g_rf").cast("int").as("g_rf"),
        col("g_ls").cast("int").as("g_ls"),
        col("n_items"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  /** q78: the analytic-window suite beyond the existing cumsum/top-k
    * gates — lag, lead, first_value, last_value (with the explicit
    * unbounded frame: the SQL default frame stops at CURRENT ROW, a
    * classic cross-engine seam pinned here deliberately), and ntile,
    * all over one (key, ts) ordering so Spark plans a single Window
    * operator — one shuffle, one sort, five functions.
    */
  def q78WindowSuite(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wFull = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value"), 2).as("value"))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_value", lead(col("value"), 1).over(w))
      .withColumn("first_value", first(col("value")).over(wFull))
      .withColumn("last_value", last(col("value")).over(wFull))
      .withColumn("quartile", ntile(4).over(w))
      .select(col("event_id"), col("user_id"), col("value"),
        col("prev_value"), col("next_value"), col("first_value"),
        col("last_value"), col("quartile"))
      .orderBy("user_id", "event_id")
  }

  /** Snapshot-store table roots keyed by corpus dir — the table is BUILT
    * once per corpus (three commits + a vacuum, the offline write side)
    * and every call reads it, so bench reps measure what a consumer
    * pays: manifest resolution + the pinned-version scan.
    */
  private val snapshotRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** q110: ACID snapshot TIME TRAVEL under the hash gate
    * ([[graft.sources.SnapshotStore]]) — the commit protocol's reader
    * contract proven end to end on data, not just in specs: version 0
    * overwrites in one third of `orders`, version 1 APPENDS the second
    * third, version 2 overwrites with the last third (so the CURRENT
    * table would give a different hash), then [[SnapshotStore.vacuum]]
    * retains the newest two versions. The gated read pins version 1 —
    * after the vacuum — and aggregates it in integer cents; the oracle
    * recomputes what snapshot 1 must contain (thirds 0 and 1) straight
    * from `orders`. Equality proves: append composed on overwrite,
    * manifest-pinned reads immune to the later commit, and vacuum
    * deleting nothing a retained manifest references.
    */
  def q110SnapshotTimeTravel(spark: SparkSession,
      sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = snapshotRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-snapstore-").toString
      val o = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"))
      SnapshotStore.commitOverwrite(
        o.filter(col("o_orderkey") % 3 === 0), dir) // v0
      SnapshotStore.commitAppend(
        o.filter(col("o_orderkey") % 3 === 1), dir) // v1 = v0 + third 1
      SnapshotStore.commitOverwrite(
        o.filter(col("o_orderkey") % 3 === 2), dir) // v2 (current)
      SnapshotStore.vacuum(dir, keepVersions = 2)   // retains v1, v2
      dir
    })
    SnapshotStore.read(spark, root, version = Some(1))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(centsOf(col("o_totalprice")))
          .as("cents"))
      .orderBy("o_orderpriority")
  }

  /** q115: snapshot DIFF ([[graft.sources.SnapshotStore.diff]]) — the
    * change feed between the q110 store's retained versions: v1 (thirds
    * 0+1 of orders) → v2 (third 2, an overwrite), so every v1 row is
    * `removed` and every v2 row `added`. The oracle re-derives the full
    * expected change set straight from `orders` — proving the diff reads
    * both manifests correctly and the bag-count merge tags every row
    * exactly once.
    */
  def q115SnapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    // ensure the store exists (shares the q110 build, version layout
    // documented there)
    q110SnapshotTimeTravel(spark, sfDir).count()
    graft.sources.SnapshotStore.diff(spark, snapshotRoot(sfDir),
        from = 1, to = 2)
      .orderBy("o_orderkey")
  }

  /** q116: snapshot SCHEMA EVOLUTION with NULL backfill
    * ([[graft.sources.SnapshotStore.commitAppendEvolve]]) — the
    * reference's own migration semantics (migrate.py:89-94 back-fills
    * absent columns as NULL) lifted into the ACID layer: v0 overwrites
    * in a NARROW projection (key + priority) of one third of `orders`;
    * v1 appends the second third carrying an ADDITIONAL `o_totalprice`
    * column. The current read sees the evolved 3-column schema, with the
    * v0 rows' new column backfilled NULL straight off the old parquet
    * files (by-name resolution — no rewrite). The gate aggregates
    * n_orders / n_priced / cents per priority; the oracle re-derives
    * which rows can carry a price (third 1 only) from `orders` itself —
    * equality proves the merged schema, the backfill, and that evolution
    * rewrote nothing.
    */
  private val evolveRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q116SchemaEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = evolveRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-snapevolve-").toString
      val o = Tables.orders(spark, sfDir)
      SnapshotStore.commitOverwrite(
        o.filter(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey"), col("o_orderpriority")), dir) // v0
      SnapshotStore.commitAppendEvolve(
        o.filter(col("o_orderkey") % 3 === 1)
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice")), dir)                             // v1
      // time travel stays pinned to the NARROW schema — loud here, not
      // just in the spec (a widened v0 read would break the gate anyway
      // via the n_priced count, but this failure names the cause)
      require(SnapshotStore.read(spark, dir, Some(0)).columns.toSeq ==
        Seq("o_orderkey", "o_orderpriority"),
        "evolution must not widen earlier snapshots")
      dir
    })
    SnapshotStore.read(spark, root)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        count(col("o_totalprice")).as("n_priced"),
        sum(centsOf(col("o_totalprice")))
          .as("cents"))
      .orderBy("o_orderpriority")
  }

  /** q117: snapshot CHANGE FEED ([[graft.sources.SnapshotStore
    * .changeFeed]]) — the incremental-consumer read path: per-commit
    * diffs of every adjacent version pair, each row tagged with the
    * version that introduced it. Store: v0 overwrite (third 0), v1
    * append (third 1), v2 overwrite (third 2) — so the feed must show
    * third 1 `added` at version 1, then thirds 0+1 `removed` and third 2
    * `added` at version 2, every row exactly once. The oracle re-derives
    * the whole feed from `orders`; SnapshotStreamSpec proves the
    * telescoping contract (collapseFeed(feed) == endpoint diff) and the
    * STREAMING write side (each micro-batch one version, replay-proof).
    */
  private val feedRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** The q117/q133 shared corpus: three commits whose adjacent diffs
    * are the canonical feed (v1 append adds third 1; v2 overwrite
    * removes thirds 0+1 and adds third 2). */
  private def feedRootFor(spark: SparkSession, sfDir: String): String =
    feedRoot.getOrElseUpdate(sfDir, {
      import graft.sources.SnapshotStore
      val dir = java.nio.file.Files
        .createTempDirectory("graft-snapfeed-").toString
      val o = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"))
      SnapshotStore.commitOverwrite(o.filter(col("o_orderkey") % 3 === 0), dir)
      SnapshotStore.commitAppend(o.filter(col("o_orderkey") % 3 === 1), dir)
      SnapshotStore.commitOverwrite(o.filter(col("o_orderkey") % 3 === 2), dir)
      dir
    })

  def q117ChangeFeed(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = feedRootFor(spark, sfDir)
    SnapshotStore.changeFeed(spark, root, from = 0, to = 2)
      .orderBy("version", "o_orderkey", "change")
  }

  /** q133: STREAMING CHANGE-FEED SOURCE ([[graft.sources
    * .GraftChangeSource]], `readStream.format("graft")`) — q117's feed
    * consumed through a REAL Structured Streaming query instead of the
    * batch API: offsets are table versions, each micro-batch
    * materializes [[graft.sources.SnapshotStore.changeFeed]] over its
    * version range (O(changed data) — shared files cancel), and the
    * memory-sink result must hash-equal q117's oracle (the per-commit
    * diff recomputed in SQL). The builder additionally REQUIREs replay
    * determinism: a SECOND run through a FRESH checkpoint collects
    * exactly the same row set (immutable manifests make version ranges
    * stable — the exactly-once foundation). Incremental multi-batch
    * arrival and the vacuum retention contract are spec-pinned in
    * GraftStreamSourceSpec.
    */
  private val streamedFeedSink =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q133StreamingFeed(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = feedRootFor(spark, sfDir)
    val sink = streamedFeedSink.getOrElseUpdate(sfDir, {
      val name = "q133_feed_" +
        java.lang.Integer.toHexString(sfDir.hashCode)
      def run(sinkName: String): Unit = {
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft-streamfeed-ckpt-").toString
        val q = spark.readStream.format("graft")
          .option("startingVersion", "0").load(root)
          .writeStream.format("memory").queryName(sinkName)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        q.processAllAvailable(); q.stop()
      }
      run(name); run(name + "_replay")
      def rows(df: DataFrame) = df
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"), col("change"), col("n_rows"),
          col("version"))
        .as[(Long, String, Double, String, Long, Int)](
          org.apache.spark.sql.Encoders.product[
            (Long, String, Double, String, Long, Int)])
        .collect().toSet
      val first = rows(spark.table(name))
      require(first == rows(spark.table(name + "_replay")),
        "fresh-checkpoint replay must collect exactly the same feed")
      require(first == rows(SnapshotStore.changeFeed(spark, root, 0, 2)),
        "streamed feed must equal the batch changeFeed")
      // stage the streamed rows OUT of the memory sink once: the sink
      // is a driver-side, single-partition store (a test harness, not
      // a serving layer) — re-scanning it per read would serialize a
      // 2M-row sort onto the driver; a real deployment streams into a
      // distributed sink (parquet / the snapshot store) exactly like
      // this
      val staged = java.nio.file.Files
        .createTempDirectory("graft-streamfeed-out-").toString
      spark.table(name).write.mode("overwrite").parquet(staged)
      staged
    })
    spark.read.parquet(sink)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice"), col("change"), col("n_rows"), col("version"))
      .orderBy("version", "o_orderkey", "change")
  }

  /** q118: OPTIMIZE/compaction through the hash gate
    * ([[graft.sources.SnapshotStore.optimize]]) — the lakehouse
    * small-file rewrite: v0 overwrite + v1 append land the usual many
    * small files; OPTIMIZE (z-order clustered on the key) rewrites them
    * into ONE file as v2 with bit-identical content. The gate reads the
    * OPTIMIZED snapshot and aggregates exactly like q110, against the
    * SAME oracle — equality proves content-hash invariance through the
    * rewrite; the builder asserts the file-count drop loudly, and
    * SnapshotStoreSpec covers pinned-reader isolation + vacuum
    * eligibility of the replaced files.
    */
  private val optimizeRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** q120: STATS-PRUNED SNAPSHOT SCAN ([[graft.sources.SnapshotStore
    * .readWhere]]) — the read-path payoff of the whole lakehouse stack:
    * lineitem lands in the snapshot store (overwrite + append, so the
    * stats sidecar provably composes across commits), OPTIMIZE
    * Z-ORDERS it on (l_orderkey, l_suppkey) into 16 files, and the
    * gated read pushes an l_orderkey RANGE predicate through the
    * manifest's per-file min/max — opening only the files whose ranges
    * intersect, which the builder REQUIRES loudly (files_opened <
    * files_listed; at 100 TB this is the difference between scanning a
    * corpus and scanning a slice). The oracle computes the same
    * filtered aggregate straight from lineitem — equality proves the
    * skip logic dropped no qualifying file (bloom-style no-false-
    * negatives, here from exact ranges).
    */
  private val statsRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q120StatsPrunedScan(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = statsRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-snapstats-").toString
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"))
      SnapshotStore.commitOverwrite(
        li.filter(col("l_orderkey") % 3 =!= 0), dir)
      SnapshotStore.commitAppend(
        li.filter(col("l_orderkey") % 3 === 0), dir)
      SnapshotStore.optimize(spark, dir, targetFiles = 16,
        zorderBy = Seq("l_orderkey", "l_suppkey"))
      dir
    })
    val (df, report) = SnapshotStore.readWhere(spark, root,
      SnapshotStore.StatsPred.Between("l_orderkey", 1000L, 3000L))
    require(report.filesOpened < report.filesListed,
      s"stats must prune the z-ordered layout, opened " +
        s"${report.filesOpened} of ${report.filesListed}")
    df.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(centsOf(col("l_extendedprice")))
          .as("cents"))
      .orderBy("l_returnflag")
  }

  /** q121: MULTI-TABLE ATOMIC COMMIT ([[graft.sources.Catalog]]) —
    * catalog v0 lands TWO tables in ONE transaction (t_main: key +
    * priority, t_price: key + price, both thirds 0+1 of orders);
    * catalog v1 then OVERWRITES t_price with different rows (third 2).
    * The gate joins the two tables AT PINNED CATALOG VERSION 0 and
    * aggregates integer cents per priority; the oracle recomputes the
    * join straight from `orders`. Equality proves the transaction
    * landed atomically (both tables present at v0), the pinned
    * cross-table read is immune to the later commit, and the staged
    * manifests resolve exactly the files the transaction wrote —
    * CatalogSpec races three concurrent committers for the no-torn-
    * reads half of the contract.
    */
  private val catalogRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** The q121/q132 shared catalog corpus: catalog v0 lands t_main +
    * t_price in ONE transaction (thirds 0+1 of orders), catalog v1
    * overwrites t_price (third 2) — so any v0-pinned cross-table read
    * proves both atomicity and pin isolation. */
  private def catalogRootFor(spark: SparkSession, sfDir: String): String =
    catalogRoot.getOrElseUpdate(sfDir, {
      import graft.sources.Catalog
      val dir = java.nio.file.Files
        .createTempDirectory("graft-catalog-").toString
      val o = Tables.orders(spark, sfDir)
      val firstTwo = o.filter(col("o_orderkey") % 3 =!= 2)
      Catalog.commit(dir, Map(
        "t_main" -> ((firstTwo.select(col("o_orderkey"),
          col("o_orderpriority")), Catalog.Overwrite)),
        "t_price" -> ((firstTwo.select(col("o_orderkey"),
          col("o_totalprice")), Catalog.Overwrite))))       // catalog v0
      Catalog.commit(dir, Map(
        "t_price" -> ((o.filter(col("o_orderkey") % 3 === 2)
          .select(col("o_orderkey"), col("o_totalprice")),
          Catalog.Overwrite))))                             // catalog v1
      dir
    })

  def q121CatalogCommit(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.Catalog
    val root = catalogRootFor(spark, sfDir)
    Catalog.readTable(spark, root, "t_main", version = Some(0))
      .join(Catalog.readTable(spark, root, "t_price", version = Some(0)),
        "o_orderkey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(centsOf(col("o_totalprice")))
          .as("cents"))
      .orderBy("o_orderpriority")
  }

  /** q122: transactional MERGE INTO ([[graft.sources.SnapshotStore
    * .merge]]) — the q97 changelog fold executed as a STORE COMMIT
    * instead of a transient frame: orders lands as snapshot v0, the
    * lineitem-derived changelog (packed long version, the q97
    * construction verbatim) merges as v1, and the gate reads v1 back
    * THROUGH THE STORE and aggregates integer cents. The oracle is
    * q97's winner-window + full-outer restatement aggregated the same
    * way — equality proves merge semantics ≡ applyChangelog AND that
    * the committed files carry exactly the merged row set. v0 stays
    * pinned (time travel over a merge), and the merged version's
    * footer stats serve a [[SnapshotStore.readWhere]] with a loud
    * files-opened check in the spec.
    */
  private val mergeRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q122MergeInto(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = mergeRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-snapmerge-").toString
      val baseDf = Tables.orders(spark, sfDir).select(col("o_orderkey"),
        col("o_custkey"), round(col("o_totalprice"), 2).as("o_totalprice"),
        col("o_orderpriority"))
      SnapshotStore.commitOverwrite(baseDf, dir)            // v0
      val rounded = round(col("l_extendedprice"), 2)
      val cents = floor(rounded * lit(100) + lit(0.5)).cast("long")
      val rfcode = when(col("l_returnflag") === "A", 0L)
        .when(col("l_returnflag") === "N", 1L)
        .when(col("l_returnflag") === "R", 2L)
      val packOk = col("l_linenumber").between(0, 7) &&
        col("l_partkey").between(0, (1L << 32) - 1) &&
        cents.between(0, (1L << 24) - 1) && rfcode.isNotNull
      val vpack = when(!packOk, raise_error(
          lit("q122 version pack overflow")))
        .otherwise(shiftleft(col("l_linenumber").cast("long"), 59) +
          shiftleft(col("l_partkey").cast("long"), 27) +
          shiftleft(cents, 3) + shiftleft(rfcode, 1) +
          (col("l_quantity") < 2).cast("long"))
      val changes = Tables.lineitem(spark, sfDir).select(
        when(col("l_linenumber") === 7, -col("l_orderkey"))
          .otherwise(col("l_orderkey")).as("o_orderkey"),
        vpack.as("vord"),
        (col("l_quantity") < 2).as("del"),
        col("l_partkey").as("o_custkey"),
        rounded.as("o_totalprice"),
        concat(lit("U-"), col("l_returnflag")).as("o_orderpriority"))
      val v = SnapshotStore.merge(spark, dir, changes,
        key = "o_orderkey", versionCol = "vord", deleteCol = "del",
        skipPartialAgg = true)                              // v1
      require(v == 1, s"merge must commit version 1, got $v")
      dir
    })
    graft.sources.SnapshotStore.read(spark, root) // current = merged v1
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"),
        sum(centsOf(col("o_totalprice")))
          .as("cents"))
      .orderBy("o_orderpriority")
  }

  /** q123: SEGMENTED (manifest-list) SNAPSHOT SCAN
    * ([[graft.sources.SnapshotStore.appendSegment]] /
    * [[graft.sources.SnapshotStore.readWhere]]) — the 10⁵-file-table
    * story: lineitem lands as 20 key-range batches of 50 files each
    * (1,000 data files, each batch ONE immutable segment whose
    * aggregated column ranges ride inline in the manifest list), and
    * the gated range read must (a) SKIP whole segments without even
    * parsing their file lists and (b) open O(selectivity) of the
    * 1,000 files — both REQUIREd loudly. At 100 TB this is what keeps
    * reads from parsing a million-entry file list on the driver:
    * commit metadata is O(new segment), read metadata is O(segments
    * intersecting the predicate). The oracle computes the same
    * filtered aggregate straight from lineitem — equality proves
    * neither pruning level dropped a qualifying row.
    */
  private val segScanRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private val SegScanSlices = 20
  private val SegScanFilesPerSlice = 50

  def q123SegmentedScan(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = segScanRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-snapseg-").toString
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"))
        .persist()
      try {
        val maxKey = li.agg(max(col("l_orderkey"))).head.getLong(0)
        val width = maxKey / SegScanSlices + 1
        // 20 ingest batches, each clustered on a disjoint key range —
        // the time-ordered-ingest shape segment pruning is built for
        (0 until SegScanSlices).foreach { i =>
          SnapshotStore.appendSegment(
            li.filter(col("l_orderkey") >= i * width &&
              col("l_orderkey") < (i + 1) * width)
              .repartition(SegScanFilesPerSlice), dir)
        }
      } finally li.unpersist()
      dir
    })
    // ~5% of the key space at sf0.01, proportionally less as SF grows —
    // the "read one day out of a month of ingest" shape
    val (df, report) = SnapshotStore.readWhere(spark, root,
      SnapshotStore.StatsPred.Between("l_orderkey", 4000L, 4700L))
    require(report.segmentsParsed < report.segmentsListed,
      s"segment summaries must prune unparsed: parsed " +
        s"${report.segmentsParsed} of ${report.segmentsListed}")
    require(report.filesOpened * 5 <= report.filesListed,
      s"segmented read must open O(selectivity) files, opened " +
        s"${report.filesOpened} of ${report.filesListed}")
    df.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(centsOf(col("l_extendedprice")))
          .as("cents"))
      .orderBy("l_returnflag")
  }

  /** q124: METADATA-ONLY MANIFEST REWRITE
    * ([[graft.sources.SnapshotStore.rewriteManifests]]) — Iceberg's
    * rewrite-manifests action: 8 segmented appends accrete 8 small
    * segments; the rewrite regroups their 32 data files into TWO fresh
    * segments WITHOUT touching a data file, and the gated range read
    * off the rewritten manifest list must still prune (1 of 2 segments
    * parsed) and match the oracle computed straight from orders —
    * proving the regrouped summaries are sound and the rewrite moved
    * only metadata. SnapshotStoreSpec pins the stronger invariants
    * (identical file paths, vacuum of the superseded segments).
    */
  private val segRewriteRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q124ManifestRewrite(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = segRewriteRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-snaprw-").toString
      val o = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority"))
        .persist()
      try {
        val maxKey = o.agg(max(col("o_orderkey"))).head.getLong(0)
        val width = maxKey / 8 + 1
        (0 until 8).foreach { i =>
          SnapshotStore.appendSegment(
            o.filter(col("o_orderkey") >= i * width &&
              col("o_orderkey") < (i + 1) * width).repartition(4), dir)
        }
      } finally o.unpersist()
      val segsBefore = SnapshotStore.snapshot(dir).get.segments.size
      SnapshotStore.rewriteManifests(dir, targetSegments = 2)
      val after = SnapshotStore.snapshot(dir).get
      require(after.segments.size == 2 && segsBefore == 8,
        s"rewrite must compact the manifest list ($segsBefore -> " +
          s"${after.segments.size})")
      dir
    })
    val (df, report) = SnapshotStore.readWhere(spark, root,
      SnapshotStore.StatsPred.Between("o_orderkey", 1000L, 5000L))
    require(report.segmentsParsed < report.segmentsListed,
      s"rewritten summaries must still prune: parsed " +
        s"${report.segmentsParsed} of ${report.segmentsListed}")
    require(report.filesOpened < report.filesListed,
      s"file-level pruning must survive the rewrite, opened " +
        s"${report.filesOpened} of ${report.filesListed}")
    df.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(centsOf(col("o_totalprice")))
          .as("cents"))
      .orderBy("o_orderpriority")
  }

  /** q125: MERGE-ON-READ ([[graft.sources.SnapshotStore.mergeOnRead]])
    * — q122's exact changelog (the packed-long version construction
    * verbatim) merged WITHOUT rewriting the base: the commit writes one
    * equality-delete layer (O(changes) wall and I/O; the builder
    * REQUIREs that v0's base files survive untouched in the merged
    * manifest) and the gated read folds the layer over the base at
    * scan time. The oracle is q122's — the winner-window + full-outer
    * restatement — so equality proves the layered read is
    * BIT-IDENTICAL to the copy-on-write rewrite. This is the
    * base ≫ daily-changes trade: at a 100 TB base, the CoW merge
    * rewrites everything per batch; this commit is priced by the batch.
    */
  private val morRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** The q122/q125/q126 shared base projection over orders. */
  private def morBase(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).select(col("o_orderkey"),
      col("o_custkey"), round(col("o_totalprice"), 2).as("o_totalprice"),
      col("o_orderpriority"))

  /** The q122/q125/q126 shared changelog over lineitem: per-order
    * upserts + tombstones + line-7 inserts, version = a packed long
    * whose byte order mirrors the oracle's tie-break chain (loud
    * overflow guard). */
  private def morChangelog(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val rounded = round(col("l_extendedprice"), 2)
    val cents = floor(rounded * lit(100) + lit(0.5)).cast("long")
    val rfcode = when(col("l_returnflag") === "A", 0L)
      .when(col("l_returnflag") === "N", 1L)
      .when(col("l_returnflag") === "R", 2L)
    val packOk = col("l_linenumber").between(0, 7) &&
      col("l_partkey").between(0, (1L << 32) - 1) &&
      cents.between(0, (1L << 24) - 1) && rfcode.isNotNull
    val vpack = when(!packOk, raise_error(
        lit("q125 version pack overflow")))
      .otherwise(shiftleft(col("l_linenumber").cast("long"), 59) +
        shiftleft(col("l_partkey").cast("long"), 27) +
        shiftleft(cents, 3) + shiftleft(rfcode, 1) +
        (col("l_quantity") < 2).cast("long"))
    Tables.lineitem(spark, sfDir).select(
      when(col("l_linenumber") === 7, -col("l_orderkey"))
        .otherwise(col("l_orderkey")).as("o_orderkey"),
      vpack.as("vord"),
      (col("l_quantity") < 2).as("del"),
      col("l_partkey").as("o_custkey"),
      rounded.as("o_totalprice"),
      concat(lit("U-"), col("l_returnflag")).as("o_orderpriority"))
  }

  def q125MergeOnRead(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = morRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-snapmor-").toString
      SnapshotStore.commitOverwrite(morBase(spark, sfDir), dir)  // v0
      val baseFiles = SnapshotStore.snapshot(dir).get.files
      val v = SnapshotStore.mergeOnRead(spark, dir,
        morChangelog(spark, sfDir),
        key = "o_orderkey", versionCol = "vord", deleteCol = "del",
        skipPartialAgg = true)                              // v1
      require(v == 1, s"mergeOnRead must commit version 1, got $v")
      val m = SnapshotStore.snapshot(dir).get
      require(m.files == baseFiles && m.layers.size == 1,
        s"mergeOnRead must leave the base untouched and add ONE layer " +
          s"(files ${m.files.size} vs base ${baseFiles.size}, " +
          s"layers ${m.layers.size})")
      dir
    })
    graft.sources.SnapshotStore.read(spark, root) // base + folded layer
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"),
        sum(centsOf(col("o_totalprice")))
          .as("cents"))
      .orderBy("o_orderpriority")
  }

  /** q126: STREAMING CDC UPSERT SINK
    * ([[graft.streaming.SnapshotStream.upsertStream]] over
    * [[graft.sources.SnapshotStore.mergeOnReadOnce]]) — q125's exact
    * changelog delivered as THREE micro-batches through a real
    * Structured Streaming query (parquet source, maxFilesPerTrigger=1),
    * each landing as one replay-deduped merge-on-read layer; the base
    * is never rewritten (REQUIREd). The staged batches are KEY-DISJOINT
    * (hash of the merge key picks the file), so layer order is
    * irrelevant and the layered fold equals the global winner fold —
    * which is why q122's oracle stays exact. Batch count is REQUIREd
    * equal to the staged file count, and each batch's txn id is
    * REQUIREd into the manifest chain (replay idempotence is
    * spec-pinned in SnapshotStreamSpec).
    */
  private val upsertStreamRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q126StreamingUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = upsertStreamRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-snapus-").toString
      SnapshotStore.commitOverwrite(morBase(spark, sfDir), dir)  // v0
      val baseFiles = SnapshotStore.snapshot(dir).get.files
      // stage the changelog as key-disjoint parquet files: same key →
      // same hash bucket → same file → same micro-batch
      val stage = java.nio.file.Files
        .createTempDirectory("graft-snapus-stage-").toString
      morChangelog(spark, sfDir)
        .repartition(3, pmod(col("o_orderkey"), lit(3)))
        .write.mode("overwrite").parquet(stage)
      val staged = spark.read.parquet(stage)
      val nFiles = staged.inputFiles.length
      val src = spark.readStream.schema(staged.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-snapus-ckpt-").toString
      val q = graft.streaming.SnapshotStream.upsertStream(src, dir,
        ckpt, sinkId = "q126", key = "o_orderkey", versionCol = "vord",
        deleteCol = "del", skipPartialAgg = true)
      q.awaitTermination()
      val m = SnapshotStore.snapshot(dir).get
      require(m.files == baseFiles && m.layers.size == nFiles,
        s"upsert stream must leave the ${baseFiles.size}-file base " +
          s"untouched and land one layer per micro-batch " +
          s"(files ${m.files.size}, layers ${m.layers.size}, " +
          s"batches $nFiles)")
      val txns = (0 to SnapshotStore.versions(dir).max)
        .map(v => SnapshotStore.snapshot(dir, Some(v)).get.txn)
      (0 until nFiles).foreach(b => require(txns.contains(s"q126:$b"),
        s"micro-batch $b's txn missing from the manifest chain: $txns"))
      dir
    })
    SnapshotStore.read(spark, root) // base + three folded layers
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"),
        sum(centsOf(col("o_totalprice")))
          .as("cents"))
      .orderBy("o_orderpriority")
  }

  /** q127: FILE-LEVEL BLOOM INDEX ([[graft.sources.SnapshotStore
    * .indexBloom]]) — the point-lookup complement to q120's min/max
    * skipping: orders committed range-clustered on xxhash64(o_CUSTKEY) —
    * same-custkey rows still co-locate, but the cluster key is
    * UNCORRELATED with o_orderkey at every scale factor (plain
    * o_custkey is not: GenScaled shifts orderkey and custkey together
    * per copy, and the base data itself correlates them, so
    * custkey-range files are also orderkey-range files and the stats
    * tier pruned the probe by itself — the r16 gate's flaw, measured:
    * 9 of 15 skips were stats-attributed even under pmod(custkey,8191)
    * at sf0.01). Under the hash clustering every file's o_orderkey range
    * spans the domain; only the per-file bloom sidecar can skip an
    * orderkey equality, and the gate require()s exactly that through
    * [[graft.sources.SnapshotStore.ScanReport.bloomSkipped]]'s per-tier
    * attribution: the probe must open ≤1/4 of the files with every skip
    * bloom-attributed; a key below the domain must open ≤1 (there the
    * stats tier is entitled to the skips — attribution counts stats
    * first). The gated rows are the matched order itself, so
    * the hash equality proves no file holding the key was skipped (no
    * false negatives) while the opened-count proves the skipping is
    * real. Probe key = the largest multiple of 13 at or below the
    * orderkey domain midpoint — deterministic at every SF, mid-domain
    * so stats cannot claim the skips, re-derived by the oracle.
    */
  private val bloomIdxRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q127BloomIndex(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = bloomIdxRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-snapblm-").toString
      SnapshotStore.commitOverwrite(
        Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), col("o_orderpriority"))
          .repartitionByRange(16, xxhash64(col("o_custkey"))),
        dir)                                                  // v0
      SnapshotStore.indexBloom(spark, dir, "o_orderkey")      // v1
      dir
    })
    // probe key = the largest multiple of 13 at or below the DOMAIN
    // MIDPOINT: an extreme key (the old plain max-of-13) sits above
    // ~half the files' own maxima even when every file's range spans
    // the bulk of the domain, handing those skips to the stats tier —
    // a mid-domain key is inside every spanning file's [min, max], so
    // only the bloom tier can skip (which is the thing under test)
    val (kMin, kMax) = Tables.orders(spark, sfDir)
      .agg(min(col("o_orderkey")), max(col("o_orderkey")))
      .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong)).head()
    val mid = (kMin + kMax) / 2
    val probe = Tables.orders(spark, sfDir)
      .filter(pmod(col("o_orderkey"), lit(13)) === 0 &&
        col("o_orderkey") <= mid)
      .agg(max(col("o_orderkey"))).head.getLong(0)
    val (df, rep) = SnapshotStore.readWhere(spark, root,
      SnapshotStore.StatsPred.Eq("o_orderkey", probe))
    require(rep.filesOpened * 4 <= rep.filesListed,
      s"bloom index must prune the decorrelated layout: $rep")
    require(rep.bloomSkipped == rep.filesSkipped && rep.bloomSkipped > 0,
      s"every skip must be BLOOM-attributed (stats cannot prune the " +
        s"pmod-clustered o_orderkey ranges): $rep")
    val (_, repAbsent) = SnapshotStore.readWhere(spark, root,
      SnapshotStore.StatsPred.Eq("o_orderkey", -424242L))
    // the absent key sits BELOW the domain, so the stats tier is
    // entitled to this one — no bloom attribution asserted here
    require(repAbsent.filesOpened <= 1,
      s"absent key must open (almost) nothing: $repAbsent")
    df.select(col("o_orderkey"), col("o_custkey"),
        centsOf(col("o_totalprice")).as("cents"),
        col("o_orderpriority"))
      .orderBy("o_orderkey")
  }

  /** q128: SPARK-NATIVE PUSHDOWN FRONT DOOR
    * ([[graft.sources.GraftDataSource]]) — q120's stats-pruned scan,
    * but the predicate arrives through SPARK'S OWN PLANNER instead of
    * the Scala `StatsPred` API: the table commits + z-orders exactly
    * like q120, then the gate reads `spark.read.format("graft")
    * .load(root).filter(between)` — a registered data source whose
    * [[graft.sources.GraftFileIndex]] receives the pushed dataFilters
    * at planning time, translates them, and runs the same three-tier
    * prune. The builder REQUIREs (a) files were skipped, (b) the
    * decision is IDENTICAL (same opened count) to `readWhere` with the
    * equivalent StatsPred — front-door/Scala-API parity, (c) the
    * physical plan carries PushedFilters (parquet row-group skipping
    * sees the predicate too). The oracle is the plain filtered
    * aggregate — equality proves the planner-driven skip dropped no
    * qualifying file, and the filter Spark evaluates on the opened
    * rows is the residual that makes pruning correctness-neutral.
    */
  private val formatRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q128FormatPushdown(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.{GraftFileIndex, SnapshotStore}
    val root = formatRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-snapfmt-").toString
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"))
      SnapshotStore.commitOverwrite(
        li.filter(col("l_orderkey") % 3 =!= 0), dir)
      SnapshotStore.commitAppend(
        li.filter(col("l_orderkey") % 3 === 0), dir)
      SnapshotStore.optimize(spark, dir, targetFiles = 16,
        zorderBy = Seq("l_orderkey", "l_suppkey"))
      dir
    })
    val df = spark.read.format("graft").load(root)
      .filter(col("l_orderkey").between(2000, 3500))
    val plan = df.queryExecution.executedPlan.toString
    require(plan.contains("PushedFilters"),
      s"planner must push the range into the parquet scan:\n$plan")
    df.count() // drive listFiles with the pushed dataFilters
    val rep = GraftFileIndex.lastReport(root).getOrElse(
      sys.error("front-door scan left no report"))
    require(rep.filesOpened < rep.filesListed,
      s"planner-driven prune must skip files on the z-ordered " +
        s"layout: $rep")
    val (_, repRef) = SnapshotStore.readWhere(spark, root,
      SnapshotStore.StatsPred.Between("l_orderkey", 2000L, 3500L))
    require(rep.filesOpened == repRef.filesOpened,
      s"front door and Scala API must make the same decision: " +
        s"format=$rep readWhere=$repRef")
    df.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(centsOf(col("l_extendedprice")))
          .as("cents"))
      .orderBy("l_returnflag")
  }

  /** q129: PREDICATE-LEVEL DELETE ([[graft.sources.SnapshotStore
    * .deleteWhere]]) — the GDPR shape `DELETE FROM orders WHERE
    * o_orderkey BETWEEN lo AND hi` as a PURE METADATA commit: orders
    * lands range-clustered on o_orderkey in 16 files, the delete
    * window spans the second quarter of the key domain (deterministic
    * at every SF: lo = min + span/4, hi = min + span/2, re-derived by
    * the oracle with the same integer arithmetic), and the builder
    * REQUIREs (a) ZERO data files written or read by the delete — the
    * new manifest's files are a strict SUBSET of v0's, (b) the fully-
    * covered middle files DROPPED from the manifest outright
    * (stats-proven all-matching), (c) exactly one predicate layer, and
    * (d) fold parity — OPTIMIZE's rewritten table aggregates
    * identically to the layered read the gate serves. The oracle is
    * the complement-filtered aggregate straight from orders; hash
    * equality proves the predicate fold (NOT coalesce(p, false))
    * removed exactly the matching rows.
    */
  private val deleteRoot = scala.collection.concurrent.TrieMap
    .empty[String, (String, Int)]

  def q129DeleteWhere(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    def agg(df: DataFrame): DataFrame =
      df.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(centsOf(col("o_totalprice"))).as("cents"))
        .orderBy("o_orderpriority")
    val (root, delV) = deleteRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-snapdel-").toString
      SnapshotStore.commitOverwrite(
        Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), col("o_orderpriority"))
          .repartitionByRange(16, col("o_orderkey")), dir)     // v0
      val v0 = SnapshotStore.snapshot(dir).get
      val (kMin, kMax) = Tables.orders(spark, sfDir)
        .agg(min(col("o_orderkey")), max(col("o_orderkey")))
        .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).head()
      val span = kMax - kMin
      val v = SnapshotStore.deleteWhere(spark, dir,
        SnapshotStore.StatsPred.Between("o_orderkey",
          kMin + span / 4, kMin + span / 2))                   // v1
      val m = SnapshotStore.snapshot(dir).get
      require(m.files.toSet.subsetOf(v0.files.toSet) &&
          m.files.size < v0.files.size,
        s"delete must be metadata-only AND drop fully-covered files " +
          s"(v0 ${v0.files.size} files -> ${m.files.size})")
      require(m.layers.size == 1 && m.layers.head.pred.nonEmpty &&
          m.layers.head.files.isEmpty,
        s"delete must land as ONE data-less predicate layer: ${m.layers}")
      // fold parity: OPTIMIZE materializes the layered content; the
      // rewritten table must aggregate identically
      val layered = agg(SnapshotStore.read(spark, dir, Some(v))).collect()
      SnapshotStore.optimize(spark, dir, targetFiles = 4)      // v2
      val folded = agg(SnapshotStore.read(spark, dir)).collect()
      require(layered.sameElements(folded),
        "optimize fold must equal the layered read")
      (dir, v)
    })
    agg(SnapshotStore.read(spark, root, Some(delV)))
  }

  /** q130: PARTIAL BIN-PACK COMPACTION ([[graft.sources.SnapshotStore
    * .compactSmallFiles]]) — the incremental maintenance a full
    * OPTIMIZE is not: two LARGE base files (4/5 of orders) plus five
    * small appends (the remaining fifth in slices) accrete a 7-file
    * table; the compaction re-packs ONLY the five small files into one
    * (threshold derived from the measured on-disk sizes, require()d to
    * separate the populations) — the builder REQUIREs the two large
    * files survive BYTE-IDENTICAL under their original manifest paths,
    * the file count drops 7 → 3, and exactly one version is added. The
    * oracle is the plain full aggregate over orders — hash equality
    * proves re-packing moved every small-file row and dropped/duplicated
    * none. At 100 TB this is the cadence job on every append-heavy
    * table: O(small bytes) per run, never O(table).
    */
  private val compactRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q130CompactSmall(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = compactRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-snapcmp-").toString
      val o = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority"))
      SnapshotStore.commitOverwrite(
        o.filter(col("o_orderkey") % 5 =!= 0)
          .repartition(2), dir)                              // v0
      (0 until 5).foreach { r =>
        SnapshotStore.commitAppend(
          o.filter(col("o_orderkey") % 5 === 0 &&
            pmod(floor(col("o_orderkey") / 5), lit(5)) === r)
            .coalesce(1), dir)                             // v1..v5
      }
      val before = SnapshotStore.snapshot(dir).get
      require(before.files.size == 7,
        s"expected 2 large + 5 small files, got ${before.files.size}")
      val sizes = before.files.map(f => f ->
        java.nio.file.Files.size(java.nio.file.Paths.get(dir, f))).toMap
      val sorted = sizes.values.toSeq.sorted
      val (smallMax, bigMin) = (sorted(4), sorted(5))
      require(smallMax < bigMin,
        s"size populations must separate: smallMax=$smallMax " +
          s"bigMin=$bigMin")
      val big = sizes.filter(_._2 >= bigMin).keys.toSet
      val v = SnapshotStore.compactSmallFiles(spark, dir,
        maxBytes = (smallMax + bigMin) / 2)
      val after = SnapshotStore.snapshot(dir).get
      require(v == before.version + 1 && after.files.size == 3,
        s"compaction must pack 5 small files into 1 " +
          s"(v$v, ${after.files.size} files)")
      require(big.subsetOf(after.files.toSet) && big.forall(f =>
          java.nio.file.Files.size(
            java.nio.file.Paths.get(dir, f)) == sizes(f)),
        "large files must survive byte-untouched under their paths")
      dir
    })
    SnapshotStore.read(spark, root)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(centsOf(col("o_totalprice"))).as("cents"))
      .orderBy("o_orderpriority")
  }

  /** q131: LAYERED TABLE THROUGH THE SPARK-NATIVE FRONT DOOR
    * ([[graft.sources.GraftLayerFoldRule]]) — the r17 seam closed:
    * a table with a LIVE merge-on-read layer (the steady state of any
    * CDC-streamed table, q126's shape) read through
    * `spark.read.format("graft")`, where the injected analyzer rule
    * folds the layer over the base relation DURING RESOLUTION so the
    * whole optimizer works on the folded plan: the gate's range filter
    * pushes through the fold's union and anti-join into the BASE scan
    * and prunes files through the manifest stats tier. The builder
    * REQUIREs (a) the manifest still carries its layer (nothing was
    * folded into data files), (b) PushedFilters in the executed plan,
    * (c) files skipped on the base scan THROUGH the fold
    * (files_opened < files_listed), and (d) decision parity with the
    * rule-free Scala path ([[graft.sources.SnapshotStore.readWhere]],
    * which prunes then folds). The oracle is q125's winner-fold
    * restated with the same deterministic mid-domain range
    * (lo = mn + span/4, hi = mn + span/2, integer arithmetic re-derived
    * from orders) — hash equality proves the planner-served fold
    * returns exactly the merged rows of the slice.
    */
  private val layeredFmtRoot = scala.collection.concurrent.TrieMap
    .empty[String, (String, Long, Long)]

  def q131LayeredFormat(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.{GraftFileIndex, SnapshotStore}
    val (root, lo, hi) = layeredFmtRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-snaplyr-").toString
      SnapshotStore.commitOverwrite(
        morBase(spark, sfDir)
          .repartitionByRange(16, col("o_orderkey")), dir)     // v0
      val baseFiles = SnapshotStore.snapshot(dir).get.files
      SnapshotStore.mergeOnRead(spark, dir, morChangelog(spark, sfDir),
        key = "o_orderkey", versionCol = "vord", deleteCol = "del",
        skipPartialAgg = true)                                 // v1
      val m = SnapshotStore.snapshot(dir).get
      require(m.files == baseFiles && m.layers.size == 1,
        s"layered front-door gate needs a LIVE layer over an " +
          s"untouched base (files ${m.files.size} vs " +
          s"${baseFiles.size}, layers ${m.layers.size})")
      val (kMin, kMax) = Tables.orders(spark, sfDir)
        .agg(min(col("o_orderkey")), max(col("o_orderkey")))
        .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).head()
      val span = kMax - kMin
      (dir, kMin + span / 4, kMin + span / 2)
    })
    val df = spark.read.format("graft").load(root)
      .filter(col("o_orderkey").between(lo, hi))
    val plan = df.queryExecution.executedPlan.toString
    require(plan.contains("PushedFilters"),
      s"the range must push through the layer fold into the base " +
        s"parquet scan:\n$plan")
    df.count() // drive the base listFiles with the pushed dataFilters
    val rep = GraftFileIndex.lastReport(root).getOrElse(
      sys.error("layered front-door scan left no report"))
    require(rep.filesOpened < rep.filesListed,
      s"planner-driven prune must skip base files through the fold: " +
        s"$rep")
    val (_, repRef) = SnapshotStore.readWhere(spark, root,
      SnapshotStore.StatsPred.Between("o_orderkey", lo, hi))
    require(rep.filesOpened == repRef.filesOpened,
      s"front door and Scala API must make the same base-prune " +
        s"decision: format=$rep readWhere=$repRef")
    df.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"),
        sum(centsOf(col("o_totalprice"))).as("cents"))
      .orderBy("o_orderpriority")
  }

  /** q132: NAMED-TABLE SQL CATALOG ([[graft.sources.GraftSqlCatalog]])
    * — q121's pinned cross-table join restated as PURE SQL BY NAME, no
    * path strings anywhere in the query: the multi-table [[graft
    * .sources.Catalog]] registers as a Spark `TableCatalog`
    * (`spark.sql.catalog.graft`), `graft.main.t_main` / `t_price`
    * resolve through it, and `VERSION AS OF 0` pins CATALOG version 0
    * on both sides — the join must be immune to catalog v1's t_price
    * overwrite, which the shared oracle (q121's) proves by hash. The
    * builder REQUIREs the catalog head has moved past the pin (v1
    * exists) and that the scan actually routed through the
    * [[graft.sources.GraftFileIndex]] relation the injected
    * [[graft.sources.GraftCatalogRelationRule]] swaps in (the plan
    * names it) — i.e. SQL-by-name gets the same prunable scan as every
    * other front door. DDL (CREATE/DROP) and SQL DELETE routing are
    * spec-pinned in GraftSqlCatalogSpec.
    */
  def q132CatalogSqlJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.Catalog
    val root = catalogRootFor(spark, sfDir)
    require(Catalog.versions(root).max >= 1,
      "gate needs a catalog commit ABOVE the pinned version")
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
    val df = spark.sql(
      """SELECT m.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(p.o_totalprice * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS cents
         FROM graft.main.t_main VERSION AS OF 0 m
         JOIN graft.main.t_price VERSION AS OF 0 p
           ON m.o_orderkey = p.o_orderkey
         GROUP BY m.o_orderpriority
         ORDER BY m.o_orderpriority""")
    val plan = df.queryExecution.executedPlan.toString
    require(plan.contains("GraftFileIndex"),
      s"SQL-by-name must scan through the graft relation:\n$plan")
    df
  }

  /** q134: INCREMENTAL RE-CLUSTER ([[graft.sources.SnapshotStore
    * .optimizeIncremental]]) — clustering-spec evolution closed: the
    * spec (`zorderBy`) is RECORDED in the manifest by OPTIMIZE and
    * carried by appends, so the maintenance job takes no arguments.
    * Corpus: 3/4 of orders (key%4≠0) z-ordered on o_orderkey into 16
    * range-disjoint files; one append lands the key%4=0 rows of the TOP
    * key quarter (the realistic "new data has recent keys" shape) —
    * straddling only the top ~4 clustered files. The incremental
    * re-cluster must rewrite ONLY that overlap group: the builder
    * REQUIREs (a) a strict subset of files rewritten with rewritten
    * bytes ≤ 1/2 of the table (expected ~1/4), (b) every untouched
    * file byte-identical under its original manifest path, (c) PRUNING
    * PARITY — a lower-half range probe opens exactly as many files as
    * on the pre-append fully-clustered snapshot (those files ARE the
    * original files), and (d) a top-region probe still prunes. The
    * oracle recomputes the content (base ∪ top-quarter slice) as a
    * filtered aggregate — hash equality proves the re-sort moved every
    * overlapping row and dropped/duplicated none. At 100 TB this is
    * the nightly layout job: O(straddled bytes), never O(table).
    */
  private val reclusterRoot = scala.collection.concurrent.TrieMap
    .empty[String, String]

  def q134IncrementalRecluster(spark: SparkSession,
      sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    import SnapshotStore.StatsPred.Between
    val root = reclusterRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-snaprec-").toString
      val o = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority"))
      val (kMin, kMax) = Tables.orders(spark, sfDir)
        .agg(min(col("o_orderkey")), max(col("o_orderkey")))
        .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).head()
      val top = kMin + 3 * (kMax - kMin) / 4
      SnapshotStore.commitOverwrite(
        o.filter(col("o_orderkey") % 4 =!= 0), dir)            // v0
      SnapshotStore.optimize(spark, dir, targetFiles = 16,
        zorderBy = Seq("o_orderkey"))                          // v1
      val m1 = SnapshotStore.snapshot(dir).get
      require(m1.cluster == Seq("o_orderkey"),
        s"optimize must record the clustering spec, got ${m1.cluster}")
      SnapshotStore.commitAppend(
        o.filter(col("o_orderkey") % 4 === 0 &&
          col("o_orderkey") >= top).coalesce(1), dir)          // v2
      val m2 = SnapshotStore.snapshot(dir).get
      require(m2.cluster == Seq("o_orderkey"),
        "append must carry the clustering spec forward")
      val v3 = SnapshotStore.optimizeIncremental(spark, dir)   // v3
      require(v3 == m2.version + 1, s"recluster must commit, got $v3")
      val m3 = SnapshotStore.snapshot(dir).get
      val untouched = m3.files.toSet intersect m2.files.toSet
      val rewritten = m2.files.toSet -- m3.files.toSet
      require(untouched.nonEmpty && rewritten.nonEmpty &&
          rewritten.size < m2.files.size,
        s"must rewrite a strict non-empty subset: ${rewritten.size} " +
          s"of ${m2.files.size}")
      val sz2 = SnapshotStore.fileSizes(dir, m2)
      val ratio = rewritten.toSeq.map(sz2).sum.toDouble /
        m2.files.map(sz2).sum
      require(ratio <= 0.5,
        f"incremental recluster must rewrite a fraction of the " +
          f"table's bytes, got $ratio%.2f")
      untouched.foreach { f =>
        require(java.nio.file.Files.size(
            java.nio.file.Paths.get(dir, f)) == sz2(f),
          s"untouched file $f must survive byte-identical") }
      // pruning parity: a lower-half probe opens exactly the files the
      // fully-clustered pre-append snapshot opened (same files)
      val probe = Between("o_orderkey",
        kMin + (kMax - kMin) / 8, kMin + (kMax - kMin) / 4)
      val (_, repInc) = SnapshotStore.readWhere(spark, dir, probe)
      val (_, repFull) = SnapshotStore.readWhere(spark, dir, probe,
        version = Some(m1.version))
      require(repInc.filesOpened == repFull.filesOpened,
        s"lower-half pruning parity: inc=$repInc full=$repFull")
      // the rewritten top region prunes too (disjoint again)
      val (_, repTop) = SnapshotStore.readWhere(spark, dir,
        Between("o_orderkey", kMin + 7 * (kMax - kMin) / 8, kMax))
      require(repTop.filesOpened < m3.files.size,
        s"top-region probe must prune: $repTop of ${m3.files.size}")
      dir
    })
    SnapshotStore.read(spark, root)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(centsOf(col("o_totalprice"))).as("cents"))
      .orderBy("o_orderpriority")
  }

  /** q135: SQL DML LIFECYCLE — the whole catalog write surface as ONE
    * pure-SQL sequence over a fresh table, hash-checked end to end:
    * CTAS from orders (createTable + AppendData through the V1Write
    * bridge), a metadata-only DELETE (second key quarter, the q129
    * window — REQUIREd to land as a data-less predicate layer), an
    * INSERT INTO ... SELECT of key-shifted rows (shift = span+1, so
    * inserts can't collide with the delete window), and an ALTER TABLE
    * ADD COLUMNS (REQUIREd data-less). The gated aggregate groups the
    * FINAL table per priority with integer cents and COUNT(tag) — the
    * evolved column must read NULL off every pre-evolution file. The
    * oracle replays the arithmetic straight from orders (complement of
    * the delete window UNION the shifted slice; n_tag = 0), so hash
    * equality proves the four statements composed exactly. The builder
    * also REQUIREs the catalog version count (one transaction per
    * statement, CTAS = create + insert).
    */
  private val dmlRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q135SqlDml(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.Catalog
    val root = dmlRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-sqldml-").toString
      spark.conf.set("spark.sql.catalog.graft",
        "graft.sources.GraftSqlCatalog")
      spark.conf.set("spark.sql.catalog.graft.root", dir)
      val view = "q135_src_" +
        java.lang.Integer.toHexString(sfDir.hashCode)
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderpriority"))
        .createOrReplaceTempView(view)
      val (kMin, kMax) = Tables.orders(spark, sfDir)
        .agg(min(col("o_orderkey")), max(col("o_orderkey")))
        .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).head()
      val span = kMax - kMin
      val (lo, hi) = (kMin + span / 4, kMin + span / 2)
      val shift = span + 1
      spark.sql(s"CREATE TABLE graft.main.dml AS SELECT * FROM $view")
      spark.sql(s"DELETE FROM graft.main.dml WHERE o_orderkey " +
        s"BETWEEN $lo AND $hi")
      val afterDelete = Catalog.tableManifest(dir, "dml").get
      require(afterDelete.layers.size == 1 &&
          afterDelete.layers.head.pred.nonEmpty &&
          afterDelete.layers.head.files.isEmpty,
        s"SQL DELETE must land as one data-less predicate layer: " +
          s"${afterDelete.layers}")
      spark.sql(s"INSERT INTO graft.main.dml SELECT o_orderkey + " +
        s"$shift, o_custkey, o_totalprice, o_orderpriority FROM $view " +
        s"WHERE o_orderkey % 10 = 0")
      val beforeAlter = Catalog.tableManifest(dir, "dml").get
      spark.sql("ALTER TABLE graft.main.dml ADD COLUMNS (tag STRING)")
      val afterAlter = Catalog.tableManifest(dir, "dml").get
      require(afterAlter.files == beforeAlter.files &&
          afterAlter.schemaDdl != beforeAlter.schemaDdl,
        "ALTER must widen the schema over the SAME files")
      // one catalog transaction per statement: CTAS (create + insert),
      // DELETE, INSERT, ALTER -> versions 0..4
      require(Catalog.versions(dir) == (0 to 4),
        s"expected 5 catalog versions, got ${Catalog.versions(dir)}")
      dir
    })
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
    spark.sql(
      """SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS cents,
           CAST(COUNT(tag) AS BIGINT) AS n_tag
         FROM graft.main.dml
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""")
  }

  /** q136: SQL `MERGE INTO` on the named catalog
    * ([[graft.sources.GraftMergeIntoCommand]] via the analyzer-rule
    * conversion) — the single most common lakehouse DML statement, now
    * pure SQL end to end: the shared q122/q125 changelog is folded to
    * its per-key winners (SQL MERGE requires one source row per target
    * row — the command's cardinality rule refuses otherwise) and merged
    * into the catalog table with the canonical three-clause shape
    * (MATCHED+del→DELETE, MATCHED→UPDATE, NOT MATCHED ∧ ¬del→INSERT).
    * The builder REQUIREs the whole statement committed as ONE catalog
    * transaction (versions 0→1). The gated aggregate reads the merged
    * table BY NAME (same front door as q132); the oracle is q122's
    * winner-fold restated — hash equality proves the SQL merge
    * materialized exactly the changelog fold that the Scala
    * [[graft.sources.SnapshotStore.merge]] (q122) and the layered
    * merge-on-read (q125) produce. Cost shape: one CoW join commit,
    * O(base + source) — the Delta CoW MERGE lane; the O(changes)
    * streaming lane stays [[graft.sources.SnapshotStore
    * .mergeOnReadOnce]] (q126).
    */
  private val sqlMergeRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q136SqlMerge(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.Catalog
    val root = sqlMergeRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-sqlmerge-").toString
      spark.conf.set("spark.sql.catalog.graft",
        "graft.sources.GraftSqlCatalog")
      spark.conf.set("spark.sql.catalog.graft.root", dir)
      Catalog.commit(dir, Map("mrg" ->
        ((morBase(spark, sfDir), Catalog.Overwrite))))      // catalog v0
      // per-key winners (vpack makes max_by(vord) total per key) — the
      // changelog-to-MERGE-source fold every CDC runbook performs
      val ch = morChangelog(spark, sfDir)
      val winners = ch.groupBy(col("o_orderkey"))
        .agg(max_by(struct(col("del"), col("o_custkey"),
          col("o_totalprice"), col("o_orderpriority")), col("vord"))
          .as("w"))
        .select(col("o_orderkey"), col("w.del").as("del"),
          col("w.o_custkey").as("o_custkey"),
          col("w.o_totalprice").as("o_totalprice"),
          col("w.o_orderpriority").as("o_orderpriority"))
      val view = "q136_src_" +
        java.lang.Integer.toHexString(sfDir.hashCode)
      winners.createOrReplaceTempView(view)
      spark.sql(
        s"""MERGE INTO graft.main.mrg t USING $view s
           ON t.o_orderkey = s.o_orderkey
           WHEN MATCHED AND s.del THEN DELETE
           WHEN MATCHED THEN UPDATE SET
             o_custkey = s.o_custkey,
             o_totalprice = s.o_totalprice,
             o_orderpriority = s.o_orderpriority
           WHEN NOT MATCHED AND NOT s.del THEN
             INSERT (o_orderkey, o_custkey, o_totalprice,
               o_orderpriority)
             VALUES (s.o_orderkey, s.o_custkey, s.o_totalprice,
               s.o_orderpriority)""")
      require(Catalog.versions(dir) == Seq(0, 1),
        s"MERGE must commit as ONE catalog transaction: " +
          s"${Catalog.versions(dir)}")
      dir
    })
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
    spark.sql(
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS cents
         FROM graft.main.mrg
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""")
  }

  /** q137: SQL `UPDATE ... WHERE` on the named catalog
    * ([[graft.sources.GraftUpdateCommand]]) taking the LAYER-PAIR lane:
    * the WHERE translates to the stats language, so the statement
    * commits as ONE catalog transaction carrying a data-less predicate
    * layer (suppresses the old versions; stats-proven fully-covered
    * base files drop outright) plus one add-only layer with the
    * rewritten rows AND their harvested stats — O(changed rows)
    * written, base files byte-untouched. The builder REQUIREs the
    * transaction count, the exact layer-pair shape, and PRUNING PARITY:
    * a probe outside the updated window opens exactly as many files at
    * the updated version as at the pre-update version (the add-only
    * layer's files all skip through their layer-carried sidecar — the
    * r18-verdict stats-retention item made observable). The oracle
    * replays the filtered rewrite straight from orders.
    */
  private val sqlUpdateRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q137SqlUpdate(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.{Catalog, SnapshotStore}
    import SnapshotStore.StatsPred.Between
    val root = sqlUpdateRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-sqlupd-").toString
      spark.conf.set("spark.sql.catalog.graft",
        "graft.sources.GraftSqlCatalog")
      spark.conf.set("spark.sql.catalog.graft.root", dir)
      val base = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority"))
        .repartitionByRange(8, col("o_orderkey"))
      Catalog.commit(dir, Map("upd" -> ((base, Catalog.Overwrite))))
      val (kMin, kMax) = Tables.orders(spark, sfDir)
        .agg(min(col("o_orderkey")), max(col("o_orderkey")))
        .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).head()
      val span = kMax - kMin
      val (lo, hi) = (kMin + span / 4, kMin + span / 2)
      spark.sql(s"UPDATE graft.main.upd SET " +
        s"o_totalprice = o_totalprice + 1, " +
        s"o_orderpriority = concat('U-', o_orderpriority) " +
        s"WHERE o_orderkey BETWEEN $lo AND $hi")
      require(Catalog.versions(dir) == Seq(0, 1),
        s"UPDATE must commit as ONE catalog transaction: " +
          s"${Catalog.versions(dir)}")
      val m = Catalog.tableManifest(dir, "upd").get
      require(m.layers.size == 2 && m.layers.head.pred.nonEmpty &&
          m.layers.head.files.isEmpty && m.layers.last.key.isEmpty &&
          m.layers.last.pred.isEmpty && m.layers.last.files.nonEmpty &&
          m.layers.last.statsFile.nonEmpty,
        "translatable WHERE must land as the data-less-delete + " +
          s"add-only(stats) layer pair: ${m.layers}")
      // pruning parity outside the window: the add-only layer's files
      // (key ranges inside [lo,hi]) must ALL skip via their sidecar —
      // same opened count as the pre-update version; the layer files
      // are listed (attributed) but never opened
      val probe = Between("o_orderkey",
        kMin + 7 * span / 8, kMax)
      val (_, repNew) = Catalog.readTableWhere(spark, dir, "upd", probe)
      val (_, repOld) = Catalog.readTableWhere(spark, dir, "upd", probe,
        version = Some(0))
      // (v1 may LIST fewer base files than v0 — deleteTransform drops
      // stats-proven fully-covered ones — but must OPEN the same set
      // for a probe outside the window, plus zero layer files)
      require(repNew.filesOpened == repOld.filesOpened &&
          repNew.filesListed ==
            m.files.size + m.layers.last.files.size,
        s"updated rows must stay prunable: new=$repNew old=$repOld " +
          s"layerFiles=${m.layers.last.files.size} base=${m.files.size}")
      dir
    })
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
    spark.sql(
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS cents
         FROM graft.main.upd
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""")
  }

  /** q138: NAMED-TABLE STREAMING round trip — the q133 lakehouse loop
    * with ZERO path strings: `readStream.table("graft.main.src")` (the
    * catalog ROW source — appended rows per catalog version, detected
    * metadata-first from the manifests) through
    * `writeStream.toTable("graft.main.out")` (executor-written parquet
    * files, ONE txn-deduped catalog transaction per epoch). The builder
    * runs a REAL streaming query three times on one checkpoint: the
    * initial pump streams the v1 append, a mid-stream append arrives
    * incrementally on restart (the metadataPath-pinned cursor), and a
    * third pump replays nothing (versions REQUIREd unchanged — the
    * empty-epoch skip plus txn dedup). Source and sink SHARE the
    * catalog, so the sink's own commits exercise the source's
    * unchanged-manifest fast path (metadata-only, no data I/O). The
    * gated aggregate reads the OUT table by name (front-door relation
    * REQUIREd in the plan); the oracle recomputes thirds 1+2 straight
    * from orders — hash equality proves the named loop moved exactly
    * the appended rows, once.
    */
  private val namedStreamRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q138NamedStream(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.Catalog
    val root = namedStreamRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-namedstream-").toString
      spark.conf.set("spark.sql.catalog.graft",
        "graft.sources.GraftSqlCatalog")
      spark.conf.set("spark.sql.catalog.graft.root", dir)
      val o = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority"))
      Catalog.commit(dir, Map("src" ->
        ((o.filter(col("o_orderkey") % 3 === 0), Catalog.Overwrite))))
      Catalog.commit(dir, Map("out" ->
        ((o.limit(0), Catalog.Overwrite))))
      Catalog.commit(dir, Map("src" ->
        ((o.filter(col("o_orderkey") % 3 === 1), Catalog.Append))))
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-namedstream-ckpt-").toString
      def pump(): Unit = {
        val q = spark.readStream
          .option("startingVersion", "1") // after the out-table create
          .table("graft.main.src")
          .writeStream.option("checkpointLocation", ckpt)
          .outputMode("append").toTable("graft.main.out")
        q.processAllAvailable(); q.stop()
      }
      pump()
      val n1 = Catalog.readTable(spark, dir, "out").count()
      // mid-stream append arrives incrementally on the SAME checkpoint
      Catalog.commit(dir, Map("src" ->
        ((o.filter(col("o_orderkey") % 3 === 2), Catalog.Append))))
      pump()
      val n2 = Catalog.readTable(spark, dir, "out").count()
      require(n2 > n1 && n1 > 0,
        s"incremental arrival expected: first=$n1 second=$n2")
      // replay pump: no new rows, NO new catalog versions (empty-epoch
      // skip + txn dedup)
      val head = Catalog.versions(dir).max
      pump()
      require(Catalog.versions(dir).max == head,
        "a replay pump must commit nothing")
      require(Catalog.readTable(spark, dir, "out").count() == n2,
        "a replay pump must emit nothing")
      // every data epoch committed as ONE txn-tagged catalog transaction
      val txns = Catalog.versions(dir)
        .flatMap(v => Catalog.tableManifest(dir, "out", Some(v)))
        .map(_.txn).filter(_.nonEmpty).distinct
      require(txns.size == 2,
        s"expected 2 data epochs (one per pump with data), got $txns")
      dir
    })
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
    val df = spark.sql(
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
             AS BIGINT) AS cents
         FROM graft.main.out
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""")
    require(df.queryExecution.executedPlan.toString
        .contains("GraftFileIndex"),
      "the named read must route through the graft front door")
    df
  }

  /** q139: SQL METADATA TABLES ([[graft.sources.GraftMetaTables]]) —
    * the Iceberg/Delta introspection surface over the named catalog:
    * `graft.main.t.history` (one row per commit that changed t,
    * operation classified from pure manifest algebra), `t.files`
    * (every referenced file with sidecar-carried rows/sizes and
    * base/segment/layer attribution), `t.detail` (one-row summary) —
    * all VERSION AS OF-travelable and pinned per statement like every
    * other front door. The gate drives a four-statement SQL lifecycle
    * (CREATE, INSERT, DELETE, INSERT — the last landing as an add-only
    * layer on the now-layered table) and reads it back ENTIRELY through
    * the metadata tables: the history op/version/layer sequence, the
    * pre-delete files rowcount via time travel (post-delete base counts
    * are layout-dependent — deleteTransform drops provably-all-matching
    * files), the add-only layer's rowcount, and the detail summary. The
    * oracle restates the expected constants from orders. Everything is
    * manifest-derived — zero data-file reads in the whole gated query
    * (the builder require()s the plan is scan-free). */
  private val metaTablesRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q139MetaTables(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.Catalog
    val root = metaTablesRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-metatables-").toString
      spark.conf.set("spark.sql.catalog.graft",
        "graft.sources.GraftSqlCatalog")
      spark.conf.set("spark.sql.catalog.graft.root", dir)
      val view = "q139_src_" +
        java.lang.Integer.toHexString(sfDir.hashCode)
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_totalprice"))
        .createOrReplaceTempView(view)
      val (kMin, kMax) = Tables.orders(spark, sfDir)
        .agg(min(col("o_orderkey")), max(col("o_orderkey")))
        .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).head()
      val span = kMax - kMin
      val (lo, hi) = (kMin + span / 4, kMin + span / 2)
      val shift = span + 1
      spark.sql("CREATE TABLE graft.main.meta " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE) USING graft") // v0
      spark.sql(s"INSERT INTO graft.main.meta SELECT o_orderkey, " +
        s"o_totalprice FROM $view WHERE o_orderkey % 4 = 0")     // v1
      spark.sql(s"DELETE FROM graft.main.meta WHERE o_orderkey " +
        s"BETWEEN $lo AND $hi")                                  // v2
      spark.sql(s"INSERT INTO graft.main.meta SELECT o_orderkey + " +
        s"$shift, o_totalprice FROM $view WHERE o_orderkey % 10 = 0") // v3
      require(Catalog.versions(dir) == (0 to 3),
        s"expected 4 catalog versions, got ${Catalog.versions(dir)}")
      val m = Catalog.tableManifest(dir, "meta").get
      require(m.layers.size == 2 && m.layers(0).pred.nonEmpty &&
          m.layers(0).files.isEmpty && m.layers(1).key.isEmpty &&
          m.layers(1).pred.isEmpty,
        s"expected pred layer + add-only layer, got ${m.layers}")
      dir
    })
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
    val df = spark.sql(
      """SELECT part, k, op, v1, v2 FROM (
           SELECT 'h' AS part, CAST(catalog_version AS BIGINT) AS k,
                  operation AS op, CAST(table_version AS BIGINT) AS v1,
                  CAST(n_layers AS BIGINT) AS v2
           FROM graft.main.meta.history
           UNION ALL
           SELECT 'f0', CAST(-1 AS BIGINT), 'rows',
                  CAST(SUM(rows) AS BIGINT), CAST(0 AS BIGINT)
           FROM graft.main.meta.files VERSION AS OF 1
           UNION ALL
           SELECT 'f', CAST(2 AS BIGINT), 'rows',
                  CAST(SUM(rows) AS BIGINT), CAST(0 AS BIGINT)
           FROM graft.main.meta.files WHERE layer = 2
           UNION ALL
           SELECT 'd', CAST(-2 AS BIGINT), 'detail',
                  CAST(table_version AS BIGINT),
                  CAST(n_layers AS BIGINT)
           FROM graft.main.meta.detail
         ) ORDER BY part, k""")
    // the whole gated query is manifest metadata — no data-file scan
    require(!df.queryExecution.executedPlan.toString
        .contains("GraftFileIndex"),
      "metadata tables must not scan data files")
    df
  }

  /** q140: the SQL CHANGE FEED — `SELECT ... FROM graft.main.t.changes`
    * ([[graft.sources.GraftChangesTable]]): the full CDC lifecycle
    * (CREATE → INSERT → DELETE → INSERT → UPDATE) read back as tagged
    * per-catalog-version diffs, every row hash-checked against the
    * oracle's replay of the same five statements straight from orders.
    * The builder REQUIREs the optimization-time branch-pruning
    * property: a `_commit_version` predicate deletes other versions'
    * scans from the optimized plan (each branch tags the version as a
    * LITERAL, so Catalyst's constant folding + empty-relation
    * propagation — not a runtime filter — implements version-range
    * selection; at 10³ versions a consumer reading the last commit
    * plans one diff, not 10³).
    */
  private val sqlChangesRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q140SqlChanges(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.Catalog
    val root = sqlChangesRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-sqlchg-").toString
      spark.conf.set("spark.sql.catalog.graft",
        "graft.sources.GraftSqlCatalog")
      spark.conf.set("spark.sql.catalog.graft.root", dir)
      val view = "q140_src_" +
        java.lang.Integer.toHexString(sfDir.hashCode)
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_totalprice"))
        .createOrReplaceTempView(view)
      val (kMin, kMax) = Tables.orders(spark, sfDir)
        .agg(min(col("o_orderkey")), max(col("o_orderkey")))
        .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).head()
      val span = kMax - kMin
      val (lo, hi) = (kMin + span / 4, kMin + span / 2)
      val shift = span + 1
      spark.sql("CREATE TABLE graft.main.chg " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE) USING graft")  // v0
      spark.sql(s"INSERT INTO graft.main.chg SELECT o_orderkey, " +
        s"o_totalprice FROM $view WHERE o_orderkey % 7 = 0")     // v1
      spark.sql(s"DELETE FROM graft.main.chg WHERE o_orderkey " +
        s"BETWEEN $lo AND $hi")                                  // v2
      spark.sql(s"INSERT INTO graft.main.chg SELECT o_orderkey + " +
        s"$shift, o_totalprice FROM $view WHERE o_orderkey % 11 = 0") // v3
      spark.sql("UPDATE graft.main.chg SET " +
        "o_totalprice = o_totalprice + 1 WHERE o_orderkey % 3 = 0") // v4
      require(Catalog.versions(dir) == (0 to 4),
        s"expected 5 catalog versions, got ${Catalog.versions(dir)}")
      // the scale property: a version predicate prunes other branches'
      // SCANS out of the optimized plan (literal fold, not row filter).
      // Probed HERE, with the fixture, not per query invocation: each
      // probe is a full analyze+optimize of the 5-branch feed plan —
      // lifecycle-invariant work that belongs with the lifecycle (r19
      // optimization; the requirement still runs on every Verify drive
      // and on the warm-up pass of every bench JVM).
      def scans(sql: String): Int =
        spark.sql(sql).queryExecution.optimizedPlan.collect {
          case l: org.apache.spark.sql.execution.datasources
            .LogicalRelation => l
        }.size
      val fullScans = scans("SELECT * FROM graft.main.chg.changes")
      val oneScans = scans("SELECT * FROM graft.main.chg.changes " +
        "WHERE _commit_version <= 1")
      require(oneScans < fullScans,
        s"version predicate must prune branch scans " +
          s"($oneScans !< $fullScans)")
      dir
    })
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
    spark.sql(
      """SELECT o_orderkey, o_totalprice, _change AS change,
           CAST(_n_rows AS BIGINT) AS n_rows,
           CAST(_commit_version AS BIGINT) AS commit_v
         FROM graft.main.chg.changes
         ORDER BY commit_v, change, o_orderkey""")
  }

  /** q141: COLUMN MAPPING through the SQL catalog — `ALTER TABLE ...
    * RENAME COLUMN` / `DROP COLUMN` as PURE METADATA over frozen
    * physical file names ([[graft.sources.SnapshotStore.logicalSchema]]):
    * the builder REQUIREs both ALTERs left the file list byte-identical
    * and the physical schema frozen, that a post-rename INSERT landed
    * physical-named files (schemaDdl unchanged), that a post-rename
    * UPDATE through the renamed column took the O(changes) layer-pair
    * lane, and PRUNING PARITY: a logical-name range probe still skips
    * files through the physical stats sidecar. The oracle replays the
    * lifecycle from orders under the renamed output names. At 100 TB
    * the two ALTERs cost one manifest write each — no data touched.
    */
  private val sqlColmapRoot =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q141SqlColmap(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.{Catalog, SnapshotStore}
    val root = sqlColmapRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-sqlcmap-").toString
      spark.conf.set("spark.sql.catalog.graft",
        "graft.sources.GraftSqlCatalog")
      spark.conf.set("spark.sql.catalog.graft.root", dir)
      val base = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority"))
        .repartitionByRange(8, col("o_orderkey"))
      Catalog.commit(dir, Map("cm" -> ((base, Catalog.Overwrite)))) // v0
      val m0 = Catalog.tableManifest(dir, "cm").get
      spark.sql(
        "ALTER TABLE graft.main.cm RENAME COLUMN o_totalprice TO price")
      spark.sql("ALTER TABLE graft.main.cm DROP COLUMN o_orderpriority")
      val m2 = Catalog.tableManifest(dir, "cm").get
      require(m2.files == m0.files && m2.schemaDdl == m0.schemaDdl,
        "RENAME/DROP COLUMN must be pure metadata (same files, frozen " +
          s"physical schema): ${m2.files.size} vs ${m0.files.size}")
      require(m2.logical == Seq("o_totalprice" -> "price") &&
          m2.dropped == Seq("o_orderpriority"),
        s"unexpected mapping: ${m2.logical} / ${m2.dropped}")
      val (kMin, kMax) = Tables.orders(spark, sfDir)
        .agg(min(col("o_orderkey")), max(col("o_orderkey")))
        .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).head()
      val span = kMax - kMin
      val (lo, hi) = (kMin + span / 4, kMin + span / 2)
      val shift = span + 1
      val view = "q141_src_" +
        java.lang.Integer.toHexString(sfDir.hashCode)
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_totalprice"))
        .createOrReplaceTempView(view)
      spark.sql(s"INSERT INTO graft.main.cm SELECT o_orderkey + " +
        s"$shift, o_totalprice * 2 FROM $view " +
        s"WHERE o_orderkey % 9 = 0")                               // v3
      val m3 = Catalog.tableManifest(dir, "cm").get
      require(m3.schemaDdl == m0.schemaDdl,
        "post-rename INSERT must write PHYSICAL-named files under " +
          "the frozen schema")
      spark.sql(s"UPDATE graft.main.cm SET price = price + 1 " +
        s"WHERE o_orderkey BETWEEN $lo AND $hi")                   // v4
      val m4 = Catalog.tableManifest(dir, "cm").get
      require(m4.layers.exists(_.pred.nonEmpty),
        s"translatable UPDATE through the mapping must take the " +
          s"layer-pair lane: ${m4.layers}")
      // pruning parity: a LOGICAL range probe outside the base's top
      // range must skip base files through the physical sidecar
      val (_, report) = Catalog.readTableWhere(spark, dir, "cm",
        SnapshotStore.StatsPred.Between("o_orderkey", kMin,
          kMin + span / 8))
      require(report.filesOpened < report.filesListed,
        s"stats pruning must survive the mapping: $report")
      dir
    })
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
    spark.sql(
      """SELECT o_orderkey, price FROM graft.main.cm
         ORDER BY o_orderkey""")
  }

  def q118Optimize(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.SnapshotStore
    val root = optimizeRoot.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-snapopt-").toString
      val o = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"))
      SnapshotStore.commitOverwrite(o.filter(col("o_orderkey") % 3 === 0), dir)
      SnapshotStore.commitAppend(o.filter(col("o_orderkey") % 3 === 1), dir)
      val before = SnapshotStore.snapshot(dir).get.files.size
      SnapshotStore.optimize(spark, dir, targetFiles = 1)
      val after = SnapshotStore.snapshot(dir).get.files.size
      require(after == 1 && after < before,
        s"optimize must compact the file list ($before -> $after)")
      dir
    })
    SnapshotStore.read(spark, root) // current = the optimized snapshot
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(centsOf(col("o_totalprice")))
          .as("cents"))
      .orderBy("o_orderpriority")
  }
}
