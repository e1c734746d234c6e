package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics as Spark plans — the pregel-lite family
  * next to [[graft.textops.Dedup]]'s pointer-jumping connected
  * components. Each iteration is one equi-join (edges ⋈ ranks on src) +
  * one aggregation (contributions per dst) — the exact message-passing
  * shape GraphX/Pregel schedules, but expressed declaratively so
  * Catalyst plans the joins (broadcast when ranks fit, shuffle
  * otherwise) and AQE handles skew. Hub nodes are safe: contributions
  * partial-aggregate map-side, so a 10⁷-degree hub reduces to one row
  * per map partition, and per-node state is one long.
  *
  * BIT-DETERMINISTIC across engines and run orders, like every numeric
  * operator here: ranks live on an integer grid (scaled by `Scale`) and
  * every step is integer arithmetic — contributions are `pr DIV outdeg`,
  * damping is `(15·S + 85·Σcontrib) DIV 100` — so there is no
  * floating-point accumulation-order seam, and the q98 DuckDB oracle
  * unrolls the same iterations in SQL and hash-matches the final ranks
  * exactly. The grid error per iteration is ≤ outdeg in scaled units
  * (~10⁻⁶ relative at the default scale), far below any ranking use.
  */
object Graph {

  /** The integer rank grid: initial rank per node, also the unit of all
    * per-iteration arithmetic. 10⁶ keeps 3-iteration sums of 10⁹-node
    * graphs far inside long range (Σ ranks ≈ n·S ≤ 10¹⁵).
    */
  val Scale: Long = 1000000L

  /** `iters` rounds of damped PageRank over a DIRECTED edge list
    * (`src`, `dst` long columns; parallel edges should be pre-deduped —
    * each surviving edge carries one contribution). Nodes = every id
    * appearing as src or dst; dangling nodes (no out-edges) contribute
    * nothing (their mass evaporates — the standard simplification; pass
    * a symmetrized edge list for the no-dangling variant). Returns
    * (node, pr) with pr on the integer grid; pr/Scale ≈ the conventional
    * damped rank with uniform teleport.
    *
    *   pr₀(v)    = Scale
    *   pr_{i+1}(v) = (15·Scale + 85·Σ_{u→v} (pr_i(u) DIV outdeg(u)))
    *                 DIV 100
    *
    * Each iteration: one join keyed on src (ranks are (node, pr) — the
    * small side at web scale, and only ids+longs ever shuffle) + one
    * map-side-combining aggregate per dst. The aggregate does DOUBLE
    * duty: the static (node, outdeg, contrib=null) base frame unions
    * into the message stream before the groupBy, so the same shuffle
    * that sums contributions also restores the full node set and its
    * degrees — the old per-iteration "withDeg LEFT JOIN contribs"
    * stage is folded away (measured one stage per iteration on q98:
    * the iteration cost IS the stage floor at sf0.1, and at fleet
    * scale the fold removes one node-keyed shuffle join per round;
    * both the union sides and the agg partial-aggregate map-side).
    *
    * iters is small and fixed (3-10 in practice): the unrolled plan
    * stays a static DAG — no driver loop per element. Past ~10 rounds
    * Catalyst re-optimization of the deepening lineage starts to bill
    * the driver; `checkpointEvery = k` cuts the lineage with a
    * localCheckpoint every k rounds (materializes the rank frame on
    * executors — adds a job per cut, worth it only at depth; 0 = off,
    * the right default at the common 3-10).
    */
  def pageRank(edges: DataFrame, iters: Int = 3,
      src: String = "src", dst: String = "dst",
      checkpointEvery: Int = 0, dedupEdges: Boolean = false): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters out of [1,20]: $iters")
    // The edge frame is consumed by EVERY iteration's src-keyed join (and
    // twice by the degree base). Materialize it ONCE, already hash-
    // partitioned on the join key: the cached plan advertises its
    // HashPartitioning, so each iteration's shuffle-hash join takes the
    // edge side exchange-free — one edge scan + one edge shuffle total,
    // regardless of iteration count. (Plan-level ReusedExchange gives the
    // same when it fires, but AQE re-optimization can sever it between
    // rounds — the persist makes the reuse structural, not optimizer
    // luck.)
    //
    // `dedupEdges = true` folds parallel-edge removal INTO this one
    // shuffle: HashPartitioning(src) satisfies the (src, dst) clustered
    // distribution, so the distinct() plans a single post-shuffle
    // aggregate — no second exchange, and no caller-side distinct()
    // whose partial aggregate builds full-size hash maps to dedup ~2%
    // (the q88 repartition-then-distinct lesson, applied to graphs).
    val e0 = edges.select(col(src).cast("long").as("graft_src"),
      col(dst).cast("long").as("graft_dst"))
      .repartition(col("graft_src"))
    val e = (if (dedupEdges) e0.distinct() else e0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // node set and out-degrees in ONE union-aggregate (src rows count 1,
    // dst rows count 0): replaces the distinct + degree-groupBy + left
    // join formulation — same result (deg 0 ⇒ null marks a pure sink),
    // two fewer node-keyed shuffles before the first iteration
    val withDeg = e.select(col("graft_src").as("node"), lit(1L).as("graft_d"))
      .unionAll(e.select(col("graft_dst").as("node"),
        lit(0L).as("graft_d")))
      .groupBy("node")
      .agg(sum("graft_d").as("graft_sumd"))
      .select(col("node"),
        when(col("graft_sumd") > 0, col("graft_sumd")).as("graft_deg"))
    val base = withDeg.select(col("node"), col("graft_deg"),
      lit(null).cast("long").as("graft_c"))
    var pr = withDeg.withColumn("pr", lit(Scale))
    for (i <- 1 to iters) {
      // pinned shuffle_hash: the rank frame is O(nodes) — at graph scale
      // it must NEVER broadcast (and letting the planner broadcast it at
      // small scale costs a broadcast-build job per iteration, the
      // crossdoc_ngrams AQE-hazard class). Co-partitioned instead: the
      // e-by-src exchange is IDENTICAL every round (ReusedExchange runs
      // it once), and the rank side arrives already hash-partitioned on
      // the join key from the previous round's node aggregate
      val msgs = e.hint("shuffle_hash")
        .join(pr.filter(col("graft_deg").isNotNull)
            .select(col("node").as("graft_src"),
              expr("pr DIV graft_deg").as("graft_c")),
          "graft_src")
        .select(col("graft_dst").as("node"),
          lit(null).cast("long").as("graft_deg"), col("graft_c"))
      pr = base.unionAll(msgs)
        .groupBy("node")
        .agg(max("graft_deg").as("graft_deg"),
          sum("graft_c").as("graft_in"))
        .select(col("node"), col("graft_deg"),
          expr(s"(${15 * Scale} + 85 * coalesce(graft_in, " +
            "CAST(0 AS BIGINT))) DIV 100").as("pr"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        pr = pr.localCheckpoint()
    }
    pr.select("node", "pr")
  }
}
