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
    * map-side-combining sum per dst. iters is small and fixed (3-10 in
    * practice): the unrolled plan stays a static DAG — no driver loop
    * per element, no RDD checkpointing needed at these depths.
    */
  def pageRank(edges: DataFrame, iters: Int = 3,
      src: String = "src", dst: String = "dst"): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters out of [1,20]: $iters")
    val e = edges.select(col(src).cast("long").as("graft_src"),
      col(dst).cast("long").as("graft_dst"))
    val nodes = e.select(col("graft_src").as("node"))
      .unionAll(e.select(col("graft_dst").as("node")))
      .distinct()
    val outdeg = e.groupBy(col("graft_src").as("node"))
      .agg(count(lit(1)).as("graft_deg"))
    // the out-degree rides IN the rank frame (null for pure sinks), so
    // each iteration is exactly two joins + one aggregate — re-joining
    // the static degree table every round would add a third
    val withDeg = nodes.join(outdeg, Seq("node"), "left")
    var pr = withDeg.withColumn("pr", lit(Scale))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(pr.filter(col("graft_deg").isNotNull)
            .select(col("node").as("graft_src"),
              expr("pr DIV graft_deg").as("graft_c")),
          "graft_src")
        .groupBy(col("graft_dst").as("node"))
        .agg(sum(col("graft_c")).as("graft_in"))
      pr = withDeg.join(contribs, Seq("node"), "left")
        .select(col("node"), col("graft_deg"),
          expr(s"(${15 * Scale} + 85 * coalesce(graft_in, " +
            "CAST(0 AS BIGINT))) DIV 100").as("pr"))
    }
    pr.select("node", "pr")
  }
}
