package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for hot-key skew — the classic remedy when BOTH sides
  * are too large to broadcast and one join key carries a disproportionate
  * share of the probe side (the "10 % of rows share one key" shape that
  * turns a sort-merge join partition into the job's straggler).
  *
  * The probe side gains a deterministic salt in [0, buckets): a hot key's
  * rows spread across `buckets` shuffle partitions instead of one. The
  * build side is replicated ×buckets (one copy per salt value), so every
  * (key, salt) pair still finds its full match set — the join result is
  * EXACTLY the plain equi-join's, row for row, which is what the q61
  * oracle verifies with a plain SQL JOIN.
  *
  * Salt determinism matters at scale: a `rand()`-based salt changes on
  * task RETRY, silently duplicating or dropping rows when a stage
  * re-executes (lineage replay re-rolls the dice). Hashing the row's own
  * columns (`xxhash64`) is retry-stable and spreads a hot key as evenly
  * as its non-key columns are distinct.
  *
  * Cost model: build-side shuffle volume ×buckets, probe side unchanged —
  * pick small buckets (4-16) sized to the observed straggler ratio, and
  * only reach for this when AQE's skew-join split (which handles the
  * SORT side) can't help: AQE splits oversized partitions of ONE side,
  * but a hot build-side partition that must be matched as a unit, or a
  * non-AQE engine path, still needs the algebraic fix.
  *
  * The build side is hinted `shuffle_hash`: replicating ×buckets and
  * then broadcasting would pay twice, and a salted broadcast join is a
  * contradiction (broadcast already ignores key distribution).
  */
object SkewJoin {

  /** ADAPTIVE skew join — [[saltedEquiJoin]] applied only where it
    * pays: sample the probe side's key histogram (one cheap pass;
    * deterministic seed, so task retries replay identically), and
    *   - a FLAT histogram (no key above `hotShare` of sampled rows)
    *     routes to the plain equi-join: zero build-side replication —
    *     the r15 verdict measured the unconditional salt at 4.3× the
    *     plain join on a flat lineitem⋈part exactly because the
    *     ×buckets replication ran for nothing;
    *   - a SKEWED histogram splits the probe on the (driver-bounded,
    *     ≤ 1/hotShare by construction) hot-key set: hot rows take the
    *     salted join against the hot slice of the build side, cold
    *     rows take the plain join against the rest, and the union is
    *     row-for-row the plain join's result (each probe row lands in
    *     exactly one branch; build rows match only their own branch).
    * Inputs smaller than ~2,000 sampled rows switch to an exact
    * histogram — sampling noise at tiny scale would make routing
    * flappy, and a full pass there costs nothing. `joinType` is
    * restricted to inner/left/left_semi: the probe-side split keeps
    * exactly those semantics (a right/full join would emit replicated
    * unmatched build rows — the same reason [[saltedEquiJoin]]
    * documents itself probe-sided).
    */
  def adaptiveSkewJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, buckets: Int,
      joinType: String = "inner", hotShare: Double = 0.02,
      sampleFraction: Double = 0.02, seed: Long = 42L): DataFrame = {
    require(Seq("inner", "left", "left_semi").contains(joinType),
      s"adaptive skew join preserves inner/left/left_semi semantics, " +
        s"got $joinType")
    require(hotShare > 0 && hotShare < 1, s"hotShare out of (0,1): $hotShare")
    def histogram(fraction: Double): DataFrame =
      (if (fraction >= 1.0) left
       else left.sample(withReplacement = false, fraction, seed))
        .groupBy(col(leftKey).as("graft_k"))
        .agg(count(lit(1)).as("graft_cnt"))
    // ONE action decides the route: (total, max count) in a single
    // scalar aggregate — the flat case (the common one) never pays a
    // second pass, and only a detected skew pays the hot-key collect.
    def totalAndMax(h: DataFrame): (Long, Long) = {
      val r = h.agg(coalesce(sum("graft_cnt"), lit(0L)),
        coalesce(max("graft_cnt"), lit(0L))).head
      (r.getLong(0), r.getLong(1))
    }
    var hist = histogram(sampleFraction)
    var (total, maxCnt) = totalAndMax(hist)
    if (total < 2000 && sampleFraction < 1.0) {
      hist = histogram(1.0)
      val tm = totalAndMax(hist); total = tm._1; maxCnt = tm._2
    }
    val threshold = math.max(2.0, hotShare * total)
    // driver-bounded collect: at most total/(hotShare·total) = 1/hotShare
    // keys can exceed the threshold
    val hot: Array[Any] =
      if (maxCnt < threshold) Array.empty
      else hist.filter(col("graft_cnt") >= lit(threshold))
        .select("graft_k").collect().map(_.get(0)).filter(_ != null)
    if (hot.isEmpty)
      left.join(right, left(leftKey) === right(rightKey), joinType)
    else {
      val lIsHot = coalesce(left(leftKey).isin(hot: _*), lit(false))
      val rIsHot = coalesce(right(rightKey).isin(hot: _*), lit(false))
      val hotBranch = saltedEquiJoin(left.filter(lIsHot),
        right.filter(rIsHot), leftKey, rightKey, buckets, joinType)
      val coldL = left.filter(!lIsHot)
      val coldR = right.filter(!rIsHot)
      val coldBranch =
        coldL.join(coldR, coldL(leftKey) === coldR(rightKey), joinType)
      // positional union: both branches project left ++ right columns
      hotBranch.union(coldBranch)
    }
  }

  def saltedEquiJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val salted = left.withColumn("graft_salt",
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(buckets))
        .cast("int"))
    val replicated = right.withColumn("graft_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted
      .join(replicated.hint("shuffle_hash"),
        salted(leftKey) === replicated(rightKey) &&
          salted("graft_salt") === replicated("graft_salt"),
        joinType)
      .drop("graft_salt")
  }
}
