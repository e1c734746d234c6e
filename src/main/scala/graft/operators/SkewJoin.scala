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
