package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2-style temporal dimension handling: turn a change-event stream
  * into validity epochs (`[valid_from, valid_to)` half-open intervals,
  * open-ended tail), then attribute facts to the epoch containing their
  * timestamp — the warehouse "effective-dated dimension lookup".
  *
  * Epoch derivation is one window pass (`lead` + `row_number` over the
  * same (key, ts) sort — a single shuffle, single sort, O(1) state per
  * row). The lookup is an equi-join on the key with the interval bounds
  * as a residual predicate: Spark plans it as a hash join keyed on the
  * key alone with the range as a post-probe filter — NEVER a
  * broadcast-nested-loop over the fact table, which is what a naive
  * `ts BETWEEN from AND to`-only condition degrades to. Dimensions are
  * small by definition at 100 TB (changes, not facts), so the dim side
  * broadcasts and the fact side never shuffles at all.
  */
object Temporal {

  /** Change events → validity epochs: adds `valid_from`, `valid_to`
    * (null = open-ended) and a 1-based `epoch_id` per key.
    */
  def epochs(changes: DataFrame, key: String, ts: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts))
    changes
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("epoch_id", row_number().over(w))
  }

  /** Facts ⋈ epochs: each fact row joined to the single epoch of its key
    * whose `[valid_from, valid_to)` interval contains the fact timestamp
    * (inclusive start, exclusive end, open tail). Inner semantics: facts
    * before their key's first epoch drop out.
    */
  def joinInEpoch(facts: DataFrame, dim: DataFrame, key: String,
      factTs: String): DataFrame = {
    val inRange = facts(factTs) >= dim("valid_from") &&
      (dim("valid_to").isNull || facts(factTs) < dim("valid_to"))
    facts.join(broadcast(dim),
      facts(key) === dim(key) && inRange, "inner")
      .drop(dim(key))
  }
}
