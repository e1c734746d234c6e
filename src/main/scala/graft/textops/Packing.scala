package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy sequence packing: concatenate a corpus shard's documents in a
  * deterministic order and cut the token stream at fixed-capacity
  * boundaries — the standard pre-training batch-prep step (pack short
  * documents into `capacity`-token training sequences instead of padding).
  *
  * Semantics: within each `partitionCol` group, documents are laid out in
  * ascending `orderCol` order; a document is assigned to the pack in which
  * its FIRST token falls, i.e. `pack_id = floor(tokens_before / capacity)`.
  * A document longer than `capacity` still gets exactly one pack (the one
  * it starts in) — splitting oversized docs is the tokenizer's job
  * downstream, not the planner's.
  *
  * Scale shape: one shuffle on `partitionCol`, then a single running-sum
  * window per group — sort-based window processing holds O(1) state per
  * row (running sum only), so a hot group streams instead of buffering.
  * At 100 TB the partition key should be a bounded-size shard key
  * ((source, doc_id range) buckets), never a global ordering: packing is
  * per-shard by design, exactly like distributed tokenizer jobs shard
  * their corpora. No collects, no UDFs.
  */
object Packing {

  /** Per-document pack assignment: adds `tok`, `cum_before`, `pack_id`. */
  def assignPacks(docs: DataFrame, textCol: Column, partitionCol: Column,
      orderCol: Column, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val w = Window.partitionBy(partitionCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("tok", TextStats.tokenCount(textCol).cast("long"))
      .withColumn("cum_before", sum(col("tok")).over(w) - col("tok"))
      .withColumn("pack_id",
        floor(col("cum_before") / lit(capacity)).cast("long"))
  }

  /** Pack-level summary: docs per pack, token fill, doc-id span. */
  def packStats(docs: DataFrame, textCol: Column, partitionCol: Column,
      orderCol: Column, capacity: Long): DataFrame =
    assignPacks(docs, textCol, partitionCol, orderCol, capacity)
      .groupBy(partitionCol, col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum("tok").as("n_tokens"),
        min(orderCol).as("first_doc"),
        max(orderCol).as("last_doc"))
}
