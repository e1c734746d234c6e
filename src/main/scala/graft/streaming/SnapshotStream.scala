package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.SnapshotStore

/** Structured Streaming ⇄ ACID snapshot layer — the two halves a
  * daily-crawl pipeline needs on top of [[graft.sources.SnapshotStore]]:
  *
  *   - WRITE side ([[commitStream]]): every micro-batch lands as ONE
  *     snapshot append version, so the table's version chain IS the
  *     micro-batch history. Exactly-once: a replayed batch (sink crash
  *     between commit and checkpoint advance) is deduplicated through
  *     [[SnapshotStore.commitAppendOnce]]'s manifest-recorded txn id —
  *     the Delta `txn` action pattern, with the same retention-horizon
  *     contract.
  *   - READ side ([[readChangesSince]]): an incremental consumer holds
  *     the last version it processed and reads only the per-commit
  *     diffs past it — O(changed data) per poll, never O(table). The
  *     feed refines the endpoint diff: [[SnapshotStore.collapseFeed]]
  *     of any contiguous range equals `diff(from, to)` by construction
  *     (signed multiplicities telescope), which is what the q117 gate
  *     and SnapshotStreamSpec pin.
  *
  * Parity contract (spec-proven): draining a stream through
  * [[commitStream]] across ≥3 micro-batches and collapsing the full
  * change feed equals the one-shot batch diff — and equals the input
  * tagged `added`, since appends never remove rows.
  */
object SnapshotStream {

  /** Run `df` (a streaming frame) into the snapshot table at `root`,
    * committing each micro-batch as one append version. `sinkId` names
    * this sink's txn lineage (stable across restarts — derive it from
    * the checkpoint identity, not the run id); with it, micro-batch N
    * commits under txn `"<sinkId>:N"` exactly once even if foreachBatch
    * replays it. AvailableNow by default so one call drains what is
    * currently readable and stops (the one-shot import shape); a
    * deployment passes its own trigger. */
  def commitStream(df: DataFrame, root: String, checkpoint: String,
      sinkId: String, trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery = {
    require(sinkId.nonEmpty, "sinkId must be non-empty")
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        SnapshotStore.commitAppendOnce(batch, root, s"$sinkId:$batchId")
        ()
      }
      .start()
  }

  /** Streaming UPSERT sink — the CDC shape [[commitStream]] cannot
    * express: each micro-batch is a changelog (upserts + delete
    * tombstones, versioned) that lands as ONE merge-on-read layer via
    * [[SnapshotStore.mergeOnReadOnce]], so the base table is never read
    * or rewritten per batch (O(batch) commits against any base size)
    * and a replayed micro-batch is deduplicated through the same
    * manifest txn protocol as the append sink. Cross-batch semantics:
    * layers fold in COMMIT order, so a key updated in two different
    * micro-batches resolves to the later BATCH (stream order), with the
    * version column breaking ties only WITHIN a batch — the standard
    * CDC-stream contract (upstream emits changes in commit order).
    *
    * READ-AMPLIFICATION POLICY (`maxLayers`): an unbounded stream
    * accretes one layer per micro-batch FOREVER — every reader pays one
    * anti-join per layer, so a long-running sink degrades reads without
    * bound unless someone compacts. `maxLayers > 0` bounds it inside
    * the sink itself: after a batch commits, if the head manifest
    * carries more than `maxLayers` layers, the sink runs
    * [[SnapshotStore.optimize]] (folding every layer into
    * `compactTargetFiles` fresh base files) before the next batch —
    * steady-state read cost is ≤ `maxLayers` anti-joins no matter how
    * long the stream runs, and the compaction wall amortizes over the
    * batches between folds. Exactly-once is unaffected: optimize
    * commits its own (txn-less) version, the txn chain stays in the
    * retained manifests, and a replayed batch still dedups. 0 (the
    * default) keeps the manual-cadence contract. */
  def upsertStream(df: DataFrame, root: String, checkpoint: String,
      sinkId: String, key: String, versionCol: String, deleteCol: String,
      trigger: Trigger = Trigger.AvailableNow(),
      skipPartialAgg: Boolean = false, maxLayers: Int = 0,
      compactTargetFiles: Int = 4): StreamingQuery = {
    require(sinkId.nonEmpty, "sinkId must be non-empty")
    require(maxLayers >= 0, "maxLayers must be >= 0 (0 = never compact)")
    require(compactTargetFiles >= 1, "compactTargetFiles must be >= 1")
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        SnapshotStore.mergeOnReadOnce(batch.sparkSession, root, batch,
          key, versionCol, deleteCol, txn = s"$sinkId:$batchId",
          skipPartialAgg = skipPartialAgg)
        if (maxLayers > 0 &&
            SnapshotStore.snapshot(root).exists(_.layers.size > maxLayers))
          SnapshotStore.optimize(batch.sparkSession, root,
            targetFiles = compactTargetFiles)
        ()
      }
      .start()
  }

  /** Incremental poll: the change feed past `lastVersion` (exclusive)
    * up to the current head, plus the new head to carry into the next
    * poll. No new versions → (None, lastVersion). Each returned row is
    * tagged with the `version` whose commit introduced it, so the
    * consumer can checkpoint mid-feed. */
  def readChangesSince(spark: org.apache.spark.sql.SparkSession,
      root: String, lastVersion: Int): (Option[DataFrame], Int) = {
    val head = SnapshotStore.versions(root).lastOption.getOrElse(-1)
    if (head <= lastVersion) (None, lastVersion)
    else (Some(SnapshotStore.changeFeed(spark, root, lastVersion, head)),
      head)
  }
}
