package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.sources.SnapshotStore

/** The streaming ⇄ snapshot-layer contract ([[SnapshotStream]]): each
  * micro-batch commits as ONE snapshot version (replay-proof via the
  * manifest txn), and the incremental change feed over the committed
  * version range collapses to the one-shot batch diff AND to the full
  * streamed input — streamed == batch, proven across ≥3 micro-batches.
  */
class SnapshotStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("commitStream lands one snapshot version per micro-batch; the " +
      "change feed collapses to the batch diff AND to the full input") {
    implicit val sqlCtx = spark.sqlContext
    val root = freshDir("snapstream")
    val checkpoint = freshDir("snapstream-ckpt")
    val stream = MemoryStream[(Long, String)]

    val batches = Seq(
      Seq((1L, "a"), (2L, "b")),
      Seq((3L, "c")),
      Seq((4L, "d"), (5L, "e"), (3L, "c"))) // 3L twice overall: bag counts

    // one continuously-running sink; each addData + processAllAvailable
    // is one micro-batch — three batches, three snapshot versions
    val q = SnapshotStream.commitStream(
      stream.toDF().toDF("id", "s"), root, checkpoint, sinkId = "spec",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try batches.foreach { b =>
      stream.addData(b)
      q.processAllAvailable()
    } finally q.stop()

    // one version per micro-batch
    assert(SnapshotStore.versions(root) === Seq(0, 1, 2))
    // the table holds exactly the streamed input (appends never drop)
    val all = batches.flatten
    assert(SnapshotStore.read(spark, root).as[(Long, String)]
      .collect().sorted.toSeq === all.sorted)

    // union-of-diffs == endpoint diff == the input tagged `added`
    val feed = SnapshotStore.changeFeed(spark, root, 0, 2)
    val collapsed = SnapshotStore.collapseFeed(feed).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("s"),
        r.getAs[String]("change"), r.getAs[Long]("n_rows"))).toSet
    val endpoint = SnapshotStore.diff(spark, root, 0, 2).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("s"),
        r.getAs[String]("change"), r.getAs[Long]("n_rows"))).toSet
    assert(collapsed === endpoint)
    // versions 1..2 added exactly batches 2..3 — bag semantics: (3,"c")
    // landed in BOTH, so its count went 0 -> 2 and it surfaces n_rows=2
    assert(endpoint === Set(
      (3L, "c", "added", 2L), (4L, "d", "added", 1L),
      (5L, "e", "added", 1L)))

    // incremental poll: a consumer at version 0 reads versions 1..2 only
    val (inc, newHead) = SnapshotStream.readChangesSince(spark, root, 0)
    assert(newHead === 2)
    assert(inc.get.collect().length ===
      SnapshotStore.changeFeed(spark, root, 0, 2).collect().length)
    // caught-up consumer gets nothing
    assert(SnapshotStream.readChangesSince(spark, root, 2)
      === ((None, 2)))
  }

  test("a replayed micro-batch does not double-commit (txn idempotence " +
      "through the streaming sink's identity)") {
    implicit val sqlCtx = spark.sqlContext
    val root = freshDir("snapstream-replay")
    val stream = MemoryStream[(Long, String)]
    stream.addData(Seq((1L, "a")))

    // run the SAME micro-batch through two checkpoints with the same
    // sinkId — the second drain replays batch 0 (fresh checkpoint), and
    // the manifest txn dedupes it
    val q1 = SnapshotStream.commitStream(stream.toDF().toDF("id", "s"),
      root, freshDir("ckpt1"), sinkId = "replayer")
    q1.awaitTermination()
    val q2 = SnapshotStream.commitStream(stream.toDF().toDF("id", "s"),
      root, freshDir("ckpt2"), sinkId = "replayer")
    q2.awaitTermination()

    assert(SnapshotStore.versions(root) === Seq(0))
    assert(SnapshotStore.read(spark, root).count() === 1)
  }

  test("upsertStream: each micro-batch lands as one merge-on-read " +
      "layer, later BATCHES win over earlier ones, tombstones delete, " +
      "and the base files are never rewritten") {
    implicit val sqlCtx = spark.sqlContext
    val root = freshDir("snapstream-upsert")
    SnapshotStore.commitOverwrite(
      Seq((1L, "base1"), (2L, "base2"), (3L, "base3"))
        .toDF("id", "s"), root)                              // v0
    val baseFiles = SnapshotStore.snapshot(root).get.files
    val stream = MemoryStream[(Long, Long, Boolean, String)]
    val q = SnapshotStream.upsertStream(
      stream.toDF().toDF("id", "v", "del", "s"), root,
      freshDir("us-ckpt"), sinkId = "us", key = "id",
      versionCol = "v", deleteCol = "del",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    val batches = Seq(
      // batch 0: update 1 (v=9 wins within batch over v=5), insert 4
      Seq((1L, 5L, false, "b0-lo"), (1L, 9L, false, "b0-hi"),
        (4L, 1L, false, "b0-new")),
      // batch 1: delete 2; re-update 1 with a LOWER version — later
      // batch still wins (stream order beats version across batches)
      Seq((2L, 1L, true, "x"), (1L, 1L, false, "b1-rewrite")))
    try batches.foreach { b =>
      stream.addData(b)
      q.processAllAvailable()
    } finally q.stop()

    val m = SnapshotStore.snapshot(root).get
    assert(m.files === baseFiles && m.layers.size === 2,
      s"files ${m.files.size}, layers ${m.layers.size}")
    assert(SnapshotStore.read(spark, root).as[(Long, String)]
      .collect().toSet ===
      Set((1L, "b1-rewrite"), (3L, "base3"), (4L, "b0-new")))
    // replay the SAME batches through a fresh checkpoint, same sinkId:
    // both txns are in the manifest chain, nothing double-applies
    val q2 = SnapshotStream.upsertStream(
      stream.toDF().toDF("id", "v", "del", "s"), root,
      freshDir("us-ckpt2"), sinkId = "us", key = "id",
      versionCol = "v", deleteCol = "del")
    q2.awaitTermination()
    assert(SnapshotStore.snapshot(root).get.layers.size === 2)
    assert(SnapshotStore.read(spark, root).count() === 3)
    // optimize folds the layers; content unchanged
    SnapshotStore.optimize(spark, root, targetFiles = 1)
    assert(SnapshotStore.snapshot(root).get.layers.isEmpty)
    assert(SnapshotStore.read(spark, root).as[(Long, String)]
      .collect().toSet ===
      Set((1L, "b1-rewrite"), (3L, "base3"), (4L, "b0-new")))
  }

  test("upsertStream maxLayers: a long stream keeps BOUNDED layer " +
      "count via in-sink compaction, with content identical to the " +
      "unbounded fold") {
    implicit val sqlCtx = spark.sqlContext
    val root = freshDir("snapstream-compact")
    SnapshotStore.commitOverwrite(
      spark.range(0, 50).select(
        org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("base"),
          org.apache.spark.sql.functions.col("id")).as("s")), root)
    val stream = MemoryStream[(Long, Long, Boolean, String)]
    val q = SnapshotStream.upsertStream(
      stream.toDF().toDF("id", "v", "del", "s"), root,
      freshDir("usc-ckpt"), sinkId = "usc", key = "id",
      versionCol = "v", deleteCol = "del",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      maxLayers = 2, compactTargetFiles = 1)
    // 6 micro-batches: batch b updates id=b, deletes id=10+b, inserts
    // id=100+b — without compaction the head would carry 6 layers
    try (0 until 6).foreach { b =>
      stream.addData(Seq(
        (b.toLong, 1L, false, s"upd$b"),
        (10L + b, 1L, true, "x"),
        (100L + b, 1L, false, s"ins$b")))
      q.processAllAvailable()
    } finally q.stop()
    val m = SnapshotStore.snapshot(root).get
    assert(m.layers.size <= 2,
      s"steady-state layer count must stay bounded: ${m.layers.size}")
    val got = SnapshotStore.read(spark, root).as[(Long, String)]
      .collect().toMap
    assert(got.size === 50 - 6 + 6) // 6 deleted, 6 inserted
    (0 until 6).foreach { b =>
      assert(got(b.toLong) === s"upd$b")
      assert(!got.contains(10L + b))
      assert(got(100L + b) === s"ins$b")
    }
    // replay the whole stream through a fresh checkpoint: txn chain
    // survives the in-sink optimizes, nothing double-applies
    val q2 = SnapshotStream.upsertStream(
      stream.toDF().toDF("id", "v", "del", "s"), root,
      freshDir("usc-ckpt2"), sinkId = "usc", key = "id",
      versionCol = "v", deleteCol = "del", maxLayers = 2,
      compactTargetFiles = 1)
    q2.awaitTermination()
    assert(SnapshotStore.read(spark, root).count() === 50)
  }

  test("mergeOnReadOnce refuses an empty table and dedupes a direct " +
      "replayed txn") {
    val root = freshDir("snapmor-once")
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.mergeOnReadOnce(spark, root,
        Seq((1L, 1L, false, "a")).toDF("id", "v", "del", "s"),
        key = "id", versionCol = "v", deleteCol = "del", txn = "t:0")
    }
    assert(e.getMessage.contains("no commits"))
    SnapshotStore.commitOverwrite(Seq((1L, "x")).toDF("id", "s"), root)
    val ch = Seq((1L, 1L, false, "y")).toDF("id", "v", "del", "s")
    assert(SnapshotStore.mergeOnReadOnce(spark, root, ch,
      "id", "v", "del", txn = "t:0") === Some(1))
    assert(SnapshotStore.mergeOnReadOnce(spark, root, ch,
      "id", "v", "del", txn = "t:0") === None)
    assert(SnapshotStore.mergeOnReadOnce(spark, root, ch,
      "id", "v", "del", txn = "t:1") === Some(2))
    assert(SnapshotStore.versions(root) === Seq(0, 1, 2))
  }
}
