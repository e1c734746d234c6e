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
}
