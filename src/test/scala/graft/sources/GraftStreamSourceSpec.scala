package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraftStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graftstream").toString

  private def feedSet(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "v", "change", "n_rows", "version")
      .as[(Long, Long, String, Long, Int)].collect().toSet

  test("streamed change feed equals batch changeFeed; later commits " +
      "arrive as separate micro-batches; fresh-checkpoint replay is " +
      "idempotent") {
    val root = freshRoot()
    val o = (k: Int) => spark.range(k * 100, (k + 1) * 100)
      .select(col("id"), (col("id") % 7).as("v"))
    SnapshotStore.commitOverwrite(o(0), root)               // v0
    SnapshotStore.commitAppend(o(1), root)                  // v1
    SnapshotStore.commitOverwrite(o(2), root)               // v2
    def startQuery(sinkName: String) = {
      val ckpt = Files.createTempDirectory("graftstream-ckpt").toString
      spark.readStream.format("graft")
        .option("startingVersion", "0").load(root)
        .writeStream.format("memory").queryName(sinkName)
        .option("checkpointLocation", ckpt).outputMode("append").start()
    }
    val q = startQuery("gs_feed")
    q.processAllAvailable()
    val want = feedSet(SnapshotStore.changeFeed(spark, root, 0, 2))
    assert(feedSet(spark.table("gs_feed")) === want)
    val batches1 = q.recentProgress.count(_.numInputRows > 0)
    // a NEW commit while the query runs arrives as its own micro-batch
    SnapshotStore.commitAppend(o(3), root)                  // v3
    q.processAllAvailable()
    val want3 = feedSet(SnapshotStore.changeFeed(spark, root, 0, 3))
    assert(feedSet(spark.table("gs_feed")) === want3)
    assert(q.recentProgress.count(_.numInputRows > 0) > batches1,
      "the v3 commit must arrive as a separate micro-batch")
    q.stop()
    // fresh checkpoint + fresh sink: exactly the same set (replay
    // determinism — immutable manifests make version ranges stable)
    val q2 = startQuery("gs_feed_replay")
    q2.processAllAvailable()
    q2.stop()
    assert(feedSet(spark.table("gs_feed_replay")) === want3)
  }

  test("streaming sink: each micro-batch lands as one txn-deduped " +
      "append version; checkpoint replay commits nothing twice; " +
      "non-append modes and partitioning are refused") {
    val root = freshRoot()
    // nullable base schema (parquet stage reads are nullable; appends
    // may narrow nullability but never widen it)
    SnapshotStore.commitOverwrite(
      spark.range(0, 10).select(
        when(col("id") >= 0, col("id")).as("id"),
        (col("id") % 7).as("v")), root)
    // stage 3 key-disjoint parquet files -> 3 micro-batches
    val stage = Files.createTempDirectory("graftsink-stage").toString
    spark.range(100, 160)
      .select(col("id"), (col("id") % 7).as("v"))
      .repartition(3, pmod(col("id"), lit(3)))
      .write.mode("overwrite").parquet(stage)
    val staged = spark.read.parquet(stage)
    val ckpt = Files.createTempDirectory("graftsink-ckpt").toString
    def run() = {
      val q = spark.readStream.schema(staged.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
        .writeStream.format("graft")
        .option("path", root)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    run()
    val m = SnapshotStore.snapshot(root).get
    assert(SnapshotStore.read(spark, root).count() === 70)
    // one version per micro-batch, txn-tagged
    val txns = (0 to m.version)
      .map(v => SnapshotStore.snapshot(root, Some(v)).get.txn)
    assert((0 until 3).forall(b => txns.exists(_.endsWith(s":$b"))),
      s"each batch's txn must be in the chain: $txns")
    // a fresh query on the SAME checkpoint replays nothing
    run()
    assert(SnapshotStore.read(spark, root).count() === 70)
    assert(SnapshotStore.versions(root).max === m.version)
    // refusals
    intercept[Exception] {
      spark.readStream.schema(staged.schema).parquet(stage)
        .writeStream.format("graft").option("path", root)
        .option("checkpointLocation",
          Files.createTempDirectory("x").toString)
        .partitionBy("v").outputMode("append").start()
    }
  }

  test("end-to-end lakehouse loop: change-feed source -> transform -> " +
      "graft sink, incremental across upstream commits, exactly-once") {
    val a = freshRoot(); val b = freshRoot()
    def nn(df: org.apache.spark.sql.Dataset[java.lang.Long]) = df.select(
      when(col("id") >= 0, col("id")).as("id"), (col("id") % 7).as("v"))
    SnapshotStore.commitOverwrite(nn(spark.range(0, 50)), a)    // A v0
    val ckpt = Files.createTempDirectory("graftloop-ckpt").toString
    def pump(): Unit = {
      val q = spark.readStream.format("graft")
        .option("startingVersion", "0").load(a)
        .filter(col("change") === "added")
        .select(col("id"), col("v"), col("version").as("src_version"))
        .writeStream.format("graft").option("path", b)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    // v0 is the baseline (startingVersion 0 = changes AFTER v0): only
    // later commits flow. Two upstream appends arrive incrementally.
    SnapshotStore.commitAppend(nn(spark.range(100, 130)), a)    // A v1
    pump()
    assert(SnapshotStore.read(spark, b).count() === 30)
    SnapshotStore.commitAppend(nn(spark.range(200, 220)), a)    // A v2
    pump() // restart from the SAME checkpoint: only the new commit lands
    val got = SnapshotStore.read(spark, b)
    assert(got.count() === 50)
    assert(got.filter(col("src_version") === 1).count() === 30)
    assert(got.filter(col("src_version") === 2).count() === 20)
    // replay once more with nothing new upstream: B unchanged
    pump()
    assert(SnapshotStore.read(spark, b).count() === 50)
  }

  test("default startingVersion is the head at stream start (only " +
      "future commits stream); vacuumed versions behind the cursor " +
      "fail loudly") {
    val root = freshRoot()
    SnapshotStore.commitOverwrite(
      spark.range(0, 50).select(col("id"), (col("id") % 7).as("v")), root)
    SnapshotStore.commitAppend(
      spark.range(50, 60).select(col("id"), (col("id") % 7).as("v")), root)
    val ckpt = Files.createTempDirectory("graftstream-ckpt").toString
    val q = spark.readStream.format("graft").load(root)
      .writeStream.format("memory").queryName("gs_tail")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("gs_tail").count() === 0,
      "no history replay without startingVersion")
    SnapshotStore.commitAppend(
      spark.range(60, 65).select(col("id"), (col("id") % 7).as("v")), root)
    q.processAllAvailable()
    assert(feedSet(spark.table("gs_tail")) ===
      feedSet(SnapshotStore.changeFeed(spark, root, 1, 2)))
    q.stop()
    // retention violation: vacuum past v0, then ask for history
    SnapshotStore.vacuum(root, keepVersions = 1)
    val ckpt2 = Files.createTempDirectory("graftstream-ckpt").toString
    val q2 = spark.readStream.format("graft")
      .option("startingVersion", "0").load(root)
      .writeStream.format("memory").queryName("gs_gone")
      .option("checkpointLocation", ckpt2).outputMode("append").start()
    val e = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] { q2.processAllAvailable(); q2.stop() }
    assert(e.getMessage.contains("vacuumed") ||
      Option(e.getCause).exists(_.getMessage.contains("vacuumed")) ||
      e.getMessage.contains("no committed"), e.getMessage)
  }

  test("checkpoint restart pins the original startingVersion: commits " +
      "that landed while the stream was down are emitted immediately " +
      "on restart (no liveness stall)") {
    val root = freshRoot()
    SnapshotStore.commitOverwrite(
      spark.range(0, 50).select(col("id"), (col("id") % 7).as("v")), root)
    val sinkRoot = freshRoot()
    SnapshotStore.commitOverwrite(
      spark.range(0, 0).select(
        when(col("id") >= 0, col("id")).as("id"),
        (col("id") % 7).as("v"),
        (col("id") % 2 === 0).as("is_add"),
        col("id").cast("int").as("src_version")), sinkRoot)
    val ckpt = Files.createTempDirectory("graftstream-ckpt").toString
    def run(): Unit = {
      // the graft sink is checkpoint-recoverable (memory is not)
      val q = spark.readStream.format("graft").load(root)
        .select(col("id"), col("v"),
          (col("change") === "added").as("is_add"),
          col("version").as("src_version"))
        .writeStream.format("graft").option("path", sinkRoot)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    run()
    assert(SnapshotStore.read(spark, sinkRoot).count() === 0,
      "default start = head at FIRST start")
    // the stream is DOWN; two commits land meanwhile
    SnapshotStore.commitAppend(
      spark.range(50, 60).select(col("id"), (col("id") % 7).as("v")), root)
    SnapshotStore.commitAppend(
      spark.range(60, 65).select(col("id"), (col("id") % 7).as("v")), root)
    // restart on the SAME checkpoint: without the metadataPath pin, the
    // default would re-resolve to the NEW head and emit NOTHING until a
    // further commit — the missed versions must arrive in this run
    run()
    val got = SnapshotStore.read(spark, sinkRoot)
      .as[(Long, Long, Boolean, Int)].collect().toSet
    val want = SnapshotStore.changeFeed(spark, root, 0, 2)
      .select(col("id"), col("v"),
        (col("change") === "added").as("is_add"),
        col("version").as("src_version"))
      .as[(Long, Long, Boolean, Int)].collect().toSet
    assert(got === want,
      "versions committed while down must stream on restart")
  }
}
