package graft.sources

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `maxVersionsPerTrigger` on both streaming sources: a stream starting
  * from an old version of a big table backfills in BOUNDED micro-batches
  * (the Delta maxFilesPerTrigger idea in this store's version currency)
  * instead of one batch covering the whole history. */
class RateLimitedStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog(): String = {
    val root = Files.createTempDirectory("graftratelim").toString
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", root)
    root
  }

  test("catalog row source: maxVersionsPerTrigger=1 emits one version " +
      "per micro-batch over a multi-version backfill, totals exact") {
    val root = freshCatalog()
    Catalog.commit(root, Map("t" ->
      ((spark.range(0, 5).toDF("id"), Catalog.Overwrite))))   // v0
    (1 to 3).foreach { k =>
      Catalog.commit(root, Map("t" ->
        ((spark.range(k * 100L, k * 100L + 5).toDF("id"),
          Catalog.Append))))                                  // v1..v3
    }
    val batches = new ConcurrentLinkedQueue[(Long, Long)]() // (count, batches so far)
    val ckpt = Files.createTempDirectory("ratelim-ck").toString
    val q = spark.readStream
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1")
      .table("graft.main.t")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) =>
        val n = df.count()
        if (n > 0) batches.add((id, n)); ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable(); q.stop()
    val got = scala.jdk.CollectionConverters
      .IteratorHasAsScala(batches.iterator).asScala.toSeq
    // three appended versions, each its own micro-batch of 5 rows —
    // never one 15-row catch-up batch
    assert(got.map(_._2) === Seq(5L, 5L, 5L), got.toString)
    // restart with versions committed while down: latestOffset receives
    // the CHECKPOINT cursor as its start, so the next batch continues
    // FORWARD (no re-offering of committed versions)
    Catalog.commit(root, Map("t" ->
      ((spark.range(400, 404).toDF("id"), Catalog.Append))))  // v4
    Catalog.commit(root, Map("t" ->
      ((spark.range(500, 503).toDF("id"), Catalog.Append))))  // v5
    batches.clear()
    val q2 = spark.readStream
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1")
      .table("graft.main.t")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) =>
        val n = df.count()
        if (n > 0) batches.add((id, n)); ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    q2.processAllAvailable(); q2.stop()
    val got2 = scala.jdk.CollectionConverters
      .IteratorHasAsScala(batches.iterator).asScala.toSeq
    assert(got2.map(_._2) === Seq(4L, 3L), got2.toString)
  }

  test("path change-feed source: maxVersionsPerTrigger=2 paces a " +
      "4-version backfill into two batches; totals match the unpaced " +
      "feed") {
    val root = Files.createTempDirectory("ratelim-path").toString
    SnapshotStore.commitOverwrite(spark.range(0, 4).toDF("id"), root) // v0
    (1 to 4).foreach { k =>
      SnapshotStore.commitAppend(
        spark.range(k * 10L, k * 10L + 2).toDF("id"), root)  // v1..v4
    }
    val batchSizes = new ConcurrentLinkedQueue[java.lang.Long]()
    val ckpt = Files.createTempDirectory("ratelim-pck").toString
    val q = spark.readStream.format("graft")
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "2")
      .load(root)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        val n = df.count()
        if (n > 0) batchSizes.add(java.lang.Long.valueOf(n)); ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable(); q.stop()
    val sizes = scala.jdk.CollectionConverters
      .IteratorHasAsScala(batchSizes.iterator).asScala.map(_.toLong).toSeq
    // each append's diff is 2 added rows; 4 versions at 2 per trigger =
    // two batches of 4 feed rows each
    assert(sizes === Seq(4L, 4L), sizes.toString)
    // refuses nonsense (createSource runs on the stream thread — the
    // refusal surfaces when the query is awaited)
    val bad = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "0").load(root)
      .writeStream.format("console")
      .option("checkpointLocation",
        Files.createTempDirectory("ratelim-bad").toString)
      .start()
    val e = intercept[Exception] {
      try bad.processAllAvailable() finally bad.stop()
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage)
      .getOrElse("")).contains("must be positive"), e.getMessage)
  }

  test("Trigger.AvailableNow + maxVersionsPerTrigger drains the WHOLE " +
      "backlog in paced batches then stops (SupportsTriggerAvailableNow " +
      "— the default one-batch wrapper would stop after one capped " +
      "step)") {
    val root = freshCatalog()
    Catalog.commit(root, Map("an" ->
      ((spark.range(0, 3).toDF("id"), Catalog.Overwrite))))   // v0
    (1 to 5).foreach { k =>
      Catalog.commit(root, Map("an" ->
        ((spark.range(k * 10L, k * 10L + 3).toDF("id"),
          Catalog.Append))))                                  // v1..v5
    }
    val batches = new ConcurrentLinkedQueue[java.lang.Long]()
    val ckpt = Files.createTempDirectory("ratelim-an").toString
    val q = spark.readStream
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "2")
      .table("graft.main.an")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        val n = df.count()
        if (n > 0) batches.add(java.lang.Long.valueOf(n)); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    assert(q.awaitTermination(120000), "AvailableNow must self-stop")
    val sizes = scala.jdk.CollectionConverters
      .IteratorHasAsScala(batches.iterator).asScala.map(_.toLong).toSeq
    // five appended versions of 3 rows at 2 versions per trigger:
    // 6/6/3 — the full backlog, paced, then self-stop
    assert(sizes === Seq(6L, 6L, 3L), sizes.toString)
  }
}
