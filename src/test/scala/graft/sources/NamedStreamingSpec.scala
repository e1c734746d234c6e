package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The NAMED-TABLE streaming front door: `readStream.table` (appended
  * rows per catalog version, metadata-first) and `writeStream.toTable`
  * (executor-written parquet, one txn-deduped catalog transaction per
  * epoch). */
class NamedStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog(): String = {
    val root = Files.createTempDirectory("graftnamedstream").toString
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", root)
    root
  }

  test("readStream.table streams appended ROWS by name: head-start " +
      "default, unrelated-table commits are metadata-only, restart " +
      "pins the cursor, layered appends stream too") {
    val root = freshCatalog()
    Catalog.commit(root, Map("src" ->
      ((spark.range(0, 10).select(col("id"), (col("id") % 7).as("v")),
        Catalog.Overwrite))))
    val out = Files.createTempDirectory("named-out").toString
    SnapshotStore.commitOverwrite(
      spark.range(0, 0).select(
        when(col("id") >= 0, col("id")).as("id"),
        (col("id") % 7).as("v")), out)
    val ckpt = Files.createTempDirectory("named-ck").toString
    def pump(): Unit = {
      val q = spark.readStream.table("graft.main.src")
        .writeStream.format("graft").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    pump()
    assert(SnapshotStore.read(spark, out).count() === 0,
      "default start = catalog head at FIRST start (no history replay)")
    // while the stream is DOWN: one append to src, one commit to an
    // UNRELATED table (metadata-only for this stream), one predicate
    // delete (makes src LAYERED), then an append ONTO the layered table
    Catalog.commit(root, Map("src" ->
      ((spark.range(100, 105).select(col("id"), (col("id") % 7).as("v")),
        Catalog.Append))))
    Catalog.commit(root, Map("other" ->
      ((spark.range(0, 3).toDF("id"), Catalog.Overwrite))))
    Catalog.deleteWhere(root, "src",
      SnapshotStore.StatsPred.Between("id", 0L, 4L))
    Catalog.commit(root, Map("src" ->
      ((spark.range(200, 203).select(col("id"), (col("id") % 7).as("v")),
        Catalog.Append))))
    // the delete step is NOT an append: without skipChangeCommits the
    // restart must fail loudly...
    val e = intercept[Exception] { pump() }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage)
      .getOrElse("")).contains("non-append"), e.getMessage)
    // ...and with it, the stream skips the delete and emits exactly the
    // two appends (restart pinned the original cursor: the append that
    // landed BEFORE the failed pump still arrives)
    val ckpt2 = Files.createTempDirectory("named-ck2").toString
    val q2 = spark.readStream
      .option("skipChangeCommits", "true")
      .option("startingVersion", "0")
      .table("graft.main.src")
      .writeStream.format("graft").option("path", out)
      .option("checkpointLocation", ckpt2)
      .outputMode("append").start()
    q2.processAllAvailable(); q2.stop()
    val got = SnapshotStore.read(spark, out)
      .as[(Long, Long)].collect().toSet
    assert(got === ((100L to 104L) ++ (200L to 202L))
      .map(i => (i, i % 7)).toSet,
      s"appends (plain AND onto-layered) must stream; deletes skip: $got")
  }

  test("writeStream.toTable: executor-written files, ONE catalog " +
      "transaction per epoch, checkpoint replay commits nothing, " +
      "NOT NULL enforced per row") {
    val root = freshCatalog()
    Catalog.commit(root, Map("sink" ->
      ((spark.range(0, 10).select(col("id"), (col("id") % 7).as("v")),
        Catalog.Overwrite))))
    val v0 = Catalog.versions(root).max
    val stage = Files.createTempDirectory("named-stage").toString
    spark.range(200, 230).select(col("id"), (col("id") % 7).as("v"))
      .repartitionByRange(3, col("id")) // 3 provably NON-EMPTY files
      .write.mode("overwrite").parquet(stage)
    val staged = spark.read.parquet(stage)
    val ckpt = Files.createTempDirectory("named-sck").toString
    def sink(): Unit = {
      val q = spark.readStream.schema(staged.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
        .writeStream.option("checkpointLocation", ckpt)
        .outputMode("append").toTable("graft.main.sink")
      q.processAllAvailable(); q.stop()
    }
    sink()
    assert(Catalog.readTable(spark, root, "sink").count() === 40)
    // one catalog transaction per micro-batch (3 staged files)
    assert(Catalog.versions(root).max === v0 + 3)
    // txns recorded in the table's manifests: queryId:epochId
    val txns = (v0 + 1 to v0 + 3).map { cv =>
      Catalog.tableManifest(root, "sink", Some(cv)).get.txn }
    assert(txns.forall(_.nonEmpty) && txns.distinct.size === 3, txns)
    // stats harvested: a point probe skips files
    val (_, rep) = Catalog.readTableWhere(spark, root, "sink",
      SnapshotStore.StatsPred.Between("id", 200L, 202L))
    assert(rep.filesOpened < rep.filesListed,
      s"streamed files must be prunable: $rep")
    // replay on the same checkpoint: content and version unchanged
    sink()
    assert(Catalog.readTable(spark, root, "sink").count() === 40)
    assert(Catalog.versions(root).max === v0 + 3)
    // NOT NULL enforcement: a null id fails the epoch loudly and
    // commits nothing
    val stage2 = Files.createTempDirectory("named-stage2").toString
    spark.range(0, 5).select(
      when(col("id") === 2, lit(null)).otherwise(col("id")).as("id"),
      (col("id") % 7).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(stage2)
    val e = intercept[Exception] {
      val q = spark.readStream.schema(staged.schema).parquet(stage2)
        .writeStream.option("checkpointLocation",
          Files.createTempDirectory("named-sck2").toString)
        .outputMode("append").toTable("graft.main.sink")
      q.processAllAvailable(); q.stop()
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage)
      .getOrElse("")).contains("NOT NULL"), e.getMessage)
    assert(Catalog.readTable(spark, root, "sink").count() === 40)
    assert(Catalog.versions(root).max === v0 + 3)
  }
}
