package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  StructField, StructType}

/** Snapshot-store CHANGE-FEED STREAMING SOURCE — the Delta
  * streaming-source shape on this store's primitives:
  *
  * {{{
  *   spark.readStream.format("graft")
  *     .option("startingVersion", "0")   // default: head at stream start
  *     .load(tableRoot)
  * }}}
  *
  * Offsets ARE table versions (the natural exactly-once cursor of a
  * versioned store): micro-batch (start, end] materializes
  * [[SnapshotStore.changeFeed]] over exactly those commits — per-commit
  * adjacent diffs, each O(changed data) because shared files cancel,
  * tagged `change` (added/removed), `n_rows` (multiplicity) and
  * `version`. Replay is deterministic by construction: a version range
  * always produces the same rows (manifests are immutable), so a
  * restarted checkpoint re-emits exactly its uncommitted batch and
  * nothing else.
  *
  * Retention contract (the same one Delta documents): a micro-batch
  * needs BOTH endpoint manifests of every version step it covers —
  * [[SnapshotStore.vacuum]]ing a version the cursor has not passed
  * fails the stream LOUDLY (missing-manifest error), never silently
  * skips changes. Size retention to checkpoint lag.
  *
  * v1 Source architecture on purpose: `getBatch` returns a DataFrame,
  * so the feed's join/aggregate pipeline rides Spark's own batch
  * machinery inside each micro-batch (a DSv2 MicroBatchStream would
  * need hand-built partition readers for what is fundamentally a
  * derived frame). The frame is re-rooted as a streaming LogicalRDD —
  * lazy, computed by the micro-batch itself. */
class GraftChangeSource(spark: SparkSession, root: String,
    startingVersion: Int) extends Source {

  private val tableSchema: StructType = {
    val m = SnapshotStore.snapshot(root).getOrElse(sys.error(
      s"graft stream: no committed snapshot under $root"))
    StructType.fromDDL(m.schemaDdl)
  }

  override val schema: StructType =
    GraftChangeSource.feedSchema(tableSchema)

  private def head: Int = SnapshotStore.versions(root).lastOption
    .getOrElse(sys.error(s"graft stream: table vanished under $root"))

  override def getOffset: Option[Offset] = {
    val h = head
    if (h > startingVersion) Some(GraftVersionOffset(h)) else None
  }

  private def ver(o: Offset): Int = o match {
    case GraftVersionOffset(v) => v
    case other => other.json.trim.toInt // SerializedOffset on restart
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(ver).getOrElse(startingVersion)
    val to = ver(end)
    require(from <= to,
      s"graft stream: offset went backwards ($from > $to) under $root")
    if (from == to) {
      // zero-version batch (restart bookkeeping): empty frame
      return org.apache.spark.sql.graftshim.asStreamingFrame(
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    }
    (from to to).foreach { v =>
      require(java.nio.file.Files.exists(
          java.nio.file.Paths.get(root, "_manifests", s"v$v.json")),
        s"graft stream: version $v of $root was vacuumed past the " +
          "stream's cursor — the change feed cannot be reconstructed " +
          "(retention must cover checkpoint lag)")
    }
    val feed = SnapshotStore.changeFeed(spark, root, from, to)
    // enforce the declared source schema (order + types) positionally —
    // MicroBatchExecution binds batch output to the relation's output
    // by position
    import org.apache.spark.sql.functions.col
    val aligned = feed.select(schema.fields.map(f =>
      col(f.name).cast(f.dataType)).toSeq: _*)
    org.apache.spark.sql.graftshim.asStreamingFrame(aligned)
  }

  override def commit(end: Offset): Unit = () // retention is vacuum's

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftChangeSource[$root, startingVersion=$startingVersion]"
}

object GraftChangeSource {
  /** changeFeed's frame shape over a table schema. */
  def feedSchema(table: StructType): StructType = StructType(
    table.fields.toSeq ++ Seq(
      StructField("change", StringType, nullable = true),
      StructField("n_rows", LongType, nullable = true),
      StructField("version", IntegerType, nullable = true)))

  private[sources] def create(sqlContext: SQLContext,
      parameters: Map[String, String],
      metadataPath: String): GraftChangeSource = {
    val root = parameters.getOrElse("path", sys.error(
      "graft stream: missing 'path' (use .load(<table root>))"))
    val starting = resolveStarting(sqlContext, parameters, root,
      metadataPath)
    new GraftChangeSource(sqlContext.sparkSession, root, starting)
  }

  /** Resolve-and-PIN the stream's starting version (the Delta
    * initial-snapshot-pin pattern): the default starting version is
    * "table head at stream START", but createSource also runs on every
    * CHECKPOINT RESTART — recomputing the default there would skip to
    * the NEW head, and getOffset would then sit silent on every version
    * committed while the stream was down until yet another commit moved
    * the head (a liveness stall). So the first start writes the
    * resolved version under the source's own metadataPath (exactly-once
    * via create-no-overwrite; the checkpoint dir is single-writer by
    * Spark's own lock) and every restart reads it back. An EXPLICIT
    * `startingVersion` option pins itself by value, but is persisted
    * too so later option edits cannot silently rebase a running
    * checkpoint's cursor. */
  private def resolveStarting(sqlContext: SQLContext,
      parameters: Map[String, String], root: String,
      metadataPath: String): Int = {
    val hp = new org.apache.hadoop.fs.Path(metadataPath,
      "graft-starting-version")
    val fs = hp.getFileSystem(
      sqlContext.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) {
      val buf = new Array[Byte](fs.getFileStatus(hp).getLen.toInt)
      val in = fs.open(hp)
      try in.readFully(buf) finally in.close()
      new String(buf, java.nio.charset.StandardCharsets.UTF_8).trim.toInt
    } else {
      val resolved = parameters.get("startingVersion").map(_.trim.toInt)
        .getOrElse(SnapshotStore.versions(root).lastOption.getOrElse(
          sys.error(s"graft stream: no committed snapshot under $root")))
      fs.mkdirs(hp.getParent)
      val out = fs.create(hp, false) // no-overwrite: first writer wins
      try out.write(resolved.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      resolved
    }
  }
}

/** The versioned-store offset: table version `v`, meaning "changes
  * through commit v have been emitted". */
final case class GraftVersionOffset(v: Int) extends Offset {
  override def json: String = v.toString
}

/** The APPEND streaming sink behind `writeStream.format("graft")`:
  * micro-batch N commits under txn `"<sinkId>:N"` through
  * [[SnapshotStore.commitAppendOnce]] — one snapshot version per batch,
  * replay-deduped by the manifest txn chain. The batch frame is
  * re-rooted on its already-planned RDD ([[org.apache.spark.sql
  * .graftshim.cutLineage]]) so the commit's parquet write reuses the
  * micro-batch's physical plan instead of re-planning the incremental
  * execution (the v1 Sink addBatch contract). */
class GraftAppendSink(root: String, sinkId: String)
    extends org.apache.spark.sql.execution.streaming.Sink {

  override def addBatch(batchId: Long,
      data: org.apache.spark.sql.DataFrame): Unit = {
    val batch = org.apache.spark.sql.graftshim.cutLineage(data)
    SnapshotStore.commitAppendOnce(batch, root, s"$sinkId:$batchId")
    ()
  }

  override def toString: String = s"GraftAppendSink[$root, $sinkId]"
}
