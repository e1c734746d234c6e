package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  StructField, StructType}

/** Shared VERSION-PACED ADMISSION CONTROL for both streaming sources —
  * the v1-Source-plus-SupportsAdmissionControl pattern KafkaSource
  * uses: MicroBatchExecution prefers `latestOffset(start, limit)` over
  * `getOffset` (the start offset is the checkpoint cursor, so pacing
  * needs no restart bookkeeping at all), and a source implementing
  * [[org.apache.spark.sql.connector.read.streaming
  * .SupportsTriggerAvailableNow]] is used UNWRAPPED under
  * `Trigger.AvailableNow` — `prepareForTriggerAvailableNow` pins the
  * drain target at trigger start and the stream then advances
  * `maxVersionsPerTrigger` steps per batch UNTIL that target: a paced
  * FULL drain (the Delta semantics), where the default wrapper would
  * have stopped after one capped batch. */
private[sources] trait GraftVersionPacing
    extends org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{
    Offset => OffsetV2, ReadLimit}

  /** Current head (table or catalog version) — can only grow. */
  protected def headVersion: Int
  /** The stream's pinned starting version ("changes through it are
    * already emitted"). */
  protected def pacingStart: Int
  protected def maxVersionsPerTrigger: Option[Int]

  @volatile private var drainTarget: Option[Int] = None

  private def versionOf(o: OffsetV2): Int = o match {
    case GraftVersionOffset(v) => v
    case other => other.json.trim.toInt // SerializedOffset on restart
  }

  override def prepareForTriggerAvailableNow(): Unit =
    drainTarget = Some(headVersion)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def initialOffset(): OffsetV2 = GraftVersionOffset(pacingStart)

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    // under AvailableNow the target is FIXED at trigger start (commits
    // racing the drain wait for the next trigger); live triggers chase
    // the moving head
    val target = drainTarget.getOrElse(headVersion)
    val from = Option(start).map(versionOf).getOrElse(pacingStart)
    val capped = maxVersionsPerTrigger.fold(target)(n =>
      math.min(target.toLong, from.toLong + n).toInt)
    val end = math.max(capped, from) // a stale target never goes backwards
    if (end > pacingStart) GraftVersionOffset(end) else null
  }
}

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
    startingVersion: Int,
    override protected val maxVersionsPerTrigger: Option[Int] = None)
    extends Source with GraftVersionPacing {

  private val tableSchema: StructType = {
    val m = SnapshotStore.snapshot(root).getOrElse(sys.error(
      s"graft stream: no committed snapshot under $root"))
    StructType.fromDDL(m.schemaDdl)
  }

  override val schema: StructType =
    GraftChangeSource.feedSchema(tableSchema)

  private def head: Int = SnapshotStore.versions(root).lastOption
    .getOrElse(sys.error(s"graft stream: table vanished under $root"))

  override protected def headVersion: Int = head
  override protected def pacingStart: Int = startingVersion

  // the engine routes through latestOffset (SupportsAdmissionControl,
  // where maxVersionsPerTrigger paces each batch against the
  // checkpoint cursor); this is the plain v1 fallback
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
    new GraftChangeSource(sqlContext.sparkSession, root, starting,
      maxVersions(parameters))
  }

  /** Parse-and-validate the shared `maxVersionsPerTrigger` option. */
  private[sources] def maxVersions(
      parameters: Map[String, String]): Option[Int] =
    parameters.get("maxVersionsPerTrigger").map { s =>
      val n = s.trim.toInt
      require(n > 0,
        s"graft stream: maxVersionsPerTrigger must be positive, got $n")
      n
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
      metadataPath: String): Int =
    GraftChangeSource.pinnedStarting(sqlContext, metadataPath,
      parameters.get("startingVersion").map(_.trim.toInt)
        .getOrElse(SnapshotStore.versions(root).lastOption.getOrElse(
          sys.error(s"graft stream: no committed snapshot under $root"))))

  /** Read the pinned starting version under `metadataPath`, or resolve
    * `default` and pin it (create-no-overwrite; the checkpoint dir is
    * single-writer by Spark's own lock) — shared by both streaming
    * sources. */
  private[sources] def pinnedStarting(sqlContext: SQLContext,
      metadataPath: String, default: => Int): Int = {
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
      val resolved = default
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

/** NAMED-TABLE STREAMING READ — `spark.readStream.table("graft.main.t")`
  * — the catalog twin of the path change feed, with Delta's
  * appended-ROWS semantics (not the diff feed): offsets are CATALOG
  * versions, and micro-batch (start, end] emits exactly the rows the
  * covered commits APPENDED, detected and read METADATA-FIRST:
  *
  *   - a version step whose manifest for this table is unchanged (some
  *     other table committed) costs one snapshot parse — no data I/O;
  *   - an APPEND-SHAPED step (old files ⊆ new files, segments carried,
  *     layer chain only grew by add-only layers) reads exactly the NEW
  *     files — zero joins, O(appended bytes), never O(table);
  *   - any other step (overwrite, delete, merge, optimize) is NOT an
  *     append: the stream fails loudly — the Delta rule ("streaming
  *     source only supports appends") — unless `skipChangeCommits` is
  *     set, which skips that step's rows entirely (Delta's option of
  *     the same name).
  *
  * The schema is pinned at stream start (new columns added by ALTER
  * are invisible to a running stream; restart to pick them up — files
  * written before the widening simply lack the column). Replay is
  * deterministic: manifests are immutable, so a version range always
  * yields the same rows. Vacuumed-past-the-cursor versions fail
  * loudly, same retention contract as the path source. */
class GraftCatalogRowSource(spark: SparkSession, catRoot: String,
    table: String, startingVersion: Int, skipChangeCommits: Boolean,
    override protected val maxVersionsPerTrigger: Option[Int] = None)
    extends Source with GraftVersionPacing {

  // the stream's schema pins at source creation (v1 Source contract);
  // a mapped table streams under its CURRENT logical names — physical
  // file names are frozen, so files from any version in range read
  // correctly under the creation-time physical schema
  private val createM = Catalog.tableManifest(catRoot, table)
    .getOrElse(sys.error(
      s"graft stream: catalog under $catRoot has no table $table"))

  override val schema: StructType = SnapshotStore.logicalSchema(createM)

  private def head: Int = Catalog.versions(catRoot).lastOption
    .getOrElse(sys.error(s"graft stream: catalog vanished under $catRoot"))

  override protected def headVersion: Int = head
  override protected def pacingStart: Int = startingVersion

  // plain v1 fallback; the engine paces through latestOffset
  override def getOffset: Option[Offset] = {
    val h = head
    if (h > startingVersion) Some(GraftVersionOffset(h)) else None
  }

  private def ver(o: Offset): Int = o match {
    case GraftVersionOffset(v) => v
    case other => other.json.trim.toInt
  }

  private def tableRoot: String =
    java.nio.file.Paths.get(catRoot, table).toString

  /** The files a step appended, or None when the step is not
    * append-shaped. Absent-at-old (table created inside the range)
    * baselines as empty. */
  private def appendedFiles(oldM: Option[SnapshotStore.Manifest],
      newM: SnapshotStore.Manifest): Option[Seq[String]] = {
    val o = oldM.getOrElse(SnapshotStore.Manifest(-1, -1,
      newM.schemaDdl, Nil))
    val oldFiles = o.files.toSet
    val sameSegs = newM.segments.map(_.path).toSet
      .intersect(o.segments.map(_.path).toSet).size == o.segments.size
    val layersGrewAddOnly =
      newM.layers.take(o.layers.size) == o.layers &&
        newM.layers.drop(o.layers.size)
          .forall(l => l.key.isEmpty && l.pred.isEmpty)
    val filesGrew = oldFiles.subsetOf(newM.files.toSet)
    val newSegs = newM.segments.filterNot(s =>
      o.segments.exists(_.path == s.path))
    if (!(filesGrew && sameSegs && layersGrewAddOnly)) None
    else Some((newM.files.filterNot(oldFiles) ++
      newSegs.flatMap(s =>
        SnapshotStore.readSegmentManifest(tableRoot, s).files) ++
      newM.layers.drop(o.layers.size).flatMap(_.files)))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(ver).getOrElse(startingVersion)
    val to = ver(end)
    require(from <= to,
      s"graft stream: offset went backwards ($from > $to)")
    val empty = () => org.apache.spark.sql.graftshim.asStreamingFrame(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    if (from == to) return empty()
    // every step needs both endpoint snapshots — vacuum guard is the
    // snapshot() require (a missing catalog version fails loudly)
    val snaps = (from to to).map(v =>
      v -> Catalog.snapshot(catRoot, Some(v)).getOrElse(sys.error(
        s"graft stream: catalog version $v of $catRoot was vacuumed " +
          "past the stream's cursor (retention must cover checkpoint " +
          "lag)"))).toMap
    def manifestAt(v: Int): Option[SnapshotStore.Manifest] =
      snaps(v).tables.get(table).map { rel =>
        val p = java.nio.file.Paths.get(tableRoot, rel)
        SnapshotStore.parse(new String(java.nio.file.Files
          .readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8))
      }
    val files = (from + 1 to to).flatMap { v =>
      val relOld = snaps(v - 1).tables.get(table)
      val relNew = snaps(v).tables.get(table)
      if (relOld == relNew) Nil // untouched by this catalog commit
      else relNew match {
        case None => sys.error(s"graft stream: table $table was " +
          s"DROPPED at catalog version $v — cannot continue")
        case Some(_) =>
          appendedFiles(manifestAt(v - 1), manifestAt(v).get) match {
            case Some(fs) => fs
            case None if skipChangeCommits => Nil
            case None => sys.error(s"graft stream: catalog version $v " +
              s"changed $table in a non-append way (overwrite/delete/" +
              "merge/optimize); a row stream only supports appends — " +
              "set skipChangeCommits=true to skip such commits, or " +
              "stream the path change feed " +
              "(readStream.format(\"graft\").load(tableRoot)) for " +
              "full CDC semantics")
          }
      }
    }
    if (files.isEmpty) return empty()
    import org.apache.spark.sql.functions.col
    // read PHYSICAL (file-space) names, then present the logical view
    // of the creation-time manifest — identity for unmapped tables
    val phys = StructType.fromDDL(createM.schemaDdl)
    val df = SnapshotStore.presentLogical(
      spark.read.schema(phys).parquet(files.map(f =>
        java.nio.file.Paths.get(tableRoot, f).toString): _*), createM)
      .select(schema.fields.map(f =>
        col(f.name).cast(f.dataType)).toSeq: _*)
    org.apache.spark.sql.graftshim.asStreamingFrame(df)
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftCatalogRowSource[$catRoot/$table, start=$startingVersion]"
}

/** The driver half of `writeStream.toTable("graft.main.t")`: executors
  * write parquet files straight into the table's data dir
  * ([[org.apache.spark.sql.graftshim.GraftStreamWriterFactory]] — data
  * never crosses the driver), and each epoch's commit publishes ONE
  * catalog transaction naming them
  * ([[Catalog.commitStagedFilesOnce]], txn = `queryId:epochId`), so a
  * replayed epoch after a sink crash commits nothing and deletes its
  * own re-staged files. Abort deletes the epoch's files — no
  * referenced state from failed attempts. */
class GraftStreamingWrite(catRoot: String, table: String,
    schema: StructType, queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.{PhysicalWriteInfo,
    WriterCommitMessage}
  import org.apache.spark.sql.graftshim.{GraftFileMessage,
    GraftStreamWriterFactory, GraftStreamingParquet}

  private val dirRel = "data/" + java.util.UUID.randomUUID().toString

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming
        .StreamingDataWriterFactory =
    GraftStreamWriterFactory(
      java.nio.file.Paths.get(catRoot, table).toString, dirRel,
      GraftStreamingParquet.writerConf(schema),
      // the TABLE's NOT NULL ordinals, enforced per row in the writer
      // (the incoming query schema types parquet sources nullable; the
      // files are ENCODED with the table schema, so a silent null would
      // corrupt a parquet `required` field)
      schema.fields.zipWithIndex.collect {
        case (f, i) if !f.nullable => i }.toSeq)

  private def filesOf(messages: Array[WriterCommitMessage]): Seq[String] =
    messages.toSeq.collect {
      case GraftFileMessage(p) if p.nonEmpty => p
    }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val files = filesOf(messages)
    // an EMPTY epoch commits NOTHING — beyond avoiding version noise,
    // this is what makes a source and sink sharing one catalog
    // converge: the sink's own commits move the catalog head, the
    // source sees the head move and emits an empty batch, and an empty
    // COMMIT here would move the head again — a self-feeding loop.
    // Zero files need no replay dedup (there is nothing to duplicate).
    if (files.isEmpty) return
    Catalog.commitStagedFilesOnce(catRoot, table, files,
      schema.toDDL, txn = s"$queryId:$epochId")
    ()
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    filesOf(messages).foreach { f =>
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(catRoot, table, f))
    }

  override def toString: String =
    s"GraftStreamingWrite[$catRoot/$table, $queryId]"
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
