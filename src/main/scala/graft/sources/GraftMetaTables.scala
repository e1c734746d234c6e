package graft.sources

import java.nio.file.{Files, Paths}
import java.util

import org.apache.spark.sql.Row
import org.apache.spark.sql.connector.catalog.{Table, TableCapability}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  StructField, StructType, TimestampType}

import SnapshotStore.{ColStats, Manifest, SizeKey}

/** SQL METADATA TABLES over the named catalog — the Iceberg/Delta
  * introspection surface (`t.history` / `DESCRIBE HISTORY`), reached by
  * suffixing a catalog table name:
  *
  * {{{
  *   SELECT * FROM graft.main.t.history   -- one row per commit to t
  *   SELECT * FROM graft.main.t.files     -- current data files + stats
  *   SELECT * FROM graft.main.t.detail    -- one-row table summary
  *   SELECT * FROM graft.main.t.files VERSION AS OF 3   -- time travel
  * }}}
  *
  * Resolution rides Spark's own multipart-name machinery: the analyzer
  * hands [[GraftSqlCatalog.loadTable]] the identifier
  * `(namespace=[main, t], name=history)`, which cannot collide with a
  * real table (the catalog's namespace is flat `main`). The result is a
  * [[GraftMetaTable]] — pinned to ONE catalog version at analysis, like
  * every other front door — and [[GraftCatalogRelationRule]] swaps it
  * for a local relation built from the rows below.
  *
  * Scale contract: every row here is MANIFEST-DERIVED — a metadata walk
  * (O(catalog versions) snapshot parses for history, O(manifest+sidecar
  * bytes) for files/detail), never a data-file read. The rows
  * materialize on the driver, which is the right place for them: they
  * ARE the driver-side metadata tier, the same bytes `loadTable` and
  * the pruning walk already parse there; at the measured 100k-file /
  * 400-segment scale that is ~25 MB of sidecar text, not data. */
object GraftMetaTables {

  /** The recognized suffixes. */
  val kinds: Set[String] = Set("history", "files", "detail")

  def schemaOf(kind: String): StructType = kind match {
    case "history" => StructType(Seq(
      StructField("catalog_version", IntegerType, nullable = false),
      StructField("table_version", IntegerType, nullable = false),
      StructField("ts", TimestampType, nullable = true),
      StructField("operation", StringType, nullable = false),
      StructField("n_files", IntegerType, nullable = false),
      StructField("n_layers", IntegerType, nullable = false),
      StructField("n_segments", IntegerType, nullable = false)))
    case "files" => StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("size_bytes", LongType, nullable = true),
      StructField("rows", LongType, nullable = true),
      StructField("segment", StringType, nullable = true),
      StructField("layer", IntegerType, nullable = true)))
    case "detail" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("table_version", IntegerType, nullable = false),
      StructField("catalog_version", IntegerType, nullable = false),
      StructField("n_files", IntegerType, nullable = false),
      StructField("n_layers", IntegerType, nullable = false),
      StructField("n_segments", IntegerType, nullable = false),
      StructField("n_blooms", IntegerType, nullable = false),
      StructField("cluster_by", StringType, nullable = true),
      StructField("total_bytes", LongType, nullable = true),
      StructField("schema_ddl", StringType, nullable = false)))
    case other => sys.error(s"graft: no metadata table '$other' " +
      s"(have: ${kinds.toSeq.sorted.mkString(", ")})")
  }

  /** Inline + segment-referenced file count, decided from the
    * manifest-list tier alone (SegmentRef carries nFiles) — zero
    * segment parses, the same rule the by-name emptiness check uses. */
  private def nFiles(m: Manifest): Int =
    m.files.size + m.segments.map(_.nFiles).sum

  /** Classify what a commit DID from its manifest pair — deterministic
    * manifest algebra, no recorded operation strings to trust. The
    * cascade goes from the most specific shape to OVERWRITE as the
    * catch-all; a commit that matches none of the narrow shapes is, by
    * definition, a rewrite of the file set. */
  private[sources] def classify(prev: Option[Manifest],
      m: Manifest): String = prev match {
    case None => "CREATE"
    case Some(p) =>
      val carried = m.layers.take(p.layers.size) == p.layers
      val added = if (carried) m.layers.drop(p.layers.size) else Nil
      val segsSame = m.segments.map(_.path) == p.segments.map(_.path)
      val sameData = m.files == p.files && segsSame &&
        m.layers == p.layers
      val filesGrew = p.files.toSet.subsetOf(m.files.toSet) &&
        p.segments.map(_.path).toSet
          .subsetOf(m.segments.map(_.path).toSet)
      if (sameData && m.schemaDdl == p.schemaDdl &&
          m.dropped.size > p.dropped.size) "DROP COLUMN"
      else if (sameData && m.schemaDdl == p.schemaDdl &&
          m.logical != p.logical) "RENAME COLUMN"
      else if (sameData && m.schemaDdl != p.schemaDdl) "ADD COLUMNS"
      else if (sameData && m.blooms != p.blooms) "INDEX"
      else if (sameData && m.cluster != p.cluster) "CLUSTER"
      // predicate delete: pred layer(s) appended; inline files may
      // SHRINK (deleteTransform drops files the stats prove
      // all-matching) but never grow, segments untouched
      else if (carried && added.nonEmpty &&
          added.forall(_.pred.nonEmpty) &&
          m.files.toSet.subsetOf(p.files.toSet) && segsSame) "DELETE"
      else if (carried && added.nonEmpty && filesGrew &&
          nFiles(m) == nFiles(p)) {
        if (added.forall(l => l.key.isEmpty && l.pred.isEmpty))
          "APPEND"
        else "MERGE_ON_READ"
      }
      else if (carried && added.isEmpty && filesGrew &&
          nFiles(m) > nFiles(p)) "APPEND"
      else if (nFiles(m) == 0 && m.layers.isEmpty &&
          (nFiles(p) > 0 || p.layers.nonEmpty)) "TRUNCATE"
      else if (m.layers.size < p.layers.size ||
          (p.layers.nonEmpty && m.layers.isEmpty)) "REWRITE"
      else "OVERWRITE"
  }

  private def tableRoot(t: GraftMetaTable): String =
    Paths.get(t.catRoot, t.tableName).toString

  private def manifestAt(t: GraftMetaTable, v: Int): Option[Manifest] =
    Catalog.snapshot(t.catRoot, Some(v))
      .flatMap(_.tables.get(t.tableName)).map { rel =>
        val p = Paths.get(tableRoot(t), rel)
        SnapshotStore.parse(new String(Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8))
      }

  def rows(t: GraftMetaTable): Seq[Row] = t.kind match {
    case "history" => historyRows(t)
    case "files"   => fileRows(t)
    case "detail"  => detailRows(t)
    case other     => sys.error(s"graft: no metadata table '$other'")
  }

  /** One row per catalog version (≤ the pin) whose commit CHANGED this
    * table — versions where some other table committed cost one
    * snapshot parse and emit nothing, mirroring the streaming source's
    * metadata-first step rule. */
  private def historyRows(t: GraftMetaTable): Seq[Row] = {
    val vs = Catalog.versions(t.catRoot).filter(_ <= t.catVersion)
    var prevRel: Option[String] = None
    var prevM: Option[Manifest] = None
    vs.flatMap { v =>
      val snap = Catalog.snapshot(t.catRoot, Some(v)).getOrElse(
        sys.error(s"graft: catalog version $v vanished under " +
          t.catRoot))
      val rel = snap.tables.get(t.tableName)
      if (rel == prevRel) None
      else rel match {
        case None =>
          // dropped (re-create may follow); emit nothing for the drop
          prevRel = None; prevM = None; None
        case Some(_) =>
          val m = manifestAt(t, v).get
          val row = Row(v, m.version,
            if (snap.ts == 0L) null else new java.sql.Timestamp(snap.ts),
            classify(prevM, m), nFiles(m), m.layers.size,
            m.segments.size)
          prevRel = rel; prevM = Some(m)
          Some(row)
      }
    }
  }

  private def rowsOf(stats: Map[String, Map[String, ColStats]],
      f: String): Any =
    stats.get(f).flatMap(cols => (cols - SizeKey).values.headOption)
      .map(_.rows).orNull

  private def sizeOf(stats: Map[String, Map[String, ColStats]],
      f: String): Any =
    stats.get(f).flatMap(_.get(SizeKey)).map(_.rows).orNull

  /** Every file the pinned snapshot references — base inline files,
    * segment-referenced files (tagged with their segment), and
    * merge-on-read layer files (tagged with the layer ordinal,
    * 1-based in fold order). Sizes/rows come from the stats sidecars;
    * a file a sidecar does not cover reports NULL (never a stat()
    * call — this is a metadata view, not a filesystem walk). */
  private def fileRows(t: GraftMetaTable): Seq[Row] = {
    val root = tableRoot(t)
    val m = manifestAt(t, t.catVersion).getOrElse(
      sys.error(s"graft: table ${t.tableName} absent at catalog " +
        s"version ${t.catVersion}"))
    val baseStats = SnapshotStore.fileStats(root, m)
    val base = m.files.map(f =>
      Row(f, sizeOf(baseStats, f), rowsOf(baseStats, f), null, null))
    val seg = m.segments.flatMap { ref =>
      val sm = SnapshotStore.readSegmentManifest(root, ref)
      val ss = SnapshotStore.fileStats(root, sm)
      sm.files.map(f =>
        Row(f, sizeOf(ss, f), rowsOf(ss, f), ref.path, null))
    }
    val layers = m.layers.zipWithIndex.flatMap { case (l, i) =>
      val ls = SnapshotStore.fileStats(root,
        Manifest(-1, -1, "", l.files, statsFile = l.statsFile))
      l.files.map(f =>
        Row(f, sizeOf(ls, f), rowsOf(ls, f), null, i + 1))
    }
    base ++ seg ++ layers
  }

  private def detailRows(t: GraftMetaTable): Seq[Row] = {
    val root = tableRoot(t)
    val m = manifestAt(t, t.catVersion).getOrElse(
      sys.error(s"graft: table ${t.tableName} absent at catalog " +
        s"version ${t.catVersion}"))
    val sizes = SnapshotStore.allFileSizes(root, m) ++
      m.layers.flatMap(l => SnapshotStore.fileSizes(root,
        Manifest(-1, -1, "", l.files, statsFile = l.statsFile)))
    val total: Any = if (sizes.isEmpty && (nFiles(m) > 0 ||
        m.layers.exists(_.files.nonEmpty))) null
      else sizes.values.sum
    Seq(Row(s"graft.main.${t.tableName}", m.version, t.catVersion,
      nFiles(m), m.layers.size, m.segments.size, m.blooms.size,
      if (m.cluster.isEmpty) null else m.cluster.mkString(","),
      // the USER-facing schema (rename/drop mapping applied) — the
      // physical layout is an implementation detail
      total, SnapshotStore.logicalSchema(m).toDDL))
  }
}

/** One resolved metadata-table identity: the catalog version is pinned
  * at analysis (like every graft front door), so the statement's rows
  * are immune to concurrent commits. Declares BATCH_READ intent only —
  * the actual rows are substituted by [[GraftCatalogRelationRule]]; a
  * session without the extension rule fails at planning instead of
  * producing an empty scan. */
final case class GraftMetaTable(catRoot: String, tableName: String,
    kind: String, catVersion: Int) extends Table {

  override def name(): String =
    s"graft.main.$tableName.$kind@v$catVersion"

  override def schema(): StructType = GraftMetaTables.schemaOf(kind)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
}

/** SQL CHANGE FEED — `SELECT * FROM graft.main.t.changes`: every row
  * the table gained or lost, per catalog version, since its creation
  * (Delta's `table_changes` / Iceberg's changelog scan, served as a
  * metadata-suffix table like `t.history`). Output is the table's data
  * columns (at the pinned catalog version) plus
  *
  *   - `_change` — 'added' | 'removed'
  *   - `_n_rows` — the row's multiplicity delta (bag semantics)
  *   - `_commit_version` — the CATALOG version whose commit introduced
  *     the change (the same axis `t.history` and `VERSION AS OF` speak)
  *
  * Unlike the other metadata suffixes this is a real DATA scan — one
  * adjacent-version [[SnapshotStore.diffFrames]] per catalog version
  * that touched the table, unioned. Two properties make it scale:
  * adjacent versions SHARE most files, whose identical counts cancel in
  * the diff's aggregate (the consumer pays O(changed data), not
  * O(versions × table)); and each branch tags `_commit_version` as a
  * LITERAL, so a `WHERE _commit_version = k` / `BETWEEN` predicate
  * constant-folds every other branch to `Filter(false)` and Catalyst's
  * empty-relation propagation deletes those branches' scans from the
  * plan outright — version-range selection is optimization-time
  * pruning, not runtime filtering (spec-pinned). */
final case class GraftChangesTable(catRoot: String, tableName: String,
    catVersion: Int, dataSchema: StructType) extends Table {

  override def name(): String =
    s"graft.main.$tableName.changes@v$catVersion"

  override def schema(): StructType = GraftChangesTable.fullSchema(dataSchema)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
}

object GraftChangesTable {

  val ChangeCol  = "_change"
  val NRowsCol   = "_n_rows"
  val VersionCol = "_commit_version"

  private val MetaCols = Seq(ChangeCol, NRowsCol, VersionCol)

  def fullSchema(dataSchema: StructType): StructType = {
    MetaCols.foreach(c => require(!dataSchema.fieldNames.contains(c),
      s"graft: t.changes reserves column name '$c' but the table " +
        "schema already defines it"))
    StructType(dataSchema.fields.toSeq ++ Seq(
      StructField(ChangeCol, StringType, nullable = true),
      StructField(NRowsCol, LongType, nullable = true),
      StructField(VersionCol, IntegerType, nullable = true)))
  }

  /** The feed plan: walk catalog versions ≤ the pin (one snapshot parse
    * each — the metadata-first step rule `t.history` and the streaming
    * source share), keep those whose commit changed this table, and
    * union one tagged branch per kept version: the (re)creation version
    * contributes its full content as 'added'; every later version
    * contributes the adjacent diff against the previous manifest.
    * Branch reads resolve through [[Catalog.readTable]] at the branch's
    * catalog version, so layered states fold exactly as a pinned read
    * would. Schema evolution between versions aligns on the common
    * columns ([[SnapshotStore.SchemaChange.Common]]) — a feed consumer
    * reading across an ADD COLUMNS sees the new column NULL-filled on
    * pre-evolution branches (`unionByName(allowMissingColumns)`). */
  def planFor(spark: org.apache.spark.sql.SparkSession,
      t: GraftChangesTable): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val vs = Catalog.versions(t.catRoot).filter(_ <= t.catVersion)
    // every branch's data columns re-align to the PINNED version's
    // logical names (same physical-identity walk as the adjacent-diff
    // alignment below), so a feed read after a RENAME shows the whole
    // history under the current name instead of NULL-splitting it
    val pinM = Catalog.tableManifest(t.catRoot, t.tableName,
      Some(t.catVersion)).getOrElse(sys.error(
        s"graft: table ${t.tableName} absent at catalog version " +
          s"${t.catVersion}"))
    var prevRel: Option[String] = None
    var prev: Option[(Manifest, org.apache.spark.sql.DataFrame)] = None
    var prevV: Int = -1   // catalog version of the kept `prev` state
    // align the previous version's logical view to the NEXT version's
    // names through the shared PHYSICAL identity, so a RENAME COLUMN
    // branch diffs the same column against itself (and cancels) rather
    // than seeing disjoint schemas; columns dropped in the next
    // version leave both sides. Falls back to logical-name identity
    // when a rewrite re-based the physical names.
    def alignTo(df: org.apache.spark.sql.DataFrame, pm: Manifest,
        cm: Manifest): org.apache.spark.sql.DataFrame = {
      if (pm.logical == cm.logical && pm.dropped == cm.dropped) df
      else {
        val pInv = pm.logical.map(_.swap).toMap
        val cRen = cm.logical.toMap
        val cPhys = org.apache.spark.sql.types.StructType
          .fromDDL(cm.schemaDdl).fieldNames.toSet
        df.select(df.columns.toSeq.flatMap { c =>
          val phys = pInv.getOrElse(c, c)
          if (cm.dropped.contains(phys)) None
          else if (!cPhys.contains(phys)) Some(col(c))
          else Some(col(c).as(cRen.getOrElse(phys, phys)))
        }: _*)
      }
    }
    val branches = vs.flatMap { v =>
      val snap = Catalog.snapshot(t.catRoot, Some(v)).getOrElse(
        sys.error(s"graft: catalog version $v vanished under " +
          t.catRoot))
      val rel = snap.tables.get(t.tableName)
      if (rel == prevRel) None
      else rel match {
        case None =>
          // dropped: the feed records the drop as the removal of the
          // last state, so the net signed sum TELESCOPES to the live
          // table across the whole lifetime — including through a
          // drop + re-create (which restarts as a fresh creation
          // branch). Reads the pre-drop pin; like any time travel it
          // needs the files to not have been vacuumed yet.
          val out = prev.map { case (pm, p) =>
            val cols = p.columns.toSeq
            alignTo(p.groupBy(cols.map(col): _*)
              .agg(count(lit(1)).as(NRowsCol))
              .withColumn(ChangeCol, lit("removed"))
              .withColumn(VersionCol, lit(v)), pm, pinM)
          }
          prevRel = None; prev = None; out
        case Some(_) =>
          val curM = Catalog.tableManifest(t.catRoot, t.tableName,
            Some(v)).get
          val cur = Catalog.readTable(spark, t.catRoot, t.tableName,
            Some(v))
          // adjacent-pair manifest-delta recognizer first
          // ([[SnapshotStore.incrementalDiffFrames]]): a recognized
          // commit contributes a branch that scans only what it
          // touched; a provably-empty commit (pure metadata)
          // contributes NO branch at all. Catalog frames are LOGICAL
          // presentations, so the fast path only applies to unmapped
          // manifests (where logical == physical); anything else falls
          // back to the generic two-sided diff, unchanged.
          val inc = prev match {
            case Some((pm, p)) if pm.logical.isEmpty &&
                pm.dropped.isEmpty && curM.logical.isEmpty &&
                curM.dropped.isEmpty =>
              SnapshotStore.incrementalDiffFrames(spark,
                Catalog.tableRoot(t.catRoot, t.tableName), pm, curM, p,
                // predicate-delete candidates through the stats tier,
                // pinned at the PREVIOUS kept catalog version
                prunedPrev = Some(pr => Catalog.readTableWhere(spark,
                  t.catRoot, t.tableName, pr, Some(prevV))._1))
            case _ => SnapshotStore.IncDiff.Unrecognized
          }
          val branch = inc match {
            case SnapshotStore.IncDiff.Empty => None
            case SnapshotStore.IncDiff.Frame(df) =>
              Some(df.withColumnRenamed("change", ChangeCol)
                .withColumnRenamed("n_rows", NRowsCol))
            case SnapshotStore.IncDiff.Unrecognized => Some(prev match {
              case None =>
                val cols = cur.columns.toSeq
                cur.groupBy(cols.map(col): _*)
                  .agg(count(lit(1)).as(NRowsCol))
                  .withColumn(ChangeCol, lit("added"))
              case Some((pm, p)) =>
                SnapshotStore.diffFrames(alignTo(p, pm, curM), cur,
                    SnapshotStore.SchemaChange.Common,
                    s"${t.tableName}@catalog v$v")
                  .withColumnRenamed("change", ChangeCol)
                  .withColumnRenamed("n_rows", NRowsCol)
            })
          }
          prevRel = rel; prev = Some((curM, cur)); prevV = v
          branch.map(b => alignTo(b.withColumn(VersionCol, lit(v)),
            curM, pinM))
      }
    }
    val full = fullSchema(t.dataSchema)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], full)
    if (branches.isEmpty) empty
    else {
      val u = branches.reduce(
        _.unionByName(_, allowMissingColumns = true))
      // project to the PINNED schema's column order; branches older
      // than an ADD COLUMNS lack the new column and union filled NULLs
      u.select(full.fieldNames.toSeq.map(col): _*)
    }
  }
}
