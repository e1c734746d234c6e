package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException,
  NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsDelete,
  Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.sources.{And => FAnd, EqualNullSafe => FEqNs,
  EqualTo => FEq, Filter, GreaterThan => FGt,
  GreaterThanOrEqual => FGe, In => FIn, IsNotNull => FNotNull,
  IsNull => FIsNull, LessThan => FLt, LessThanOrEqual => FLe,
  Or => FOr}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import SnapshotStore.{Manifest, StatsPred}

/** The NAMED-TABLE SQL front door: [[Catalog]] (the multi-table atomic
  * snapshot layer) registered as a Spark
  * [[org.apache.spark.sql.connector.catalog.TableCatalog]], so pure SQL
  * reaches catalog tables by NAME — no path strings:
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.sources.GraftSqlCatalog
  *   spark.sql.catalog.graft.root = /data/my-catalog
  *
  *   SELECT ... FROM graft.main.t_main VERSION AS OF 0 m
  *     JOIN graft.main.t_price VERSION AS OF 0 p USING (k)
  *   DELETE FROM graft.main.events WHERE day < '2024-01-01'
  *   DROP TABLE graft.main.scratch
  * }}}
  *
  * Architecture is the Delta/Iceberg split: this class owns IDENTITY
  * (resolving `graft.<ns>.<table>` to a catalog-pinned [[Manifest]],
  * DDL, version time travel, the [[SupportsDelete]] routing), while the
  * READ plan is produced by [[GraftCatalogRelationRule]] — an injected
  * resolution rule that swaps the analyzer's DataSourceV2Relation for
  * the same pruned-scan-plus-layer-fold plan every other graft front
  * door uses ([[GraftFileIndex]] under Spark's parquet reader, layers
  * folded above). Writing a DSv2 Scan/Batch/PartitionReader stack would
  * re-implement what Spark's own file source already does better — the
  * rule reuses it wholesale, and file skipping from pushed filters
  * works identically through SQL-by-name.
  *
  * The catalog ROOT is read from the session conf AT CALL TIME (not
  * pinned at [[initialize]]): Spark's CatalogManager caches the plugin
  * instance per session, and a pinned root would silently stick across
  * `spark.conf.set("spark.sql.catalog.graft.root", ...)` — the
  * multi-corpus pattern every gate and test uses. Snapshot semantics
  * are per-STATEMENT: [[loadTable]] resolves the catalog head once per
  * analysis, so one query never sees a torn cross-table state
  * (the [[Catalog]] layer's contract), while two statements may see
  * different heads — exactly a SQL user's expectation.
  *
  * Namespace model: the flat [[Catalog]] table space is exposed as the
  * single namespace `main` — a [[Catalog]] table name (already
  * whitelisted to `[A-Za-z0-9._-]+`) IS the SQL table name.
  * `VERSION AS OF k` pins CATALOG version k (the cross-table-consistent
  * pin — not per-table versions, which the catalog layer deliberately
  * hides). */
class GraftSqlCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var initOptions: Map[String, String] = Map.empty

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    initOptions = options.asScala.toMap
  }

  override def name(): String = catalogName

  override def defaultNamespace(): Array[String] = Array(Ns)

  private val Ns = "main"

  /** Call-time root resolution (see class doc): session conf first,
    * initialize-time option as the fallback. */
  private def root: String =
    Option(SQLConf.get.getConfString(
        s"spark.sql.catalog.$catalogName.root", null))
      .orElse(initOptions.get("root"))
      .getOrElse(sys.error(
        s"graft catalog '$catalogName': set spark.sql.catalog." +
          s"$catalogName.root to the catalog root directory"))

  private def checkNs(namespace: Array[String]): Unit =
    if (!(namespace.sameElements(Array(Ns))))
      throw new NoSuchNamespaceException(namespace.toSeq)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    checkNs(namespace)
    Catalog.snapshot(root).map(_.tables.keys.toSeq.sorted).getOrElse(Nil)
      .map(t => Identifier.of(Array(Ns), t)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.sameElements(Array(Ns)) &&
      Catalog.snapshot(root).exists(_.tables.contains(ident.name))

  private def load(ident: Identifier, version: Option[Int]): Table = {
    // metadata tables: `graft.main.<t>.history|files|detail` arrives as
    // (namespace=[main, <t>], name=<kind>) — unambiguous because the
    // real namespace is flat `main`
    if (ident.namespace.length == 2 && ident.namespace()(0) == Ns &&
        (GraftMetaTables.kinds(ident.name) || ident.name == "changes")) {
      val r = root
      val t = ident.namespace()(1)
      val m = Catalog.tableManifest(r, t, version)
        .getOrElse(throw new NoSuchTableException(ident))
      val pinned = version.getOrElse(Catalog.versions(r).last)
      return if (ident.name == "changes")
        GraftChangesTable(r, t, pinned, SnapshotStore.logicalSchema(m))
      else GraftMetaTable(r, t, ident.name, pinned)
    }
    checkNs(ident.namespace)
    val r = root
    val m = Catalog.tableManifest(r, ident.name, version)
      .getOrElse(throw new NoSuchTableException(ident))
    GraftSqlTable(r, ident.name, m, version)
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** SQL `VERSION AS OF k` — pins CATALOG version k. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = try version.trim.toInt catch {
      case _: NumberFormatException => throw new NoSuchTableException(
        Seq(s"$ident at non-integer catalog version '$version'"))
    }
    if (!Catalog.versions(root).contains(v))
      throw new NoSuchTableException(
        Seq(s"$ident at catalog version $v (committed: " +
          s"${Catalog.versions(root).mkString(",")})"))
    load(ident, Some(v))
  }

  /** SQL `TIMESTAMP AS OF t` — `timestamp` arrives in MICROseconds
    * (the TableCatalog contract); resolves to the newest CATALOG
    * version committed at or before it (wall-clocks are stamped at
    * publish into the immutable version files, so the answer never
    * changes). Travel before the first commit refuses loudly. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val v = Catalog.versionAsOfTimestamp(root, timestamp / 1000L)
      .getOrElse(throw new NoSuchTableException(
        Seq(s"$ident at timestamp ${timestamp}us — before the " +
          "catalog's first commit")))
    load(ident, Some(v))
  }

  /** `CREATE TABLE graft.main.t (...) USING graft`: a CREATE-ONLY
    * catalog transaction ([[Catalog.commitCreate]] — an empty manifest
    * is a legal table; the first append fills it). Race-free: two
    * concurrent CREATE TABLEs are arbitrated by the catalog publish
    * itself, so the loser gets TableAlreadyExistsException instead of
    * silently overwriting the winner (a plain exists-then-commit check
    * would let both pass). Partitioning transforms are refused: layout
    * belongs to OPTIMIZE/zorder at the table layer. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    checkNs(ident.namespace)
    require(partitions.isEmpty,
      "graft catalog: PARTITIONED BY is not supported — cluster with " +
        "SnapshotStore.optimize(zorderBy) instead")
    val spark = SparkSession.active
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    try Catalog.commitCreate(root, ident.name, empty)
    catch {
      case _: Catalog.TableExistsException =>
        throw new org.apache.spark.sql.catalyst.analysis
          .TableAlreadyExistsException(
            (ident.namespace :+ ident.name).toSeq)
    }
    loadTable(ident)
  }

  /** `ALTER TABLE graft.main.t ADD COLUMNS (...)` — a DATA-LESS schema
    * evolution catalog transaction ([[Catalog.evolveSchema]]): existing
    * files backfill the new columns as NULL at read, pinned versions
    * keep the narrow schema. Only top-level nullable adds; every other
    * change kind is refused with its reason (type changes break the
    * immutable-files contract, renames would orphan stats/blooms). */
  /** `ALTER TABLE`: ADD COLUMNS (data-less widening), RENAME COLUMN
    * and DROP COLUMN (pure-metadata column mapping — physical file
    * names freeze at creation, so stats/bloom sidecars keep pruning
    * and no file is rewritten; see [[SnapshotStore.logicalSchema]]).
    * Each change commits its own catalog version (Spark sends one
    * statement's changes together; mixed batches apply in order). */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    checkNs(ident.namespace)
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "graft catalog: nested column adds are not supported: " +
            a.fieldNames.mkString("."))
        require(a.isNullable,
          s"graft catalog: added column '${a.fieldNames()(0)}' must be " +
            "nullable — existing files backfill NULL")
        require(a.position == null,
          "graft catalog: column position is not supported (new " +
            "columns append at the end)")
        Catalog.evolveSchema(root, ident.name, Seq(
          org.apache.spark.sql.types.StructField(
            a.fieldNames()(0), a.dataType, nullable = true)))
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          "graft catalog: nested column renames are not supported: " +
            r.fieldNames.mkString("."))
        Catalog.renameColumn(root, ident.name, r.fieldNames()(0),
          r.newName)
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          "graft catalog: nested column drops are not supported: " +
            d.fieldNames.mkString("."))
        Catalog.dropColumn(root, ident.name, d.fieldNames()(0))
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER TABLE change $other " +
          "(type changes break immutable files)")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    ident.namespace.sameElements(Array(Ns)) &&
      Catalog.drop(root, ident.name)

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: RENAME TABLE is not supported")

  // ------------------------------------------------- stored procedures
  // `CALL graft.system.<proc>(...)` — the maintenance half of the
  // lifecycle, SQL-callable so create → mutate → compact → GC needs no
  // Scala anywhere (the Spark 4 ProcedureCatalog API, the same door
  // Iceberg exposes its actions through). Procedures live under the
  // reserved `system` namespace; each returns its outcome as rows.

  override def listProcedures(namespace: Array[String])
      : Array[Identifier] = {
    if (!namespace.sameElements(Array(GraftProcedures.Ns)))
      throw new NoSuchNamespaceException(namespace.toSeq)
    GraftProcedures.names.map(n =>
      Identifier.of(Array(GraftProcedures.Ns), n)).toArray
  }

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures
        .UnboundProcedure = {
    require(ident.namespace.sameElements(Array(GraftProcedures.Ns)),
      s"graft catalog: procedures live under the '${GraftProcedures.Ns}'" +
        s" namespace (CALL graft.system.<name>(...)), got $ident")
    GraftProcedures.load(root, ident.name).getOrElse(
      throw new NoSuchTableException(Seq(
        s"procedure $ident (have: ${GraftProcedures.names.mkString(",")})")))
  }
}

/** One catalog-pinned table identity: the [[Manifest]] resolved at
  * analysis time (so the statement's plan is immune to concurrent
  * catalog commits) plus the coordinates [[GraftCatalogRelationRule]]
  * needs to build the pruned-scan-plus-fold plan. DELETE statements
  * route through [[SupportsDelete]] into [[Catalog.deleteWhere]] — a
  * pure-metadata predicate layer, never a rewrite. */
final case class GraftSqlTable(catRoot: String, tableName: String,
    manifest: Manifest, pinnedVersion: Option[Int])
    extends Table with SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsWrite {

  override def name(): String = s"graft.main.$tableName" +
    pinnedVersion.map(v => s"@v$v").getOrElse("")

  // the LOGICAL view (rename/drop mapping applied) — what SQL sees;
  // identical to the physical schema for unmapped tables
  override def schema(): StructType =
    SnapshotStore.logicalSchema(manifest)

  // BATCH_READ declares intent; the actual scan is the v1 relation the
  // resolution rule swaps in (a session without the rule fails loudly
  // at the capability CHECK stage instead of planning a broken scan).
  // Batch writes go through the V1Write bridge below (V1_BATCH_WRITE),
  // TRUNCATE enables `INSERT OVERWRITE` (the truncate-then-append
  // analysis path), and STREAMING_WRITE serves `writeStream.toTable`
  // through [[GraftStreamingWrite]] — executor-written parquet files,
  // one txn-deduped catalog transaction per epoch. MICRO_BATCH_READ is
  // deliberately ABSENT: streaming READS are served by the analyzer
  // rule swapping in the v1 catalog row source (the same front-door
  // pattern as batch reads), so a session without the rule fails the
  // capability check loudly instead of planning a broken v2 scan.
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)

  /** `INSERT INTO` / `INSERT OVERWRITE` / `df.writeTo("graft.main.t")`:
    * the V1Write bridge — the insert lands as ONE atomic catalog
    * transaction (append or overwrite), footer stats harvested like
    * any catalog commit, so the next read prunes. The incoming frame
    * is reconciled to the table schema (`Dataset.to`) because the
    * analyzer's insert coercion preserves value types but not
    * nullability flags, and catalog appends enforce exact DDL. */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(pinnedVersion.isEmpty,
      "graft catalog: cannot write to a VERSION AS OF pin")
    val table = this
    new org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var overwrite = false
      override def truncate()
          : org.apache.spark.sql.connector.write.WriteBuilder = {
        overwrite = true; this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            new org.apache.spark.sql.sources.InsertableRelation {
              override def insert(data: org.apache.spark.sql.DataFrame,
                  overwriteParam: Boolean): Unit = {
                val mode =
                  if (overwrite || overwriteParam) Catalog.Overwrite
                  else Catalog.Append
                Catalog.commit(table.catRoot, Map(table.tableName ->
                  ((data.to(table.schema()), mode))))
              }
            }
          // `writeStream.toTable("graft.main.t")`: one catalog
          // transaction per epoch, files written BY THE EXECUTORS
          // (see [[GraftStreamingWrite]]); txn = queryId:epochId makes
          // post-crash replays no-ops (exactly-once end to end).
          override def toStreaming: org.apache.spark.sql.connector
              .write.streaming.StreamingWrite = {
            require(!overwrite,
              "graft catalog: streaming supports APPEND output mode " +
                "only (use foreachBatch + replaceTableIf for " +
                "complete-mode shapes)")
            // the analyzer aligned the query's output to the table's
            // columns (names/types, table order); files are ENCODED
            // with the TABLE schema — its NOT NULL fields are enforced
            // per row in the writer, closing the nullability gap the
            // batch bridge closes with Dataset.to
            val ts = table.schema()
            val in = info.schema()
            require(in.fieldNames.sameElements(ts.fieldNames) &&
                in.fields.map(_.dataType).sameElements(
                  ts.fields.map(_.dataType)),
              s"graft catalog: streaming write schema [${in.toDDL}] " +
                s"does not align to table [${ts.toDDL}]")
            // executors encode files with the LOGICAL schema; a mapped
            // table needs physical names — refuse until a rewrite
            // (CALL graft.system.optimize) materializes the mapping
            require(table.manifest.logical.isEmpty &&
                table.manifest.dropped.isEmpty,
              s"graft catalog: streaming append into " +
                s"${table.tableName} with a column mapping " +
                "(RENAME/DROP COLUMN) is not supported — run CALL " +
                "graft.system.optimize to materialize the mapping " +
                "first")
            new GraftStreamingWrite(table.catRoot, table.tableName,
              ts, info.queryId())
          }
        }
    }
  }

  /** SQL `TRUNCATE TABLE`: an empty overwrite through the catalog
    * transaction — pure metadata (writeData of an empty frame writes
    * no files), pinned readers untouched, recoverable at the pre-
    * truncate catalog version. */
  override def truncateTable(): Boolean = {
    require(pinnedVersion.isEmpty,
      "graft catalog: cannot truncate a VERSION AS OF pin")
    val spark = SparkSession.active
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema())
    Catalog.commit(catRoot, Map(tableName -> ((empty, Catalog.Overwrite))))
    true
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    pinnedVersion.isEmpty &&
      GraftSqlTable.translate(filters).isDefined

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(pinnedVersion.isEmpty,
      "graft catalog: DELETE on a VERSION AS OF pin is meaningless — " +
        "delete the current version")
    val pred = GraftSqlTable.translate(filters).getOrElse(
      sys.error("graft catalog: DELETE predicate not translatable " +
        s"(canDeleteWhere contract violated): ${filters.mkString(", ")}"))
    Catalog.deleteWhere(catRoot, tableName, pred)
  }
}

object GraftSqlTable {

  private object CondHelper
      extends org.apache.spark.sql.catalyst.expressions.PredicateHelper {
    def conjuncts(e: org.apache.spark.sql.catalyst.expressions
        .Expression): Seq[org.apache.spark.sql.catalyst.expressions
        .Expression] = splitConjunctivePredicates(e)
  }

  /** Normalize a resolved condition for filter translation: expand
    * RuntimeReplaceable (BETWEEN, ilike, ... normally expand in the
    * optimizer's ReplaceExpressions — DML conversion runs at analysis
    * time), inline Spark 4's With/common-expression forms, and
    * constant-fold (type coercion wraps literals in casts the v1
    * translator refuses). Shared by the DELETE conversion and UPDATE's
    * lane chooser. */
  private[sources] def normalizeCond(cond: org.apache.spark.sql.catalyst
      .expressions.Expression): org.apache.spark.sql.catalyst
      .expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{
      CommonExpressionRef, Literal, With}
    val expanded = cond.transformUp {
      case r: org.apache.spark.sql.catalyst.expressions
          .RuntimeReplaceable => r.replacement
    }.transformUp {
      case w: With =>
        val byId = w.defs.map(d => d.id -> d.child).toMap
        w.child.transformUp {
          case ref: CommonExpressionRef => byId.getOrElse(ref.id, ref)
        }
    }
    expanded.transformUp {
      case e if e.foldable && !e.isInstanceOf[Literal] &&
          e.deterministic =>
        try Literal.create(e.eval(), e.dataType)
        catch { case _: Exception => e }
    }
  }

  /** Resolved condition → EXACT [[StatsPred]] (None when any conjunct
    * refuses) — how SQL UPDATE picks its commit lane: a translatable
    * WHERE takes the metadata layer-pair path, anything else falls back
    * to copy-on-write. Same exactness contract as DELETE's translation:
    * the predicate layer must remove precisely the matching rows. */
  private[sources] def condToStatsPred(cond: org.apache.spark.sql
      .catalyst.expressions.Expression): Option[StatsPred] = {
    val v1 = CondHelper.conjuncts(normalizeCond(cond))
      .map(e => org.apache.spark.sql.graftshim.translateV1Filter(e))
    if (v1.exists(_.isEmpty)) None
    else translate(v1.flatten.toArray)
  }

  /** v1 [[Filter]] → [[StatsPred]], EXACT (unlike the scan-side
    * conservative translation): a DELETE must remove precisely the
    * matching rows, so any untranslatable filter fails the whole
    * conjunction (canDeleteWhere answers false and Spark reports the
    * unsupported DELETE instead of silently over- or under-deleting).
    * Filter values arrive as external Scala/Java types — exactly what
    * [[StatsPred]] literals take. */
  private[sources] def translate(fs: Array[Filter]): Option[StatsPred] =
    fs.foldLeft(Option.empty[StatsPred]) { (acc, f) =>
      tr(f) match {
        case None    => return None
        case Some(p) => Some(acc.fold(p)(StatsPred.And(_, p)))
      }
    }

  private def tr(f: Filter): Option[StatsPred] = f match {
    case FEq(c, v) if v != null   => Some(StatsPred.Eq(c, v))
    case FEqNs(c, null)           => Some(StatsPred.IsNull(c))
    case FEqNs(c, v)              => Some(StatsPred.Eq(c, v))
    case FLt(c, v)                => Some(StatsPred.Lt(c, v))
    case FLe(c, v)                => Some(StatsPred.Le(c, v))
    case FGt(c, v)                => Some(StatsPred.Gt(c, v))
    case FGe(c, v)                => Some(StatsPred.Ge(c, v))
    case FIn(c, vs) if !vs.contains(null) =>
      Some(StatsPred.In(c, vs.toSeq))
    case FIsNull(c)               => Some(StatsPred.IsNull(c))
    case FNotNull(c)              => Some(StatsPred.IsNotNull(c))
    case FAnd(l, r) =>
      for { a <- tr(l); b <- tr(r) } yield StatsPred.And(a, b)
    case FOr(l, r) =>
      for { a <- tr(l); b <- tr(r) } yield StatsPred.Or(a, b)
    case _ => None
  }
}

/** The read half of the named catalog (injected by
  * [[graft.functions.GraftSparkExtensions]], same mechanism as
  * [[GraftLayerFoldRule]]): a resolved DataSourceV2Relation over a
  * [[GraftSqlTable]] is replaced DURING RESOLUTION with the v1 plan —
  * [[GraftFileIndex]]-pruned base scan, merge-on-read layers folded
  * above — re-aliased to the relation's output ExprIds.
  *
  * DELETE FROM is the exception: its relation must stay a v2 relation
  * so the predicate routes into [[GraftSqlTable.deleteWhere]] (the
  * metadata-only path). Spark's own metadata-only conversion
  * (`OptimizeMetadataOnlyDeleteFromTable`) only fires for
  * `SupportsRowLevelOperations` rewrite plans — a plain
  * [[org.apache.spark.sql.connector.catalog.SupportsDelete]] table's
  * `DeleteFromTable` would fall through to scan planning and fail on
  * the (deliberately) read-less v2 table. So this rule performs the
  * conversion itself at the end of resolution: fold the condition's
  * foldable subtrees (type coercion wraps literals in casts the v1
  * translator refuses), translate to connector predicates, and emit
  * `DeleteFromTableWithFilters` — a LEAF command the planner executes
  * directly against the table's deleteWhere. An untranslatable DELETE
  * fails HERE with a clear message instead of over- or under-deleting
  * (matching the canDeleteWhere contract). */
class GraftCatalogRelationRule(spark: SparkSession)
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
  import org.apache.spark.sql.catalyst.expressions.{Alias, Expression,
    Literal}
  import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable,
    DeleteFromTableWithFilters, LogicalPlan, MergeIntoTable, Project,
    UpdateTable}
  import org.apache.spark.sql.execution.datasources.DataSourceStrategy
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

  /** The target's v2 relation + graft table, when `plan` is a (possibly
    * aliased) relation over this catalog. */
  private def graftTarget(plan: LogicalPlan)
      : Option[(DataSourceV2Relation, GraftSqlTable)] =
    EliminateSubqueryAliases(plan) match {
      case r: DataSourceV2Relation => r.table match {
        case t: GraftSqlTable => Some((r, t))
        case _ => None
      }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d @ DeleteFromTable(rel, cond) =>
      graftTarget(rel) match {
        case Some((r, t)) if d.resolved =>
          val preds = toV2Predicates(cond)
          preds match {
            case Some(ps) if t.canDeleteWhere(ps.toArray) =>
              DeleteFromTableWithFilters(r, ps)
            case _ => throw new UnsupportedOperationException(
              "graft catalog: DELETE FROM supports only metadata " +
                "predicate deletes (comparisons/IN/null tests on " +
                s"bare columns, AND/OR); not expressible: $cond")
          }
        case _ => d
      }
    // SQL MERGE INTO: Spark's own row-level rewrite only serves
    // SupportsRowLevelOperations tables (and its planner refuses the
    // raw node) — convert the RESOLVED plan into the graft CoW merge
    // command. The target relation survives as v2 (markTargets below)
    // so the table identity is still here; the source subtree folds to
    // the pruned-scan plan like any read.
    case m: MergeIntoTable if m.resolved =>
      graftTarget(m.targetTable) match {
        case Some((r, t)) =>
          require(t.pinnedVersion.isEmpty,
            "graft catalog: MERGE INTO a VERSION AS OF pin is " +
              "meaningless — merge into the current version")
          require(!m.withSchemaEvolution,
            "graft catalog: MERGE ... WITH SCHEMA EVOLUTION is not " +
              "supported — ALTER TABLE ADD COLUMNS first")
          GraftDml.validateActions(m.matchedActions, m.notMatchedActions,
            m.notMatchedBySourceActions, r.output, t.schema())
          GraftMergeIntoCommand(t.catRoot, t.tableName, r.output,
            foldRelations(m.sourceTable), m.mergeCondition,
            m.matchedActions, m.notMatchedActions,
            m.notMatchedBySourceActions)
        case None => m
      }
    // SQL UPDATE: same conversion; the command itself picks the
    // layer-pair or copy-on-write lane per the WHERE's translatability.
    case u: UpdateTable if u.resolved =>
      graftTarget(u.table) match {
        case Some((r, t)) =>
          require(t.pinnedVersion.isEmpty,
            "graft catalog: UPDATE on a VERSION AS OF pin is " +
              "meaningless — update the current version")
          GraftUpdateCommand(t.catRoot, t.tableName, r.output,
            u.assignments, u.condition)
        case None => u
      }
    case _ => foldRelations(plan)
  }

  /** The generic READ substitution: every graft v2 relation that is not
    * a DML/write TARGET becomes the pruned-scan-plus-layer-fold v1
    * plan. Write/DML targets stay v2 relations — the planner routes
    * writes into the table's own write builder, and the MERGE/UPDATE/
    * DELETE conversions above need the table identity intact. Identity
    * set: one relation instance may legitimately appear as both a read
    * and a (distinct-instance) write target. */
  private def foldRelations(plan: LogicalPlan): LogicalPlan = {
    val writeTargets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[DataSourceV2Relation, java.lang.Boolean]())
    def markTargets(t: LogicalPlan): Unit = t.foreach {
      case r: DataSourceV2Relation => writeTargets.add(r); ()
      case _ => ()
    }
    plan.foreach {
      case i: org.apache.spark.sql.catalyst.plans.logical
          .InsertIntoStatement => markTargets(i.table)
      case a: org.apache.spark.sql.catalyst.plans.logical.AppendData =>
        markTargets(a.table)
      case o: org.apache.spark.sql.catalyst.plans.logical
          .OverwriteByExpression => markTargets(o.table)
      case o: org.apache.spark.sql.catalyst.plans.logical
          .OverwritePartitionsDynamic => markTargets(o.table)
      case m: MergeIntoTable => markTargets(m.targetTable)
      case u: UpdateTable => markTargets(u.table)
      case d: DeleteFromTable => markTargets(d.table)
      case _ => ()
    }
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation if !writeTargets.contains(r) =>
        r.table match {
          case t: GraftSqlTable =>
            val folded = GraftTable.tableFor(spark,
              java.nio.file.Paths.get(t.catRoot, t.tableName).toString,
              t.manifest)
            val foldPlan = folded.queryExecution.analyzed
            Project(foldPlan.output.zip(r.output).map { case (n, o) =>
              Alias(n, o.name)(exprId = o.exprId) }, foldPlan)
          // metadata tables (t.history / t.files / t.detail): the rows
          // are a driver-side manifest walk — substitute a local
          // relation, re-aliased to the v2 relation's ExprIds like any
          // other fold. Computed HERE (analysis time) so the rows honor
          // the same per-statement snapshot pin as data reads.
          case mt: GraftMetaTable =>
            val df = spark.createDataFrame(
              scala.jdk.CollectionConverters.SeqHasAsJava(
                GraftMetaTables.rows(mt)).asJava, mt.schema())
            val plan = df.queryExecution.analyzed
            Project(plan.output.zip(r.output).map { case (n, o) =>
              Alias(n, o.name)(exprId = o.exprId) }, plan)
          // `t.changes` — the SQL change feed: a REAL data plan (one
          // adjacent-version diff per touching catalog version,
          // unioned), substituted at analysis so its branch reads pin
          // the same per-statement snapshot as every other front door.
          // `_commit_version` is a per-branch literal, so version
          // predicates above prune whole branches at optimization.
          case ct: GraftChangesTable =>
            val plan = GraftChangesTable.planFor(spark, ct)
              .queryExecution.analyzed
            Project(plan.output.zip(r.output).map { case (n, o) =>
              Alias(n, o.name)(exprId = o.exprId) }, plan)
          case _ => r
        }
      // `spark.readStream.table("graft.main.t")`: swap the v2 streaming
      // relation (the table deliberately lacks MICRO_BATCH_READ) for
      // the v1 catalog ROW source — appended rows per catalog version,
      // read metadata-first from the manifests (GraftCatalogRowSource).
      // Options set on the reader (startingVersion, skipChangeCommits)
      // ride through extraOptions.
      case sr: org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
          if sr.table.isInstanceOf[GraftSqlTable] =>
        val t = sr.table.asInstanceOf[GraftSqlTable]
        require(t.pinnedVersion.isEmpty,
          "graft catalog: streaming a VERSION AS OF pin is " +
            "meaningless — pins are static; stream the live table")
        val v1 = org.apache.spark.sql.graftshim.v1StreamingRelation(
          spark, "graft",
          sr.extraOptions.asScala.toMap ++
            Map("catalog" -> t.catRoot, "table" -> t.tableName))
        Project(sr.output.map { o =>
          val src = v1.output.find(_.name == o.name).getOrElse(
            sys.error(s"graft stream: source lacks column ${o.name}"))
          Alias(src, o.name)(exprId = o.exprId)
        }, v1)
    }
  }

  /** Condition → connector predicates: constant-fold first (analysis
    * has not run ConstantFolding yet, and type coercion leaves literals
    * wrapped in casts), then the standard v1 translation per conjunct,
    * bridged to v2. None when ANY conjunct refuses — a DELETE predicate
    * must be exact. */
  private def toV2Predicates(cond: Expression): Option[
      Seq[org.apache.spark.sql.connector.expressions.filter.Predicate]] = {
    // normalization (RuntimeReplaceable/With expansion + constant fold)
    // is shared with UPDATE's lane chooser — GraftSqlTable.normalizeCond
    val v1 = splitConjunctivePredicates(
        GraftSqlTable.normalizeCond(cond))
      .map(org.apache.spark.sql.graftshim.translateV1Filter)
    if (v1.exists(_.isEmpty)) None
    else Some(v1.map(f =>
      org.apache.spark.sql.graftshim.filterToV2(f.get)))
  }
}
