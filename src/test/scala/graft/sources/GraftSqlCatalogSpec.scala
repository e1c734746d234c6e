package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraftSqlCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog(): String = {
    val root = Files.createTempDirectory("graftsqlcat").toString
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", root)
    root
  }

  test("SQL by name: SELECT/JOIN over graft.main.* resolve through the " +
      "catalog, VERSION AS OF pins the CATALOG version, scans prune " +
      "through the manifest stats tier") {
    val root = freshCatalog()
    val t1 = spark.range(0, 400).repartitionByRange(4, col("id"))
      .select(col("id"), (col("id") % 5).as("grp"))
    val p1 = spark.range(0, 400)
      .select(col("id"), (col("id") * 2).as("price"))
    Catalog.commit(root, Map(
      "t_main"  -> ((t1, Catalog.Overwrite)),
      "t_price" -> ((p1, Catalog.Overwrite))))              // cat v0
    // v1 overwrites prices — the pinned join below must not see it
    Catalog.commit(root, Map(
      "t_price" -> ((spark.range(0, 400)
        .select(col("id"), lit(-1L).as("price")), Catalog.Overwrite))))
    // head read sees v1
    assert(spark.sql("SELECT sum(price) FROM graft.main.t_price")
      .as[Long].head() === -400L)
    // VERSION AS OF 0 pins the catalog version for BOTH sides
    val joined = spark.sql(
      """SELECT m.grp, CAST(SUM(p.price) AS BIGINT) AS s
         FROM graft.main.t_main VERSION AS OF 0 m
         JOIN graft.main.t_price VERSION AS OF 0 p USING (id)
         GROUP BY m.grp ORDER BY m.grp""")
    val want = t1.join(p1, "id").groupBy("grp")
      .agg(sum("price").as("s")).orderBy("grp")
      .as[(Long, Long)].collect().toSeq
    assert(joined.as[(Long, Long)].collect().toSeq === want)
    // pruning: a range filter through SQL-by-name opens 1 of 4 files
    val got = spark.sql(
      "SELECT count(*) FROM graft.main.t_main WHERE id BETWEEN 120 AND 180")
      .as[Long].head()
    assert(got === 61)
    val tr = java.nio.file.Paths.get(root, "t_main").toString
    val rep = GraftFileIndex.lastReport(tr).get
    assert(rep.filesListed === 4 && rep.filesOpened === 1, rep.toString)
    // identity surface
    assert(spark.sql("SHOW TABLES IN graft.main").collect()
      .map(_.getString(1)).toSet === Set("t_main", "t_price"))
  }

  test("DELETE FROM lands a data-less predicate layer through the " +
      "catalog transaction; DROP removes the name, pinned versions " +
      "stay readable") {
    val root = freshCatalog()
    val t = spark.range(0, 400).repartitionByRange(4, col("id"))
      .select(col("id"), (col("id") % 7).as("v"))
    Catalog.commit(root, Map("ev" -> ((t, Catalog.Overwrite))))  // v0
    val m0 = Catalog.tableManifest(root, "ev").get
    val dataBefore = Files.walk(java.nio.file.Paths.get(root))
      .filter(p => p.toString.endsWith(".parquet")).count()
    spark.sql("DELETE FROM graft.main.ev WHERE id BETWEEN 100 AND 250")
    val m1 = Catalog.tableManifest(root, "ev").get
    // metadata only: no data files written, fully-covered file dropped,
    // exactly one predicate layer
    assert(Files.walk(java.nio.file.Paths.get(root))
      .filter(p => p.toString.endsWith(".parquet")).count() === dataBefore)
    assert(m1.files.toSet.subsetOf(m0.files.toSet) &&
      m1.files.size < m0.files.size)
    assert(m1.layers.size === 1 && m1.layers.head.pred.nonEmpty &&
      m1.layers.head.files.isEmpty)
    // SQL sees the post-delete rows (layer folds through the rule)
    assert(spark.sql("SELECT count(*) FROM graft.main.ev")
      .as[Long].head() === 249L)
    // pinned catalog version still sees all 400
    assert(spark.sql(
      "SELECT count(*) FROM graft.main.ev VERSION AS OF 0")
      .as[Long].head() === 400L)
    // an untranslatable DELETE fails instead of over/under-deleting
    val e = intercept[Exception] {
      spark.sql("DELETE FROM graft.main.ev WHERE v + 1 = 3")
    }
    assert(e.getMessage.toLowerCase.contains("delete"))
    // DROP TABLE: the name goes; the pre-drop catalog version still
    // resolves it
    spark.sql("DROP TABLE graft.main.ev")
    assert(!new GraftSqlCatalog { initialize("graft",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("root", root))) }
      .tableExists(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("main"), "ev")))
    assert(Catalog.tableManifest(root, "ev").isEmpty)
    assert(Catalog.tableManifest(root, "ev", Some(1)).isDefined)
  }

  test("INSERT INTO / INSERT OVERWRITE / TRUNCATE route through catalog " +
      "transactions; the insert SOURCE still folds through the rule; " +
      "writes to a VERSION AS OF pin are refused") {
    val root = freshCatalog()
    Catalog.commit(root, Map(
      "sink" -> ((spark.range(0, 10)
        .select(col("id"), (col("id") * 10).as("v")), Catalog.Overwrite)),
      "src"  -> ((spark.range(100, 110)
        .select(col("id"), (col("id") * 10).as("v")), Catalog.Overwrite))))
    // INSERT INTO ... SELECT: the target stays a v2 write, the source
    // resolves through the same fold rule as any read
    spark.sql("INSERT INTO graft.main.sink SELECT id, v FROM " +
      "graft.main.src WHERE id < 105")
    assert(spark.sql("SELECT count(*) FROM graft.main.sink")
      .as[Long].head() === 15L)
    // the insert landed as a catalog version (atomic transaction)
    assert(Catalog.versions(root).size === 2)
    // INSERT INTO ... VALUES (nullability reconciled via Dataset.to)
    spark.sql("INSERT INTO graft.main.sink VALUES (999, 1), (998, 2)")
    assert(spark.sql(
      "SELECT count(*) FROM graft.main.sink WHERE id >= 998")
      .as[Long].head() === 2L)
    // INSERT OVERWRITE replaces
    spark.sql("INSERT OVERWRITE graft.main.sink SELECT id, v FROM " +
      "graft.main.src")
    assert(spark.sql("SELECT count(*) FROM graft.main.sink")
      .as[Long].head() === 10L)
    // TRUNCATE: empty, recoverable at the prior catalog version
    val preTruncate = Catalog.versions(root).max
    spark.sql("TRUNCATE TABLE graft.main.sink")
    assert(spark.sql("SELECT count(*) FROM graft.main.sink")
      .as[Long].head() === 0L)
    assert(Catalog.readTable(spark, root, "sink",
      version = Some(preTruncate)).count() === 10L)
    // a pinned relation refuses writes
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.main.sink VERSION AS OF 0 VALUES (1, 1)")
    }
    assert(e != null)
  }

  test("ALTER TABLE ADD COLUMNS is a data-less catalog evolution: old " +
      "files backfill NULL, pinned versions keep the narrow schema, " +
      "inserts fill the new column, refusals are loud") {
    val root = freshCatalog()
    Catalog.commit(root, Map("ev" -> ((spark.range(0, 20)
      .select(when(col("id") >= 0, col("id")).as("id"),
        (col("id") % 3).as("g")), Catalog.Overwrite))))        // cat v0
    val dataBefore = Files.walk(java.nio.file.Paths.get(root))
      .filter(p => p.toString.endsWith(".parquet")).count()
    spark.sql("ALTER TABLE graft.main.ev ADD COLUMNS (tag STRING)")
    // metadata only; new column reads as NULL off the old files
    assert(Files.walk(java.nio.file.Paths.get(root))
      .filter(p => p.toString.endsWith(".parquet")).count() === dataBefore)
    assert(spark.sql(
      "SELECT count(*) FROM graft.main.ev WHERE tag IS NULL")
      .as[Long].head() === 20L)
    // pinned catalog version keeps the narrow schema
    assert(spark.sql("SELECT * FROM graft.main.ev VERSION AS OF 0")
      .columns.toSeq === Seq("id", "g"))
    // inserts land in the widened schema
    spark.sql("INSERT INTO graft.main.ev VALUES (100, 1, 'x')")
    assert(spark.sql(
      "SELECT count(*) FROM graft.main.ev WHERE tag = 'x'")
      .as[Long].head() === 1L)
    // refusals: duplicate column, NOT NULL add, other change kinds
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.main.ev ADD COLUMNS (g BIGINT)")
    }
    intercept[Exception] {
      spark.sql(
        "ALTER TABLE graft.main.ev ADD COLUMNS (must STRING NOT NULL)")
    }
    intercept[Exception] { // type changes break immutable files
      spark.sql("ALTER TABLE graft.main.ev ALTER COLUMN g TYPE STRING")
    }
    // RENAME COLUMN is supported since the column-mapping round
    // (ColumnMappingSpec pins its semantics); here just the door:
    spark.sql("ALTER TABLE graft.main.ev RENAME COLUMN g TO grp")
    assert(spark.sql("SELECT grp FROM graft.main.ev").columns
      .toSeq === Seq("grp"))
  }

  test("CREATE TABLE AS SELECT composes createTable + insert through " +
      "the catalog") {
    val root = freshCatalog()
    Catalog.commit(root, Map("base" -> ((spark.range(0, 40)
      .select(col("id"), (col("id") % 4).as("g")), Catalog.Overwrite))))
    spark.sql("CREATE TABLE graft.main.derived AS " +
      "SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM graft.main.base " +
      "GROUP BY g")
    assert(spark.sql("SELECT * FROM graft.main.derived").count() === 4L)
    assert(Catalog.tableManifest(root, "derived").isDefined)
  }

  test("CREATE TABLE lands an empty catalog table; catalog reads " +
      "refuse unknown namespaces and non-integer versions") {
    val root = freshCatalog()
    spark.sql("CREATE TABLE graft.main.fresh (id BIGINT, tag STRING)")
    assert(spark.sql("SELECT * FROM graft.main.fresh").count() === 0)
    // a later Catalog.commit append fills it through the same name
    // (Option makes the frame's id NULLABLE, matching the CREATE DDL)
    Catalog.commit(root, Map("fresh" ->
      ((Seq((Option(1L), "a"), (Option(2L), "b")).toDF("id", "tag"),
        Catalog.Append))))
    assert(spark.sql("SELECT count(*) FROM graft.main.fresh")
      .as[Long].head() === 2L)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.other.fresh").collect()
    }
    assert(e.getMessage.contains("other") ||
      e.getMessage.toLowerCase.contains("namespace") ||
      e.getMessage.toLowerCase.contains("not found"), e.getMessage)
  }

  test("TIMESTAMP AS OF: a timestamp between two commits reads the " +
      "earlier catalog version; before the first commit refuses") {
    val root = freshCatalog()
    Catalog.commit(root, Map("tt" ->
      ((spark.range(0, 5).toDF("id"), Catalog.Overwrite))))      // v0
    val ts0 = Catalog.snapshot(root, Some(0)).get.ts
    assert(ts0 > 0L, "publish must stamp the commit wall-clock")
    Thread.sleep(30)
    Catalog.commit(root, Map("tt" ->
      ((spark.range(0, 50).toDF("id"), Catalog.Overwrite))))     // v1
    val ts1 = Catalog.snapshot(root, Some(1)).get.ts
    assert(ts1 > ts0)
    // between the two commits -> v0; at/after v1 -> v1
    assert(Catalog.versionAsOfTimestamp(root, (ts0 + ts1) / 2) ===
      Some(0))
    assert(Catalog.versionAsOfTimestamp(root, ts1) === Some(1))
    assert(Catalog.versionAsOfTimestamp(root, ts0 - 1) === None)
    // pure SQL: format the midpoint in the session's UTC clock
    val mid = java.time.Instant.ofEpochMilli((ts0 + ts1) / 2)
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    assert(spark.sql(
      s"SELECT count(*) FROM graft.main.tt TIMESTAMP AS OF '$mid'")
      .as[Long].head() === 5L)
    assert(spark.sql("SELECT count(*) FROM graft.main.tt")
      .as[Long].head() === 50L)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.main.tt TIMESTAMP AS OF " +
        "'1999-01-01 00:00:00'").collect()
    }
    assert(e.getMessage.contains("before the") ||
      e.getMessage.toLowerCase.contains("cannot be found") ||
      e.getMessage.toLowerCase.contains("not found"), e.getMessage)
  }

  test("MERGE INTO: three-clause merge with per-clause conditions, " +
      "first-matching-clause semantics, ONE catalog transaction") {
    val root = freshCatalog()
    Catalog.commit(root, Map("m" ->
      ((spark.range(0, 10).select(col("id"), (col("id") % 7).as("v")),
        Catalog.Overwrite))))
    spark.range(5, 15).select(col("id"), lit(100L).as("v"),
      (col("id") % 2 === 0).as("del"))
      .createOrReplaceTempView("sqlcat_merge_src")
    val v0 = Catalog.versions(root).max
    spark.sql("""MERGE INTO graft.main.m t USING sqlcat_merge_src s
      ON t.id = s.id
      WHEN MATCHED AND s.del THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v + t.v
      WHEN NOT MATCHED AND NOT s.del THEN INSERT (id, v)
        VALUES (s.id, -1)""")
    assert(Catalog.versions(root).max === v0 + 1,
      "one catalog transaction per MERGE statement")
    val got = Catalog.readTable(spark, root, "m")
      .as[(Long, Long)].collect().toSet
    // matched 5..9: evens delete, odds update to 100+v; unmatched
    // source 10..14: only odds insert (del filters evens)
    val want = (0L to 4L).map(i => (i, i % 7)).toSet ++
      Set((5L, 105L), (7L, 100L), (9L, 102L), (11L, -1L), (13L, -1L))
    assert(got === want)
    // WHEN NOT MATCHED BY SOURCE: delete the untouched low keys
    spark.sql("""MERGE INTO graft.main.m t USING sqlcat_merge_src s
      ON t.id = s.id
      WHEN NOT MATCHED BY SOURCE AND t.id < 4 THEN DELETE""")
    assert(Catalog.readTable(spark, root, "m")
      .as[(Long, Long)].collect().toSet ===
      want.filterNot { case (i, _) => i < 4 })
  }

  test("MERGE INTO refusals: duplicate source matches, incomplete " +
      "INSERT column lists, nested assignments") {
    val root = freshCatalog()
    Catalog.commit(root, Map("r" ->
      ((spark.range(0, 5).select(col("id"), (col("id") % 3).as("v")),
        Catalog.Overwrite))))
    // two source rows hit target id=3 -> nondeterministic, refuse
    spark.range(0, 2).select(lit(3L).as("id"), col("id").as("v"))
      .createOrReplaceTempView("sqlcat_dup_src")
    val e1 = intercept[Exception] {
      spark.sql("""MERGE INTO graft.main.r t USING sqlcat_dup_src s
        ON t.id = s.id WHEN MATCHED THEN UPDATE SET v = s.v""")
    }
    assert(e1.getMessage.contains("multiple source rows"), e1.getMessage)
    // INSERT must assign every column
    val e2 = intercept[Exception] {
      spark.sql("""MERGE INTO graft.main.r t USING sqlcat_dup_src s
        ON t.id = s.id
        WHEN NOT MATCHED THEN INSERT (id) VALUES (s.id)""")
    }
    assert(e2.getMessage.contains("every column") ||
      e2.getMessage.toLowerCase.contains("insert"), e2.getMessage)
    // the refused statements committed NOTHING
    assert(Catalog.versions(root) === Seq(0))
  }

  test("UPDATE picks its lane by WHERE translatability: layer pair " +
      "(data-less delete + add-only with stats) for stats predicates, " +
      "copy-on-write otherwise; NULL predicates keep rows") {
    val root = freshCatalog()
    Catalog.commit(root, Map("u" ->
      ((spark.range(0, 10).select(col("id"),
        when(col("id") < 8, col("id") % 7).as("v")),
        Catalog.Overwrite))))
    // translatable WHERE -> ONE transaction, layer pair
    spark.sql("UPDATE graft.main.u SET v = v + 100 WHERE id <= 4")
    val m1 = Catalog.tableManifest(root, "u").get
    assert(Catalog.versions(root) === Seq(0, 1))
    assert(m1.layers.size === 2 && m1.layers.head.pred.nonEmpty &&
      m1.layers.head.files.isEmpty && m1.layers.last.key.isEmpty &&
      m1.layers.last.statsFile.nonEmpty, m1.layers.toString)
    val got1 = Catalog.readTable(spark, root, "u")
      .as[(Long, Option[Long])].collect().toSet
    val want1 = (0L to 9L).map(i =>
      (i, if (i >= 8) None else Some(i % 7 + (if (i <= 4) 100L else 0L))))
      .toSet
    assert(got1 === want1)
    // untranslatable WHERE (arithmetic wraps the column) -> CoW, flat
    // NULL v rows (id 8,9): v >= 100 is NULL there -> kept un-updated
    spark.sql("UPDATE graft.main.u SET v = 0 WHERE v >= 100 AND id % 2 = 1")
    val m2 = Catalog.tableManifest(root, "u").get
    assert(m2.layers.isEmpty, "CoW lane folds the table flat")
    val got2 = Catalog.readTable(spark, root, "u")
      .as[(Long, Option[Long])].collect().toSet
    val want2 = want1.map { case (i, v) =>
      (i, if (i % 2 == 1 && v.exists(_ >= 100)) Some(0L) else v) }
    assert(got2 === want2)
    // full-table UPDATE (no WHERE) rewrites every row
    spark.sql("UPDATE graft.main.u SET v = id")
    assert(Catalog.readTable(spark, root, "u")
      .as[(Long, Option[Long])].collect().toSet ===
      (0L to 9L).map(i => (i, Some(i))).toSet)
  }

  test("CALL graft.system.optimize / vacuum: the maintenance half of " +
      "the lifecycle from pure SQL — compaction folds layers and " +
      "keeps content, vacuum sweeps expired versions' files") {
    val root = freshCatalog()
    Catalog.commit(root, Map("opt" ->
      ((spark.range(0, 100).select(col("id"), (col("id") % 7).as("v"))
        .repartition(6), Catalog.Overwrite))))
    spark.sql("DELETE FROM graft.main.opt WHERE id >= 90") // layered
    spark.sql("INSERT INTO graft.main.opt SELECT id, id % 7 AS v " +
      "FROM range(200, 210)")
    assert(Catalog.tableManifest(root, "opt").get.layers.size === 2)
    val want = spark.sql("SELECT * FROM graft.main.opt")
      .as[(Long, Long)].collect().toSet
    // SQL OPTIMIZE: one file, layers folded, content identical
    val out = spark.sql(
      "CALL graft.system.optimize('opt', 1, NULL)").collect()
    assert(out.length === 1 && out(0).getInt(2) === 1, out.toSeq)
    val m = Catalog.tableManifest(root, "opt").get
    assert(m.layers.isEmpty && m.files.size === 1)
    assert(spark.sql("SELECT * FROM graft.main.opt")
      .as[(Long, Long)].collect().toSet === want)
    // z-ordered variant records the clustering spec's layout benefit:
    // a range probe after CALL optimize(...,4,'id') prunes
    spark.sql("CALL graft.system.optimize('opt', 4, 'id')")
    val (_, rep) = Catalog.readTableWhere(spark, root, "opt",
      SnapshotStore.StatsPred.Between("id", 0L, 20L))
    assert(rep.filesOpened < rep.filesListed, rep.toString)
    // SQL VACUUM: old catalog versions' unreachable files sweep
    val deleted = spark.sql(
      "CALL graft.system.vacuum(1, 0)").collect()(0).getInt(0)
    assert(deleted > 0, "pre-optimize files must sweep")
    assert(spark.sql("SELECT * FROM graft.main.opt")
      .as[(Long, Long)].collect().toSet === want)
    // unknown procedure refuses loudly
    val e = intercept[Exception] {
      spark.sql("CALL graft.system.nope(1)").collect()
    }
    assert(e.getMessage.contains("nope"), e.getMessage)
  }

  test("MERGE/UPDATE enforce NOT NULL at runtime and refuse pinned " +
      "targets at analysis") {
    val root = freshCatalog()
    Catalog.commit(root, Map("nn" ->
      ((spark.range(0, 3).toDF("id")
        .select(col("id"), (col("id") + 1).as("v")),
        Catalog.Overwrite))))
    // assigning NULL into the NOT NULL column v fails LOUDLY at write
    val e = intercept[Exception] {
      spark.sql("UPDATE graft.main.nn SET v = NULL WHERE id = 1")
    }
    assert((e.getMessage + " " + Option(e.getCause).map(_.getMessage)
      .getOrElse("")).toLowerCase.contains("null"), e.getMessage)
    // nothing committed
    assert(Catalog.versions(root) === Seq(0))
    assert(Catalog.readTable(spark, root, "nn").count() === 3)
  }

  test("CALL graft.system.restore: pure-metadata rollback as a NEW " +
      "commit — history preserved, interim versions travelable, " +
      "refusals loud") {
    val root = freshCatalog()
    Catalog.commit(root, Map("r" ->
      ((spark.range(0, 10).toDF("id"), Catalog.Overwrite))))     // v0
    spark.sql("INSERT INTO graft.main.r SELECT id + 100 FROM range(5)") // v1
    spark.sql("DELETE FROM graft.main.r WHERE id < 3")           // v2
    val dataFiles = java.nio.file.Files.walk(
      java.nio.file.Paths.get(root)).filter(
        _.toString.endsWith(".parquet")).count()
    val out = spark.sql("CALL graft.system.restore('r', 0)").collect()
    assert(out.head.getInt(0) === 3, out.toSeq.toString) // new commit v3
    // restore wrote NO data files (pure metadata)
    val dataFilesAfter = java.nio.file.Files.walk(
      java.nio.file.Paths.get(root)).filter(
        _.toString.endsWith(".parquet")).count()
    assert(dataFilesAfter === dataFiles)
    // head content == v0 content
    assert(spark.sql("SELECT * FROM graft.main.r").as[Long]
      .collect().toSet === (0L until 10L).toSet)
    // interim history is preserved and still travelable
    assert(spark.sql(
      "SELECT * FROM graft.main.r VERSION AS OF 2").as[Long]
      .collect().toSet === ((3L until 10L) ++ (100L until 105L)).toSet)
    // restoring to the current content is a no-op (no new version)
    val again = spark.sql("CALL graft.system.restore('r', 0)").collect()
    assert(again.head.getInt(0) === 3)
    assert(Catalog.versions(root) === (0 to 3))
    // the table can move on after a restore
    spark.sql("INSERT INTO graft.main.r SELECT id + 500 FROM range(2)") // v4
    assert(spark.sql("SELECT COUNT(*) FROM graft.main.r")
      .as[Long].head() === 12L)
    // refusals: unknown version, table absent at target
    intercept[Exception] {
      spark.sql("CALL graft.system.restore('r', 99)").collect()
    }
    Catalog.commit(root, Map("late" ->
      ((spark.range(2).toDF("id"), Catalog.Overwrite))))         // v5
    intercept[Exception] {
      spark.sql("CALL graft.system.restore('late', 0)").collect()
    }
  }
}
