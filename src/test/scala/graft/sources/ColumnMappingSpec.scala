package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkSpec

/** Column mapping (RENAME COLUMN / DROP COLUMN as pure metadata over
  * frozen physical file names): metadata-only commits, logical
  * presentation on every front door, physical translation on every
  * write path, pruning through the mapping, materialization on
  * rewrite, and the reservation rules. */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog(): String = {
    val root = Files.createTempDirectory("graftcmap").toString
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", root)
    root
  }

  test("RENAME COLUMN is metadata-only: same files, physical schema " +
      "unchanged, logical view renamed, time travel keeps old names") {
    val root = freshCatalog()
    val t = spark.range(0, 100)
      .select(col("id"), (col("id") % 5).as("v"))
    Catalog.commit(root, Map("r" -> ((t, Catalog.Overwrite))))   // v0
    val m0 = Catalog.tableManifest(root, "r").get
    spark.sql("ALTER TABLE graft.main.r RENAME COLUMN v TO score") // v1
    val m1 = Catalog.tableManifest(root, "r").get
    assert(m1.files === m0.files, "rename must not touch data files")
    assert(m1.schemaDdl === m0.schemaDdl,
      "physical schema is frozen at creation")
    assert(m1.logical === Seq("v" -> "score"))
    val got = spark.sql(
      "SELECT id, score FROM graft.main.r WHERE score = 3 ORDER BY id")
      .as[(Long, Long)].collect().toSeq
    assert(got === (0L until 100L).filter(_ % 5 == 3).map(i => (i, 3L)))
    // pinned readers keep the OLD name
    val old = spark.sql(
      "SELECT v FROM graft.main.r VERSION AS OF 0 LIMIT 1")
    assert(old.columns.toSeq === Seq("v"))
    // t.detail shows the logical DDL; t.history classifies the rename
    val ddl = spark.sql(
      "SELECT schema_ddl FROM graft.main.r.detail")
      .as[String].head()
    assert(ddl.contains("score") && !ddl.contains("`v`"), ddl)
    val ops = spark.sql(
      """SELECT operation FROM graft.main.r.history
         ORDER BY catalog_version""").as[String].collect().toSeq
    assert(ops === Seq("CREATE", "RENAME COLUMN"), ops.toString)
  }

  test("append after rename writes PHYSICAL names; pruning flows " +
      "through the mapping on logical predicates") {
    val root = freshCatalog()
    val t = spark.range(0, 400)
      .select(col("id"), (col("id") * 2).as("v"))
      .repartitionByRange(4, col("id"))
    Catalog.commit(root, Map("a" -> ((t, Catalog.Overwrite))))
    spark.sql("ALTER TABLE graft.main.a RENAME COLUMN id TO key")
    spark.sql("INSERT INTO graft.main.a SELECT id + 400, id * 2 " +
      "FROM range(100)")
    val m = Catalog.tableManifest(root, "a").get
    assert(m.schemaDdl === StructType(t.schema.fields).toDDL,
      "appended files must land under the frozen physical schema")
    assert(m.logical === Seq("id" -> "key"))
    val n = spark.sql("SELECT COUNT(*) FROM graft.main.a")
      .as[Long].head()
    assert(n === 500L)
    // logical predicate on the RENAMED column prunes physically: a
    // range probe outside 3 of the 4 base files must skip them
    val (df, report) = Catalog.readTableWhere(spark, root, "a",
      SnapshotStore.StatsPred.Between("key", 0L, 50L))
    assert(df.columns.toSeq === Seq("key", "v"))
    assert(df.count() === 51L)
    assert(report.filesOpened < report.filesListed,
      s"stats pruning must survive the rename: $report")
  }

  test("DROP COLUMN hides the column, reserves the name until a " +
      "rewrite materializes the mapping") {
    val root = freshCatalog()
    val t = spark.range(0, 50).select(col("id"),
      (col("id") % 3).as("v"), lit("x").as("tag"))
    Catalog.commit(root, Map("d" -> ((t, Catalog.Overwrite))))
    spark.sql("ALTER TABLE graft.main.d DROP COLUMN tag")
    val m = Catalog.tableManifest(root, "d").get
    assert(m.dropped === Seq("tag") && m.files.nonEmpty)
    assert(spark.sql("SELECT * FROM graft.main.d").columns.toSeq ===
      Seq("id", "v"))
    // re-adding the dropped name refuses (old bytes would resurrect)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft.main.d ADD COLUMNS (tag STRING)")
    }
    assert(e.getMessage.contains("OPTIMIZE"), e.getMessage)
    // a rewrite MATERIALIZES the mapping and frees the name
    spark.sql("CALL graft.system.optimize('d', 1, NULL)")
    val m2 = Catalog.tableManifest(root, "d").get
    assert(m2.logical.isEmpty && m2.dropped.isEmpty)
    assert(StructType.fromDDL(m2.schemaDdl).fieldNames.toSeq ===
      Seq("id", "v"))
    spark.sql("ALTER TABLE graft.main.d ADD COLUMNS (tag STRING)")
    val rows = spark.sql(
      "SELECT COUNT(*) FROM graft.main.d WHERE tag IS NULL")
      .as[Long].head()
    assert(rows === 50L, "freed name starts NULL, not old bytes")
  }

  test("DML on a mapped table: UPDATE takes the layer lane with a " +
      "translated predicate; DELETE translates; MERGE resets") {
    val root = freshCatalog()
    val t = spark.range(0, 200)
      .select(col("id"), (col("id") % 7).as("v"))
      .repartitionByRange(4, col("id"))
    Catalog.commit(root, Map("u" -> ((t, Catalog.Overwrite))))
    spark.sql("ALTER TABLE graft.main.u RENAME COLUMN v TO amount")
    spark.sql("UPDATE graft.main.u SET amount = amount + 100 " +
      "WHERE id BETWEEN 10 AND 19")
    val m = Catalog.tableManifest(root, "u").get
    assert(m.layers.size === 2 && m.layers.head.pred.nonEmpty,
      s"translatable UPDATE must take the layer pair: ${m.layers}")
    assert(m.logical === Seq("v" -> "amount"), "mapping carried")
    val upd = spark.sql(
      "SELECT SUM(amount) FROM graft.main.u WHERE id BETWEEN 10 AND 19")
      .as[Long].head()
    assert(upd === (10L until 20L).map(i => i % 7 + 100).sum)
    spark.sql("DELETE FROM graft.main.u WHERE id >= 100")
    assert(spark.sql("SELECT COUNT(*) FROM graft.main.u")
      .as[Long].head() === 100L)
    // a MERGE rewrite materializes (CoW writes logical names)
    spark.range(0, 5).select(col("id"), lit(999L).as("amount"))
      .createOrReplaceTempView("cmap_src")
    spark.sql(
      """MERGE INTO graft.main.u t USING cmap_src s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET amount = s.amount""")
    val m2 = Catalog.tableManifest(root, "u").get
    assert(m2.logical.isEmpty && m2.dropped.isEmpty,
      "copy-on-write MERGE must materialize the mapping")
    assert(spark.sql(
      "SELECT SUM(amount) FROM graft.main.u WHERE id < 5")
      .as[Long].head() === 5L * 999L)
  }

  test("reservation rules: rename collisions refuse, rename back to " +
      "the physical name erases the pair, last column cannot drop") {
    val root = freshCatalog()
    Catalog.commit(root, Map("g" ->
      ((spark.range(3).select(col("id"), (col("id")).as("v")),
        Catalog.Overwrite))))
    spark.sql("ALTER TABLE graft.main.g RENAME COLUMN v TO w")
    val e1 = intercept[Exception] {
      Catalog.renameColumn(root, "g", "w", "id")
    }
    assert(e1.getMessage.contains("already in use"), e1.getMessage)
    // a FRESH logical name may not shadow the dropped/physical space
    val e2 = intercept[Exception] {
      Catalog.renameColumn(root, "g", "id", "v")
    }
    assert(e2.getMessage.contains("already in use"), e2.getMessage)
    // renaming back to the own frozen physical name erases the pair
    Catalog.renameColumn(root, "g", "w", "v")
    assert(Catalog.tableManifest(root, "g").get.logical.isEmpty)
    spark.sql("ALTER TABLE graft.main.g DROP COLUMN v")
    val e3 = intercept[Exception] {
      Catalog.dropColumn(root, "g", "id")
    }
    assert(e3.getMessage.contains("last column"), e3.getMessage)
  }

  test("the change feed emits nothing for a rename version; streaming " +
      "append into a mapped table refuses") {
    val root = freshCatalog()
    Catalog.commit(root, Map("f" ->
      ((spark.range(0, 6).toDF("id"), Catalog.Overwrite))))       // v0
    spark.sql("ALTER TABLE graft.main.f RENAME COLUMN id TO k")   // v1
    spark.sql("INSERT INTO graft.main.f VALUES (100)")            // v2
    val got = spark.sql(
      """SELECT k, _change, _commit_version FROM graft.main.f.changes
         ORDER BY _commit_version, k""")
      .as[(Long, String, Int)].collect().toSeq
    assert(got === (0L to 5L).map(i => (i, "added", 0)) :+
      ((100L, "added", 2)), got.toString)
    val sink = Files.createTempDirectory("cmapsink").toString
    val e = intercept[Exception] {
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Long](spark)(
          org.apache.spark.sql.Encoders.scalaLong)
      src.addData(1L)
      val q = src.toDF().toDF("k")
        .writeStream.format("graft")
        .option("checkpointLocation", s"$sink/cp")
        .toTable("graft.main.f")
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage.contains("materialize the mapping") ||
      Option(e.getCause).exists(
        _.getMessage.contains("materialize the mapping")),
      s"${e.getMessage} / ${Option(e.getCause).map(_.getMessage)}")
  }
}
