package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MetaTablesSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog(): String = {
    val root = Files.createTempDirectory("graftmeta").toString
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", root)
    root
  }

  test("t.history: one row per commit that changed the table, " +
      "operations classified from manifest algebra, untouched-version " +
      "commits invisible") {
    val root = freshCatalog()
    val t = spark.range(0, 100).select(col("id"), (col("id") % 5).as("v"))
    Catalog.commit(root, Map("h" -> ((t, Catalog.Overwrite))))   // cat v0
    // v1 touches ANOTHER table — h's history must not list it
    Catalog.commit(root, Map("other" ->
      ((spark.range(3).toDF("id"), Catalog.Overwrite))))         // cat v1
    spark.sql("INSERT INTO graft.main.h " +
      "SELECT id + 100, CAST(id % 5 AS BIGINT) FROM range(50)")  // cat v2
    spark.sql("DELETE FROM graft.main.h WHERE id < 10")          // cat v3
    spark.sql("ALTER TABLE graft.main.h ADD COLUMNS (tag STRING)") // v4
    val hist = spark.sql(
      """SELECT catalog_version, table_version, operation, n_layers
         FROM graft.main.h.history ORDER BY catalog_version""")
      .as[(Int, Int, String, Int)].collect().toSeq
    assert(hist === Seq(
      (0, 0, "CREATE", 0),
      (2, 1, "APPEND", 0),
      (3, 2, "DELETE", 1),
      (4, 3, "ADD COLUMNS", 1)), hist.toString)
    // ts is stamped on every version committed by this build
    val tsNulls = spark.sql(
      "SELECT count(*) FROM graft.main.h.history WHERE ts IS NULL")
      .as[Long].head()
    assert(tsNulls === 0L)
    // VERSION AS OF pins the history walk too
    val pinned = spark.sql(
      "SELECT count(*) FROM graft.main.h.history VERSION AS OF 2")
      .as[Long].head()
    assert(pinned === 2L)
  }

  test("t.files: base/layer attribution with sidecar-carried rows and " +
      "sizes — no filesystem stat calls; t.detail summarizes one row") {
    val root = freshCatalog()
    val t = spark.range(0, 200).repartitionByRange(4, col("id"))
      .select(col("id"), (col("id") % 3).as("v"))
    Catalog.commit(root, Map("f" -> ((t, Catalog.Overwrite))))   // v0
    spark.sql("DELETE FROM graft.main.f WHERE id >= 150")        // v1
    spark.sql("INSERT INTO graft.main.f " +
      "SELECT id + 200, CAST(id % 3 AS BIGINT) FROM range(30)")  // v2
    val files = spark.sql(
      """SELECT coalesce(layer, -1) AS lyr, CAST(SUM(rows) AS BIGINT),
           COUNT(*) AS n, MIN(size_bytes) > 0
         FROM graft.main.f.files GROUP BY 1 ORDER BY 1""")
      .as[(Int, Long, Long, Boolean)].collect().toSeq
    // base: 4 range files of 50 rows MINUS the one the delete's stats
    // proved all-matching (deleteTransform drops it from the manifest);
    // layer 1 = predicate delete (no files, absent); layer 2 = add-only
    // append, 30 rows
    assert(files.map(_._1) === Seq(-1, 2), files.toString)
    assert(files(0)._2 === 150L && files(0)._3 === 3L && files(0)._4)
    assert(files(1)._2 === 30L && files(1)._4)
    val detail = spark.sql(
      """SELECT name, table_version, n_files, n_layers, n_blooms,
           total_bytes > 0, schema_ddl
         FROM graft.main.f.detail""").collect().head
    assert(detail.getString(0) === "graft.main.f")
    assert(detail.getInt(1) === 2 && detail.getInt(2) === 3 &&
      detail.getInt(3) === 2 && detail.getInt(4) === 0)
    assert(detail.getBoolean(5))
    assert(detail.getString(6).toLowerCase.contains("id"))
    // a delete that also DROPPED a fully-matching file still
    // classifies as DELETE in history (files may shrink, never grow)
    val ops = spark.sql(
      """SELECT operation FROM graft.main.f.history
         ORDER BY catalog_version""").as[String].collect().toSeq
    assert(ops === Seq("CREATE", "DELETE", "APPEND"), ops.toString)
    // files travel: before the DML the table had no layers
    val filesV0 = spark.sql(
      """SELECT COUNT(*), CAST(SUM(rows) AS BIGINT)
         FROM graft.main.f.files VERSION AS OF 0
         WHERE layer IS NULL""").as[(Long, Long)].head()
    assert(filesV0 === ((4L, 200L)))
  }

  test("metadata table of a missing table refuses; unknown suffix is " +
      "not a metadata table") {
    val root = freshCatalog()
    Catalog.commit(root, Map("x" ->
      ((spark.range(3).toDF("id"), Catalog.Overwrite))))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graft.main.nope.history").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graft.main.x.bogus").collect()
    }
  }
}
