package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SQL change feed (`graft.main.t.changes`) — content vs hand-computed
  * per-version diffs, bag multiplicities, optimization-time branch
  * pruning under `_commit_version` predicates, pin/evolution/recreate
  * semantics, and the reserved-name refusal. */
class ChangesTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog(): String = {
    val root = Files.createTempDirectory("graftchg").toString
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", root)
    root
  }

  test("t.changes: creation + insert + delete produce the exact " +
      "tagged row set; untouched-version commits emit nothing") {
    val root = freshCatalog()
    Catalog.commit(root, Map("c" ->
      ((spark.range(0, 10).toDF("id"), Catalog.Overwrite))))     // v0
    // v1 touches another table only — must not appear in c's feed
    Catalog.commit(root, Map("other" ->
      ((spark.range(3).toDF("id"), Catalog.Overwrite))))         // v1
    spark.sql("INSERT INTO graft.main.c SELECT id + 10 FROM range(5)") // v2
    spark.sql("DELETE FROM graft.main.c WHERE id < 3")           // v3
    val got = spark.sql(
      """SELECT id, _change, _n_rows, _commit_version
         FROM graft.main.c.changes
         ORDER BY _commit_version, _change, id""")
      .as[(Long, String, Long, Int)].collect().toSeq
    val want =
      (0L to 9L).map(i => (i, "added", 1L, 0)) ++
      (10L to 14L).map(i => (i, "added", 1L, 2)) ++
      (0L to 2L).map(i => (i, "removed", 1L, 3))
    assert(got === want, got.toString)
  }

  test("bag semantics: multiplicity deltas surface as n_rows, " +
      "including on the creation branch") {
    val root = freshCatalog()
    Catalog.commit(root, Map("b" ->
      ((Seq(5L, 5L).toDF("id"), Catalog.Overwrite))))            // v0
    spark.sql("INSERT INTO graft.main.b VALUES (5)")             // v1
    val got = spark.sql(
      """SELECT id, _change, _n_rows, _commit_version
         FROM graft.main.b.changes ORDER BY _commit_version""")
      .as[(Long, String, Long, Int)].collect().toSeq
    assert(got === Seq((5L, "added", 2L, 0), (5L, "added", 1L, 1)),
      got.toString)
  }

  test("a _commit_version predicate prunes other branches' scans at " +
      "optimization time (constant fold -> empty-relation propagation)") {
    val root = freshCatalog()
    Catalog.commit(root, Map("p" ->
      ((spark.range(0, 100).toDF("id"), Catalog.Overwrite))))    // v0
    spark.sql("INSERT INTO graft.main.p SELECT id + 100 FROM range(50)") // v1
    spark.sql("DELETE FROM graft.main.p WHERE id < 10")          // v2
    def scans(sql: String): Int =
      spark.sql(sql).queryExecution.optimizedPlan.collect {
        case l: LogicalRelation => l
      }.size
    val full = scans("SELECT * FROM graft.main.p.changes")
    val one = scans(
      "SELECT * FROM graft.main.p.changes WHERE _commit_version = 0")
    val range = scans(
      "SELECT * FROM graft.main.p.changes WHERE _commit_version >= 2")
    // creation-only: exactly the creation state's scan survives
    assert(one === 1, s"creation-only kept $one scans")
    assert(range < full,
      s"range predicate kept $range of $full scans")
    // and the pruned plans still answer correctly
    val n0 = spark.sql(
      """SELECT COUNT(*) FROM graft.main.p.changes
         WHERE _commit_version = 0""").as[Long].head()
    assert(n0 === 100L)
  }

  test("VERSION AS OF pins the feed; a drop emits the dropped state " +
      "as removed, so the feed telescopes through drop + recreate") {
    val root = freshCatalog()
    Catalog.commit(root, Map("r" ->
      ((spark.range(0, 4).toDF("id"), Catalog.Overwrite))))      // v0
    spark.sql("INSERT INTO graft.main.r VALUES (100)")           // v1
    val pinned = spark.sql(
      """SELECT COUNT(*) FROM graft.main.r.changes VERSION AS OF 0""")
      .as[Long].head()
    assert(pinned === 4L, "pin must exclude the later insert")
    spark.sql("DROP TABLE graft.main.r")                         // v2
    Catalog.commit(root, Map("r" ->
      ((Seq(7L).toDF("id"), Catalog.Overwrite))))                // v3
    val got = spark.sql(
      """SELECT id, _change, _commit_version FROM graft.main.r.changes
         ORDER BY _commit_version, _change, id""")
      .as[(Long, String, Int)].collect().toSeq
    assert(got === (0L to 3L).map(i => (i, "added", 0)) ++
      Seq((100L, "added", 1)) ++
      ((0L to 3L).map(i => (i, "removed", 2)) :+ ((100L, "removed", 2))) ++
      Seq((7L, "added", 3)), got.toString)
    // net signed sum == the live table (the telescoping contract)
    val net = spark.sql(
      """SELECT id FROM (
           SELECT id, SUM(CASE WHEN _change = 'added' THEN _n_rows
                               ELSE -_n_rows END) AS n
           FROM graft.main.r.changes GROUP BY id) WHERE n > 0""")
      .as[Long].collect().toSeq
    assert(net === Seq(7L), net.toString)
  }

  test("schema evolution: the ALTER version emits nothing (common " +
      "columns cancel); older branches NULL-fill the new column") {
    val root = freshCatalog()
    Catalog.commit(root, Map("e" ->
      ((spark.range(0, 3).toDF("id"), Catalog.Overwrite))))      // v0
    spark.sql("ALTER TABLE graft.main.e ADD COLUMNS (tag STRING)") // v1
    spark.sql("INSERT INTO graft.main.e VALUES (9, 'x')")        // v2
    val got = spark.sql(
      """SELECT id, tag, _change, _commit_version
         FROM graft.main.e.changes ORDER BY _commit_version, id""")
      .as[(Long, Option[String], String, Int)].collect().toSeq
    assert(got === Seq(
      (0L, None, "added", 0), (1L, None, "added", 0),
      (2L, None, "added", 0), (9L, Some("x"), "added", 2)),
      got.toString)
  }

  test("a table whose schema defines a reserved feed column refuses " +
      "loudly at resolution") {
    val root = freshCatalog()
    Catalog.commit(root, Map("bad" ->
      ((Seq((1L, "a")).toDF("id", "_change"), Catalog.Overwrite))))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.main.bad.changes").collect()
    }
    assert(e.getMessage.contains("_change"), e.getMessage)
  }
}
