package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The adjacent-version incremental diff (r19 optimization:
  * [[SnapshotStore.incrementalDiffFrames]], the O(changes) fast path of
  * [[SnapshotStore.diff]] and the SQL `t.changes` feed) — every
  * recognized manifest-delta shape must produce EXACTLY the generic
  * two-sided [[SnapshotStore.diffFrames]] result (rows, multiplicities,
  * tags), and the recognizer must classify the shapes it was designed
  * for (so a regression cannot silently fall back to the O(table) path
  * — or worse, misclassify). */
class IncrementalDiffSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** generic two-sided diff of two pinned versions — the oracle the
    * fast path must equal */
  private def genericDiff(root: String, from: Int, to: Int): DataFrame =
    SnapshotStore.diffFrames(
      SnapshotStore.read(spark, root, Some(from)),
      SnapshotStore.read(spark, root, Some(to)),
      SnapshotStore.SchemaChange.Common, s"spec v$from..v$to")

  private def classify(root: String, v: Int): SnapshotStore.IncDiff = {
    val pm = SnapshotStore.snapshot(root, Some(v)).get
    val cm = SnapshotStore.snapshot(root, Some(v + 1)).get
    SnapshotStore.incrementalDiffFrames(spark, root, pm, cm,
      SnapshotStore.read(spark, root, Some(v)))
  }

  private def assertPairEqual(root: String, v: Int): Unit = {
    val inc = SnapshotStore.diff(spark, root, v, v + 1,
      SnapshotStore.SchemaChange.Common)
    val gen = genericDiff(root, v, v + 1)
    assert(rows(inc) === rows(gen), s"adjacent diff v$v..v${v + 1}")
  }

  test("every lifecycle commit shape diffs identically to the generic " +
      "two-sided aggregate, and the recognizer classifies as designed") {
    val root = Files.createTempDirectory("graftincdiff").toString
    val base = spark.range(0, 300).toDF("id")
      .withColumn("grp", (col("id") % 3).cast("string"))
      .withColumn("v", col("id") * 2)
      .repartitionByRange(3, col("id"))
    SnapshotStore.commitOverwrite(base, root)                     // v0
    // unlayered file append -> file-set diff (added files only)
    SnapshotStore.commitAppend(
      spark.range(300, 340).toDF("id")
        .withColumn("grp", lit("9")).withColumn("v", col("id") * 2),
      root)                                                       // v1
    // predicate delete: pred layer, stats-proven files may drop
    SnapshotStore.deleteWhere(spark, root,
      SnapshotStore.StatsPred.Lt("id", 120L))                     // v2
    // keyed merge-on-read: an untouched-payload upsert (must cancel),
    // a real update, a tombstone, and a fresh insert
    SnapshotStore.mergeOnRead(spark, root,
      Seq(
        (150L, "0", 300L, 1L, false),  // identical payload: cancels
        (151L, "x", 999L, 1L, false),  // real update
        (152L, "0", 304L, 1L, true),   // tombstone
        (400L, "n", 800L, 1L, false)   // insert
      ).toDF("id", "grp", "v", "ver", "del"),
      key = "id", versionCol = "ver", deleteCol = "del")          // v3
    // append onto the layered table -> add-only layer
    SnapshotStore.commitAppend(
      Seq((500L, "a", 1000L)).toDF("id", "grp", "v"), root)      // v4
    // metadata-only commit (bloom index) -> provably EMPTY branch
    SnapshotStore.indexBloom(spark, root, "id")                   // v5
    // OPTIMIZE folds the layer chain away -> layers not a prefix,
    // generic fallback (recognizer must DECLINE, not misclassify)
    SnapshotStore.optimize(spark, root, targetFiles = 2)          // v6
    // post-fold append on the now-unlayered table -> file-set diff
    SnapshotStore.commitAppend(
      Seq((600L, "b", 1200L)).toDF("id", "grp", "v"), root)      // v7
    // full overwrite, empty chains both sides -> file-set diff where
    // every old file is prev-only and every new file is cur-only
    SnapshotStore.commitOverwrite(
      spark.range(0, 50).toDF("id")
        .withColumn("grp", lit("z")).withColumn("v", col("id")), root) // v8

    (0 until 8).foreach(v => assertPairEqual(root, v))

    import SnapshotStore.IncDiff
    def kind(v: Int): String = classify(root, v) match {
      case IncDiff.Empty        => "empty"
      case IncDiff.Frame(_)     => "frame"
      case IncDiff.Unrecognized => "unrecognized"
    }
    assert(kind(0) === "frame", "v0..v1 file append")
    assert(kind(1) === "frame", "v1..v2 predicate delete")
    assert(kind(2) === "frame", "v2..v3 keyed upsert")
    assert(kind(3) === "frame", "v3..v4 add-only layer")
    assert(kind(4) === "empty", "v4..v5 bloom = metadata only")
    assert(kind(5) === "unrecognized", "v5..v6 fold must fall back")
    assert(kind(6) === "frame", "v6..v7 post-fold append")
    assert(kind(7) === "frame", "v7..v8 overwrite via file sets")

    // the keyed-upsert pair must CANCEL the identical-payload upsert:
    // id=150 re-upserted unchanged may not surface in the diff
    val v23 = SnapshotStore.diff(spark, root, 2, 3).collect()
    assert(!v23.exists(_.getLong(0) == 150L),
      s"identity upsert must cancel: ${v23.mkString(";")}")
    assert(v23.exists(r => r.getLong(0) == 151L &&
      r.getString(3) == "added"), "update adds the new row")
    assert(v23.exists(r => r.getLong(0) == 151L &&
      r.getString(3) == "removed"), "update removes the old row")
    assert(v23.exists(r => r.getLong(0) == 152L &&
      r.getString(3) == "removed"), "tombstone removes")
    assert(v23.exists(r => r.getLong(0) == 400L &&
      r.getString(3) == "added"), "insert adds")
  }

  test("the catalog UPDATE layer-pair commit (pred + add-only in ONE " +
      "version) takes the fast path and equals the generic diff") {
    val root = Files.createTempDirectory("graftincupd").toString
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", root)
    Catalog.commit(root, Map("u" ->
      ((spark.range(0, 100).toDF("id")
        .withColumn("pr", col("id") * 10), Catalog.Overwrite))))  // v0
    // translatable WHERE -> the layer-pair lane (a non-translatable
    // predicate would take the CoW lane and the file-set fast path)
    spark.sql("UPDATE graft.main.u SET pr = pr + 1 WHERE id < 25")  // v1
    val pm = Catalog.tableManifest(root, "u", Some(0)).get
    val cm = Catalog.tableManifest(root, "u", Some(1)).get
    assert(cm.layers.size === pm.layers.size + 2 &&
      cm.layers(pm.layers.size).pred.nonEmpty,
      s"expected the UPDATE layer pair, got ${cm.layers}")
    val tr = Catalog.tableRoot(root, "u")
    val prev = Catalog.readTable(spark, root, "u", Some(0))
    val inc = SnapshotStore.incrementalDiffFrames(spark, tr, pm, cm, prev)
    val df = inc match {
      case SnapshotStore.IncDiff.Frame(d) => d
      case other => fail(s"UPDATE pair must be recognized, got $other")
    }
    val gen = SnapshotStore.diffFrames(prev,
      Catalog.readTable(spark, root, "u", Some(1)),
      SnapshotStore.SchemaChange.Common, "spec upd")
    assert(rows(df) === rows(gen))
    // 25 removed + 25 added, nothing cancels (pr strictly changes)
    assert(df.count() === 50L)
    // and the whole SQL feed (which routes through the same fast path)
    // agrees with a creation branch + the pair
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft.main.u.changes").as[Long].head()
      === 150L)
  }

  test("a mapped table (RENAME COLUMN) declines the name-referencing " +
      "fast paths and the feed still serves correct rows") {
    val root = Files.createTempDirectory("graftincmap").toString
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", root)
    Catalog.commit(root, Map("m" ->
      ((spark.range(0, 20).toDF("id")
        .withColumn("pr", col("id")), Catalog.Overwrite))))       // v0
    spark.sql("ALTER TABLE graft.main.m RENAME COLUMN pr TO price") // v1
    spark.sql("DELETE FROM graft.main.m WHERE id < 5")            // v2
    val got = spark.sql(
      """SELECT id, _change, _commit_version FROM graft.main.m.changes
         ORDER BY _commit_version, _change, id""")
      .as[(Long, String, Int)].collect().toSeq
    assert(got === (0L to 19L).map(i => (i, "added", 0)) ++
      (0L to 4L).map(i => (i, "removed", 2)), got.toString)
  }
}
