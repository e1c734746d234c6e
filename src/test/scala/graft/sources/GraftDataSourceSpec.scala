package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraftDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graftds").toString

  /** A 4-file table range-clustered on id: per-file id ranges are
    * disjoint, so stats pruning is decisive for range predicates. */
  private def clustered(root: String): Unit =
    (0 until 4).foreach { k =>
      SnapshotStore.commitAppend(
        spark.range(k * 100, (k + 1) * 100)
          .select(col("id"), (col("id") % 7).as("v"),
            concat(lit("s"), col("id") % 3).as("tag"))
          .coalesce(1), root)
    }

  test("format('graft') equals SnapshotStore.read; filters prune " +
      "through the planner and results equal read().filter exactly") {
    val root = freshRoot()
    clustered(root)
    val viaFormat = spark.read.format("graft").load(root)
    assert(viaFormat.as[(Long, Long, String)].collect().toSet ===
      SnapshotStore.read(spark, root).as[(Long, Long, String)]
        .collect().toSet)
    // a range filter the user writes as a plain Column — Spark pushes
    // it, listFiles translates it, the stats tier prunes to ONE file
    val got = viaFormat.filter(col("id").between(120, 180))
      .as[(Long, Long, String)].collect().toSet
    val want = SnapshotStore.read(spark, root)
      .filter(col("id").between(120, 180))
      .as[(Long, Long, String)].collect().toSet
    assert(got === want && got.size === 61)
    val rep = GraftFileIndex.lastReport(root).get
    assert(rep.filesListed === 4 && rep.filesOpened === 1, rep.toString)
    // parity with the Scala-API prune: same pred, same decision
    val (_, repRef) = SnapshotStore.readWhere(spark, root,
      SnapshotStore.StatsPred.Between("id", 120L, 180L))
    assert(rep.filesOpened === repRef.filesOpened)
    // the physical plan carries the pushed filters (parquet row-group
    // skipping layer sees them too)
    val plan = viaFormat.filter(col("id").between(120, 180))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(id,120)"), plan)
  }

  test("untranslatable filters prune nothing but stay correct; " +
      "translatable conjuncts still prune alongside them") {
    val root = freshRoot()
    clustered(root)
    val df = spark.read.format("graft").load(root)
    // endsWith does not translate -> full listing, correct rows
    val all = df.filter(col("tag").endsWith("1"))
      .as[(Long, Long, String)].collect().toSet
    assert(all === SnapshotStore.read(spark, root)
      .filter(col("tag").endsWith("1"))
      .as[(Long, Long, String)].collect().toSet)
    assert(GraftFileIndex.lastReport(root).get.filesOpened === 4)
    // mixed AND: the range conjunct prunes even though endsWith cannot
    val mixed = df.filter(col("tag").endsWith("1") && col("id") < 100)
      .as[(Long, Long, String)].collect().toSet
    assert(mixed === SnapshotStore.read(spark, root)
      .filter(col("tag").endsWith("1") && col("id") < 100)
      .as[(Long, Long, String)].collect().toSet)
    assert(GraftFileIndex.lastReport(root).get.filesOpened === 1)
    // IN over two files' keys opens exactly those two
    val inGot = df.filter(col("id").isin(5, 305))
      .as[(Long, Long, String)].collect().toSet
    assert(inGot.map(_._1) === Set(5L, 305L))
    assert(GraftFileIndex.lastReport(root).get.filesOpened === 2)
  }

  test("versionAsOf pins time travel; SQL 'USING graft' gets the same " +
      "pruned scan from pure SQL") {
    val root = freshRoot()
    clustered(root)
    // v0 had only the first 100 ids
    val v0 = spark.read.format("graft").option("versionAsOf", "0")
      .load(root)
    assert(v0.count() === 100)
    assert(v0.agg(max(col("id"))).head.getLong(0) === 99L)
    // pure SQL front door: temp view USING graft, WHERE drives pruning
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW graft_t
      USING graft OPTIONS (path '$root')""")
    val viaSql = spark.sql(
      "SELECT count(*) AS n, sum(v) AS sv FROM graft_t WHERE id >= 300")
      .as[(Long, Long)].head()
    val want = SnapshotStore.read(spark, root)
      .filter(col("id") >= 300)
      .agg(count(lit(1)), sum(col("v"))).as[(Long, Long)].head()
    assert(viaSql === want)
    assert(GraftFileIndex.lastReport(root).get.filesOpened === 1)
  }

  test("bloom tier fires through the planner on an equality the stats " +
      "tier cannot decide") {
    val root = freshRoot()
    // cluster on grp; id % 4 pattern spans every file's id range
    (0 until 4).foreach { g =>
      SnapshotStore.commitAppend(
        spark.range(0, 400).filter(col("id") % 4 === g)
          .select(col("id"), lit(g).as("grp")).coalesce(1), root)
    }
    SnapshotStore.indexBloom(spark, root, "id")
    val df = spark.read.format("graft").load(root)
    assert(df.filter(col("id") === 42).as[(Long, Int)].collect()
      .toSeq === Seq((42L, 2)))
    val rep = GraftFileIndex.lastReport(root).get
    assert(rep.filesOpened === 1 && rep.bloomSkipped === 3, rep.toString)
  }

  test("layered tables serve through the raw format via the injected " +
      "fold rule: format('graft') and SQL equal the layered read, the " +
      "base scan still prunes, GraftTable.table stays the rule-free " +
      "twin") {
    assert(GraftTable.sessionHasFoldRule(spark),
      "spec session must carry GraftSparkExtensions")
    val root = freshRoot()
    clustered(root)
    val changes = Seq(
      (150L, 1L, 1L, "upd", false), // update one row in file 2
      (151L, 9L, 1L, "del", true),  // delete one row in file 2
      (450L, 2L, 1L, "ins", false)  // insert a brand-new id
    ).toDF("id", "v", "ver", "tag", "del")
      .select(col("id"), col("v"), col("tag"), col("ver"), col("del"))
    SnapshotStore.mergeOnRead(spark, root, changes,
      key = "id", versionCol = "ver", deleteCol = "del")
    val want = SnapshotStore.read(spark, root)
      .as[(Long, Long, String)].collect().toSet
    // the raw format folds (analyzer rule) — full parity
    val viaFormat = spark.read.format("graft").load(root)
    assert(viaFormat.as[(Long, Long, String)].collect().toSet === want)
    // pure SQL over a temp view folds identically
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW layered_t USING " +
      s"graft OPTIONS (path '$root')")
    assert(spark.sql("SELECT id, v, tag FROM layered_t")
      .as[(Long, Long, String)].collect().toSet === want)
    // a filter above the fold prunes the BASE scan (files 0,1,3 skip);
    // the updated/deleted/inserted keys land correctly
    val got = viaFormat.filter(col("id").between(145, 155))
      .as[(Long, Long, String)].collect()
      .map { case (k, _, tag) => (k, tag) }.toMap
    assert(!got.contains(151L) && got(150L) === "upd")
    assert(GraftFileIndex.lastReport(root).get.filesOpened === 1)
    // the layer-resident insert is visible despite base pruning
    assert(viaFormat.filter(col("id") === 450L).count() === 1)
    // GraftTable.table (no extension needed) produces the same rows
    val t = GraftTable.table(spark, root)
    assert(t.as[(Long, Long, String)].collect().toSet === want)
    assert(t.filter(col("id") === 450L).count() === 1)
  }

  test("write half: SaveMode maps onto snapshot commits — append " +
      "accumulates versions with stats-pruned reads, overwrite " +
      "replaces, ErrorIfExists/Ignore respect existing tables") {
    val root = freshRoot()
    val mk = (lo: Long, hi: Long) => spark.range(lo, hi)
      .select(col("id"), (col("id") % 7).as("v")).coalesce(1)
    mk(0, 100).write.format("graft").mode("errorifexists").save(root)
    assert(SnapshotStore.versions(root) === Seq(0))
    val e = intercept[Exception] {
      mk(0, 10).write.format("graft").mode("errorifexists").save(root)
    }
    assert(e.getMessage.contains("already has committed versions"))
    mk(100, 200).write.format("graft").mode("append").save(root)
    mk(900, 910).write.format("graft").mode("ignore").save(root) // no-op
    assert(SnapshotStore.versions(root) === Seq(0, 1))
    // the written table reads back through the read half, pruned
    val got = spark.read.format("graft").load(root)
      .filter(col("id") >= 150).count()
    assert(got === 50)
    assert(GraftFileIndex.lastReport(root).get.filesOpened === 1)
    // overwrite replaces; time travel still reaches v1
    mk(500, 520).write.format("graft").mode("overwrite").save(root)
    assert(spark.read.format("graft").load(root).count() === 20)
    assert(spark.read.format("graft").option("versionAsOf", "1")
      .load(root).count() === 200)
    // append onto a LAYERED table lands as an add-only layer and the
    // write itself succeeds (the read half still routes via GraftTable)
    SnapshotStore.mergeOnRead(spark, root,
      Seq((505L, 1L, 1L, true)).toDF("id", "v", "ver", "del")
        .select(col("id"), col("v"), col("ver"), col("del")),
      key = "id", versionCol = "ver", deleteCol = "del")
    mk(1000, 1010).write.format("graft").mode("append").save(root)
    val t = GraftTable.table(spark, root)
    assert(t.count() === 20 - 1 + 10)
    assert(t.filter(col("id") === 505L).count() === 0)
  }

  test("manifest-carried file sizes: relation creation and scans make " +
      "zero per-file stat calls on freshly-committed tables, and the " +
      "recorded sizes are byte-exact") {
    val root = freshRoot()
    clustered(root)
    val m = SnapshotStore.snapshot(root).get
    val sizes = SnapshotStore.fileSizes(root, m)
    assert(sizes.keySet === m.files.toSet)
    sizes.foreach { case (f, s) =>
      assert(s === Files.size(java.nio.file.Paths.get(root, f)),
        s"recorded size of $f must be byte-exact") }
    val before = GraftFileIndex.statFallbacksCount
    val df = spark.read.format("graft").load(root)
    assert(df.filter(col("id") < 150).count() === 150)
    // join-size estimation consults sizeInBytes — still no stat walk
    val idx = new GraftFileIndex(spark, root, m)
    assert(idx.sizeInBytes === sizes.values.sum)
    assert(GraftFileIndex.statFallbacksCount === before,
      "a sized manifest must serve the scan without stat() fallbacks")
  }

  test("translate: OR needs both arms, EqualNullSafe null maps to " +
      "IsNull, and a lone untranslatable filter yields no pred") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.LongType
    val a = AttributeReference("x", LongType)()
    val lit5 = Literal(5L)
    assert(GraftFileIndex.translate(Seq(EqualTo(a, lit5))) ===
      Some(SnapshotStore.StatsPred.Eq("x", 5L)))
    assert(GraftFileIndex.translate(Seq(
      Or(EqualTo(a, lit5), Like(a, Literal("x%"), '\\')))).isEmpty)
    assert(GraftFileIndex.translate(Seq(
      EqualNullSafe(a, Literal(null, LongType)))) ===
      Some(SnapshotStore.StatsPred.IsNull("x")))
    assert(GraftFileIndex.translate(Seq(
      Like(a, Literal("x%"), '\\'))).isEmpty)
    // AND keeps the translatable side
    assert(GraftFileIndex.translate(Seq(
      And(GreaterThan(a, lit5), Like(a, Literal("x%"), '\\')))) ===
      Some(SnapshotStore.StatsPred.Gt("x", 5L)))
  }

  test("tagged scan reports: two concurrent queries over ONE root each " +
      "observe their own prune decision (no last-writer clobber)") {
    val root = java.nio.file.Files
      .createTempDirectory("graftds-tagged").toString
    SnapshotStore.commitOverwrite(
      spark.range(0, 1000)
        .select(col("id"), (col("id") % 7).as("v"))
        .repartitionByRange(8, col("id")), root)
    def drive(lo: Long, hi: Long) =
      GraftFileIndex.tagged(spark, root) {
        spark.read.format("graft").load(root)
          .filter(col("id").between(lo, hi)).count()
      }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    // interleave several rounds so the two drives genuinely overlap
    val narrow = Future((1 to 5).map(_ => drive(0, 60)).last)
    val wide = Future((1 to 5).map(_ => drive(0, 999)).last)
    val (nCount, nRep) = Await.result(narrow, Duration.Inf)
    val (wCount, wRep) = Await.result(wide, Duration.Inf)
    pool.shutdown()
    assert(nCount === 61 && wCount === 1000)
    val (nr, wr) = (nRep.get, wRep.get)
    assert(nr.filesOpened < wr.filesOpened,
      s"each drive must see ITS OWN decision: narrow=$nr wide=$wr")
    assert(wr.filesOpened === 8 && nr.filesOpened <= 2,
      s"narrow=$nr wide=$wr")
  }
}
