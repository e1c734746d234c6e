package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multi-table atomic commits ([[Catalog]]): cross-table consistency at
  * every catalog version, append rebase across racing committers, the
  * overwrite/append modes, pinned reads, and stats-pruned reads off the
  * staged manifests.
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-catalog").toString

  test("one commit lands several tables atomically; pinned reads at an " +
      "old catalog version see the old pair after later commits") {
    val root = freshRoot()
    val v0 = Catalog.commit(root, Map(
      "t1" -> ((Seq((1L, "x")).toDF("id", "s"), Catalog.Overwrite)),
      "t2" -> ((Seq((10L, "y")).toDF("id", "s"), Catalog.Overwrite))))
    assert(v0 === 0)
    val v1 = Catalog.commit(root, Map(
      "t1" -> ((Seq((2L, "x2")).toDF("id", "s"), Catalog.Append)),
      "t2" -> ((Seq((20L, "y2")).toDF("id", "s"), Catalog.Overwrite))))
    assert(v1 === 1)
    // current: t1 appended, t2 overwritten
    assert(Catalog.readTable(spark, root, "t1").as[(Long, String)]
      .collect().toSet === Set((1L, "x"), (2L, "x2")))
    assert(Catalog.readTable(spark, root, "t2").as[(Long, String)]
      .collect().toSet === Set((20L, "y2")))
    // pinned at v0: the ORIGINAL pair, both tables
    assert(Catalog.readTable(spark, root, "t1", Some(0))
      .as[(Long, String)].collect().toSet === Set((1L, "x")))
    assert(Catalog.readTable(spark, root, "t2", Some(0))
      .as[(Long, String)].collect().toSet === Set((10L, "y")))
  }

  test("racing cross-table committers: every catalog version shows each " +
      "transaction's appends in BOTH tables or in NEITHER (no torn " +
      "multi-table reads), and the head shows all of them") {
    val root = freshRoot()
    Catalog.commit(root, Map(
      "a" -> ((spark.range(0).select(col("id"), lit("seed").as("tag")),
        Catalog.Overwrite)),
      "b" -> ((spark.range(0).select(col("id"), lit("seed").as("tag")),
        Catalog.Overwrite))))
    val writers = Seq("W1", "W2", "W3")
    val threads = writers.map { w =>
      new Thread(() => {
        (1 to 3).foreach { i =>
          val rows = spark.range(5)
            .select(col("id"), lit(s"$w:$i").as("tag"))
          Catalog.commit(root, Map(
            "a" -> ((rows, Catalog.Append)),
            "b" -> ((rows, Catalog.Append))))
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val vs = Catalog.versions(root)
    assert(vs.size === 10) // seed + 9 transactions, all landed
    vs.foreach { v =>
      val tagsA = Catalog.readTable(spark, root, "a", Some(v))
        .groupBy("tag").count().as[(String, Long)].collect().toMap
      val tagsB = Catalog.readTable(spark, root, "b", Some(v))
        .groupBy("tag").count().as[(String, Long)].collect().toMap
      assert(tagsA === tagsB,
        s"catalog v$v exposes a transaction in one table only")
    }
    // head: every writer's every batch present, in full, in both tables
    val head = Catalog.readTable(spark, root, "a")
      .groupBy("tag").count().as[(String, Long)].collect().toMap
    writers.foreach { w =>
      (1 to 3).foreach(i => assert(head.get(s"$w:$i").contains(5L)))
    }
  }

  test("append schema mismatch fails loudly; stats-pruned catalog read " +
      "equals the plain filtered read and skips disjoint files") {
    val root = freshRoot()
    Catalog.commit(root, Map(
      "t" -> ((spark.range(0, 100).toDF("id").coalesce(1),
        Catalog.Overwrite))))
    Catalog.commit(root, Map(
      "t" -> ((spark.range(100, 200).toDF("id").coalesce(1),
        Catalog.Append))))
    val e = intercept[IllegalArgumentException] {
      Catalog.commit(root, Map(
        "t" -> ((Seq(("x", 1)).toDF("a", "b"), Catalog.Append))))
    }
    assert(e.getMessage.contains("schema mismatch"))
    val p = SnapshotStore.StatsPred.Between("id", 120L, 150L)
    val (got, rep) = Catalog.readTableWhere(spark, root, "t", p)
    val want = Catalog.readTable(spark, root, "t")
      .filter(SnapshotStore.predColumn(p))
    assert(got.collect().toSet === want.collect().toSet)
    assert(rep.filesOpened < rep.filesListed, rep.toString)
  }

  test("table names are whitelisted: traversal and reserved names fail " +
      "before any write") {
    val root = freshRoot()
    val df = Seq((1L, "x")).toDF("id", "s")
    Seq("..", ".", "", "a/b", "a\\b", "_manifests", "_catalog",
        "x..y/../../z").foreach { bad =>
      val e = intercept[IllegalArgumentException] {
        Catalog.commit(root, Map(bad -> ((df, Catalog.Overwrite))))
      }
      assert(e.getMessage.contains("bad table name"), s"name '$bad'")
    }
    // nothing escaped the catalog root; a dotted-but-safe name works
    Catalog.commit(root, Map("tbl.v2" -> ((df, Catalog.Overwrite))))
    assert(Catalog.readTable(spark, root, "tbl.v2").count() === 1)
  }

  private def walk(dir: String, suffix: String): Seq[String] = {
    val base = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(base)) return Seq.empty
    val s = java.nio.file.Files.walk(base)
    try s.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      .asScala.map(_.toString).filter(_.endsWith(suffix)).toSeq
    finally s.close()
  }
  private implicit class IterOps[A](private val i: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext = i.hasNext; def next() = i.next()
    }
  }

  test("catalog vacuum: expired versions' data files, staged manifests " +
      "and catalog jsons go; retained pinned reads are untouched") {
    val root = freshRoot()
    // v0/v1/v2: t overwritten three times (each version strands the last)
    (0 to 2).foreach { i =>
      Catalog.commit(root, Map(
        "t" -> ((spark.range(i * 100, i * 100 + 100).toDF("id")
          .coalesce(2), Catalog.Overwrite))))
    }
    val beforeData = walk(s"$root/t/data", ".parquet").size
    val beforeStaged = walk(s"$root/t/_manifests", ".json")
      .count(_.contains("staged-"))
    assert(beforeData === 6 && beforeStaged === 3)
    val deleted = Catalog.vacuum(root, keepVersions = 2,
      stagedGraceMs = 0)
    assert(deleted === 2) // v0's two files
    assert(walk(s"$root/t/data", ".parquet").size === 4)
    assert(walk(s"$root/t/_manifests", ".json")
      .count(_.contains("staged-")) === 2)
    assert(Catalog.versions(root) === Seq(1, 2))
    // retained pinned read (v1) and head (v2) both intact
    assert(Catalog.readTable(spark, root, "t", Some(1))
      .agg(min(col("id")), max(col("id"))).as[(Long, Long)].head()
      === ((100L, 199L)))
    assert(Catalog.readTable(spark, root, "t")
      .agg(min(col("id")), max(col("id"))).as[(Long, Long)].head()
      === ((200L, 299L)))
    // stats-pruned reads still work off the retained staged manifests
    val (got, rep) = Catalog.readTableWhere(spark, root, "t",
      SnapshotStore.StatsPred.Ge("id", 250L))
    assert(got.count() === 50 && rep.filesListed === 2)
  }

  test("catalog vacuum keeps appended tables' shared base files live, " +
      "sweeps never-referenced orphan staged manifests, and refuses an " +
      "uncommitted root") {
    val root = freshRoot()
    Catalog.commit(root, Map(
      "t" -> ((spark.range(0, 100).toDF("id").coalesce(1),
        Catalog.Overwrite))))
    Catalog.commit(root, Map(
      "t" -> ((spark.range(100, 200).toDF("id").coalesce(1),
        Catalog.Append))))
    // fake a lost-race commit attempt: an orphan staged manifest naming
    // the SAME base files (the realistic shape — losing attempts reuse
    // their once-written data, which the winning rebase then also names)
    val mDir = java.nio.file.Paths.get(s"$root/t/_manifests")
    val aStaged = walk(mDir.toString, ".json").filter(_.contains("staged-"))
    val orphan = mDir.resolve("staged-00000000-dead-beef-0000-000000000000.json")
    java.nio.file.Files.copy(java.nio.file.Paths.get(aStaged.head), orphan)
    val deleted = Catalog.vacuum(root, keepVersions = 2,
      stagedGraceMs = 0)
    // both real versions retained -> no data deleted; orphan swept
    assert(deleted === 0)
    assert(!java.nio.file.Files.exists(orphan))
    assert(Catalog.readTable(spark, root, "t").count() === 200)
    assert(Catalog.readTable(spark, root, "t", Some(0)).count() === 100)
    // keepVersions=1 now strands v0's staged manifest but NOT its files
    // (the append composed them into v1's list)
    assert(Catalog.vacuum(root, keepVersions = 1, stagedGraceMs = 0) === 0)
    assert(Catalog.readTable(spark, root, "t").count() === 200)
    assert(walk(s"$root/t/_manifests", ".json")
      .count(_.contains("staged-")) === 1)
    // an empty root refuses loudly instead of sweeping everything
    val e = intercept[IllegalArgumentException] {
      Catalog.vacuum(freshRoot())
    }
    assert(e.getMessage.contains("no committed catalog versions"))
  }

  test("catalog vacuum leaves mixed-managed table-layer versions and a " +
      "foreign dir alone") {
    val root = freshRoot()
    Catalog.commit(root, Map(
      "t" -> ((spark.range(0, 10).toDF("id").coalesce(1),
        Catalog.Overwrite))))
    // a table-layer commit in the SAME dir (mixed management): catalog
    // vacuum must keep everything its v<N> chain reaches
    SnapshotStore.commitOverwrite(
      spark.range(50, 60).toDF("id").coalesce(1), s"$root/t2")
    // a foreign dir with no _manifests tier: not ours, untouched
    val foreign = java.nio.file.Paths.get(root, "scratch")
    java.nio.file.Files.createDirectories(foreign)
    java.nio.file.Files.write(foreign.resolve("keep.parquet"),
      Array[Byte](1, 2, 3))
    Catalog.commit(root, Map(
      "t" -> ((spark.range(10, 20).toDF("id").coalesce(1),
        Catalog.Overwrite))))
    assert(Catalog.vacuum(root, keepVersions = 1, stagedGraceMs = 0) === 1) // only t's v0 file
    assert(SnapshotStore.read(spark, s"$root/t2").count() === 10)
    assert(java.nio.file.Files.exists(foreign.resolve("keep.parquet")))
    assert(Catalog.readTable(spark, root, "t").count() === 10)
  }

  test("catalog vacuum grace window: a young unpublished staged " +
      "manifest (an in-flight commit's stage 1) and its data survive; " +
      "past the window it is a dead attempt and goes") {
    val root = freshRoot()
    Catalog.commit(root, Map(
      "t" -> ((spark.range(0, 10).toDF("id").coalesce(1),
        Catalog.Overwrite))))
    // simulate a concurrent commit between its stage 1 (staged manifest
    // + data written) and its publishCat: a staged manifest naming a
    // FRESH data file no catalog version references yet
    val tr = s"$root/t"
    val inflight = spark.range(100, 110).toDF("id").coalesce(1)
    val files = SnapshotStore.writeData(inflight, tr)
    val m = SnapshotStore.Manifest(1, 0, "id BIGINT NOT NULL", files)
    val rel = "_manifests/staged-11111111-1111-1111-1111-111111111111.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(tr, rel),
      SnapshotStore.render(m).getBytes("UTF-8"))
    val dataFile = java.nio.file.Paths.get(tr, files.head)
    // default grace: the young in-flight unit and its data are LIVE
    assert(Catalog.vacuum(root, keepVersions = 1) === 0)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(tr, rel)))
    assert(java.nio.file.Files.exists(dataFile))
    // the (now-publishable) catalog version referencing it still reads
    assert(Catalog.readTable(spark, root, "t").count() === 10)
    // zero grace (caller asserts no concurrent commits): swept as dead
    assert(Catalog.vacuum(root, keepVersions = 1, stagedGraceMs = 0) === 1)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(tr, rel)))
    assert(!java.nio.file.Files.exists(dataFile))
    assert(Catalog.readTable(spark, root, "t").count() === 10)
  }

  test("commitCreate: create-only transaction — one winner, the loser " +
      "refuses loudly and never overwrites") {
    val root = freshRoot()
    val v = Catalog.commitCreate(root, "t",
      spark.range(0, 10).toDF("id"))
    assert(v === 0)
    intercept[Catalog.TableExistsException] {
      Catalog.commitCreate(root, "t", spark.range(100, 200).toDF("id"))
    }
    // the winner's content is intact; the loser produced no version
    assert(Catalog.readTable(spark, root, "t").count() === 10)
    assert(Catalog.versions(root) === Seq(0))
    // a different name still creates
    assert(Catalog.commitCreate(root, "u",
      spark.range(0, 3).toDF("id")) === 1)
  }
}
