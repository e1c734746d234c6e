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
}
