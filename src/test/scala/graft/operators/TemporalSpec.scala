package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SCD2 epochs + temporal lookup ([[Temporal]]). */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("epochs: half-open intervals in change order, open-ended tail, " +
      "1-based ids per key") {
    val changes = Seq((1L, ts(10)), (1L, ts(20)), (1L, ts(30)), (2L, ts(5)))
      .toDF("k", "at")
    val got = Temporal.epochs(changes, "k", "at")
      .select($"k", $"valid_from", $"valid_to", $"epoch_id")
      .as[(Long, Timestamp, Option[Timestamp], Int)]
      .collect().sortBy(r => (r._1, r._4))
    assert(got.toSeq === Seq(
      (1L, ts(10), Some(ts(20)), 1),
      (1L, ts(20), Some(ts(30)), 2),
      (1L, ts(30), None, 3),
      (2L, ts(5), None, 1)))
  }

  test("joinInEpoch: inclusive start, exclusive end, open tail, facts " +
      "before the first epoch drop") {
    val dim = Temporal.epochs(
      Seq((1L, ts(10)), (1L, ts(20))).toDF("k", "at"), "k", "at")
      .drop("at")
    val facts = Seq(
      (1L, ts(5), "before"),   // precedes epoch 1 → dropped
      (1L, ts(10), "at_start"),// == valid_from → epoch 1
      (1L, ts(20), "at_cut"),  // == epoch 1's valid_to → epoch 2
      (1L, ts(99), "late"))    // open tail → epoch 2
      .toDF("k", "at", "tag")
    val got = Temporal.joinInEpoch(facts, dim, "k", "at")
      .select($"tag", $"epoch_id").as[(String, Int)].collect().toMap
    assert(got === Map("at_start" -> 1, "at_cut" -> 2, "late" -> 2))
  }

  test("plan: hash join keyed on the dimension key with the range as " +
      "residual — never a nested loop over the facts") {
    val dim = Temporal.epochs(
      (1L to 20L).map(i => (i % 5, ts(i * 10))).toDF("k", "at"), "k", "at")
      .drop("at")
    val facts = (1L to 100L).map(i => (i % 5, ts(i * 3), i * 1.0))
      .toDF("k", "at", "v")
    val aqeKey = "spark.sql.adaptive.enabled"
    val prior = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false") // deterministic physical plan to assert
    val plan =
      try Temporal.joinInEpoch(facts, dim, "k", "at")
        .queryExecution.executedPlan
      finally spark.conf.set(aqeKey, prior)
    assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      plan.toString)
    val bhj = plan.collect { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, plan.toString)
    assert(bhj.head.condition.isDefined,
      "range bounds must ride as the residual condition")
  }

  test("applyChangelog: highest version wins, tombstone deletes, " +
      "unmatched base passes through, new key inserts, null tombstone " +
      "flag is NOT a delete") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "amt")
    val changes = Seq(
      // key 1: v2 upsert beats v1 delete (latest wins outright)
      (1L, 1, Some(true), "x", 0.0),
      (1L, 2, Some(false), "a2", 11.0),
      // key 2: v3 delete beats v1/v2 upserts
      (2L, 1, Some(false), "b2", 21.0),
      (2L, 3, Some(true), "gone", 0.0),
      (2L, 2, Some(false), "b3", 22.0),
      // key 5: pure insert (not in base)
      (5L, 1, Some(false), "e", 50.0),
      // key 4: null tombstone flag -> treated as upsert, not delete
      (4L, 1, None, "d2", 41.0))
      .toDF("k", "v", "del", "name", "amt")
    val got = Temporal.applyChangelog(base, changes,
        key = "k", versionCol = "v", deleteCol = "del")
      .as[(Long, String, Double)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      (1L, "a2", 11.0),  // upsert replaced base
      (3L, "c", 30.0),   // untouched pass-through
      (4L, "d2", 41.0),  // null flag upsert
      (5L, "e", 50.0)))  // insert; key 2 deleted
  }

  test("applyChangelog property: random changelogs with unique versions " +
      "match a brute-force latest-wins reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val base = (0 until 30).filter(_ => rnd.nextBoolean())
        .map(k => (k.toLong, s"base$k", rnd.nextInt(100).toDouble))
      val changes = (0 until 40).flatMap { k =>
        (1 to rnd.nextInt(4)).map(v =>
          (k.toLong, v, rnd.nextBoolean(), s"c$k-$v",
            rnd.nextInt(100).toDouble))
      }
      val ref = {
        val winners = changes.groupBy(_._1).view.mapValues(_.maxBy(_._2))
        val touched = winners.collect {
          case (k, (_, _, del, nm, amt)) if !del => (k, nm, amt)
        }.toSeq
        val untouched = base.filterNot(b => winners.contains(b._1))
        (touched ++ untouched).sortBy(_._1)
      }
      val got = Temporal.applyChangelog(
          base.toDF("k", "name", "amt"),
          changes.toDF("k", "v", "del", "name", "amt"),
          key = "k", versionCol = "v", deleteCol = "del")
        .as[(Long, String, Double)].collect().toSeq.sortBy(_._1)
      assert(got === ref, s"trial $trial")
    }
  }

  test("maintainSumCount: the IVM property — maintained equals " +
      "recomputed over the edited row set; zero-count groups drop, " +
      "insert-born groups appear, null flag inserts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows0 = Seq(("a", 10L), ("a", 20L), ("b", 5L), ("c", 7L))
    val base = rows0.toDF("g", "v").groupBy("g")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
    val changes = Seq(
      ("a", 20L, Option(true)),   // delete one a-row
      ("b", 5L, Option(true)),    // delete b entirely -> group drops
      ("d", 9L, Option(false)),   // insert-born group
      ("c", 3L, Option.empty[Boolean])) // null flag = insert
      .toDF("g", "v", "del")
    val got = Temporal.maintainSumCount(base, changes, "g", "v", "del")
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    // recompute from the edited row set
    val edited = rows0.diff(Seq(("a", 20L), ("b", 5L))) ++
      Seq(("d", 9L), ("c", 3L))
    val expect = edited.groupBy(_._1).map { case (g, rs) =>
      (g, rs.map(_._2).sum, rs.size.toLong) }.toSeq.sortBy(_._1)
    assert(got === expect)
  }

  test("applyChangelog winner selection is a partial aggregate, not a " +
      "window sort over the changelog") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("k", "name")
    val changes = Seq((1L, 1, false, "b")).toDF("k", "v", "del", "name")
    val plan = Temporal.applyChangelog(base, changes, "k", "v", "del")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("max_by") || plan.contains("MaxBy") ||
      plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      plan)
  }

  test("applyChangelogBucketed: result equals applyChangelog and the " +
      "merge plan carries NO base-side Exchange (bucketed scan feeds " +
      "the join pre-partitioned)") {
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (4L, "d", 40L)).toDF("k", "s", "v")
    val changes = Seq(
      (1L, 1L, false, "a1", 11L),  // upsert
      (1L, 2L, false, "a2", 12L),  // later upsert wins
      (2L, 1L, true, "x", 0L),     // tombstone
      (9L, 1L, false, "i", 90L))   // insert
      .toDF("k", "ver", "del", "s", "v")
    val table = "graft_spec_cdc_base"
    Temporal.saveBucketedBase(base, table, key = "k", nBuckets = 4)
    try {
      val out = Temporal.applyChangelogBucketed(spark, table, changes,
        key = "k", versionCol = "ver", deleteCol = "del")
      val plain = Temporal.applyChangelog(base, changes,
        key = "k", versionCol = "ver", deleteCol = "del")
      assert(out.as[(Long, String, Long)].collect().toSet ===
        plain.as[(Long, String, Long)].collect().toSet)
      assert(out.as[(Long, String, Long)].collect().toSet === Set(
        (1L, "a2", 12L), (3L, "c", 30L), (4L, "d", 40L), (9L, "i", 90L)))
      // plan pin: walking down the join's BASE side must reach the
      // bucketed table scan without crossing an Exchange — that is the
      // whole point of the bucketed deployment shape
      val plan = out.queryExecution.executedPlan.toString
      val joinIdx = plan.indexOf("Join")
      val scanIdx = plan.indexOf(table)
      assert(joinIdx >= 0 && scanIdx > joinIdx, plan)
      val baseSide = plan.substring(joinIdx, scanIdx)
      // the base side is the FIRST join child in the printed tree; the
      // changelog side (with its legitimate Exchange) prints after the
      // base scan line, so no Exchange may appear between join and scan
      assert(!baseSide.contains("Exchange"),
        s"base side of the bucketed merge must not shuffle:\n$plan")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }
}
