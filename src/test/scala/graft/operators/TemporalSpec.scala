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
}
