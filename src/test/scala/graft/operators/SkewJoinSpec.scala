package graft.operators

import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted equi-join ([[SkewJoin.saltedEquiJoin]]). */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private def hotLeft = (1L to 400L)
    .map(i => (if (i % 10 == 0) 7L else i, s"p$i"))
    .toDF("k", "payload") // key 7 holds 10% of the rows
  private def smallRight = (1L to 50L).map(i => (i, i * 2.0))
    .toDF("rk", "weight")

  test("salted inner join returns exactly the plain join's rows") {
    val plain = hotLeft.join(smallRight, $"k" === $"rk")
      .select($"k", $"payload", $"weight")
      .as[(Long, String, Double)].collect().sorted
    val salted = SkewJoin.saltedEquiJoin(hotLeft, smallRight, "k", "rk",
        buckets = 4)
      .select($"k", $"payload", $"weight")
      .as[(Long, String, Double)].collect().sorted
    assert(salted.toSeq === plain.toSeq)
    assert(plain.nonEmpty)
  }

  test("salted left join keeps unmatched probe rows with null build side") {
    val got = SkewJoin.saltedEquiJoin(hotLeft, smallRight, "k", "rk",
        buckets = 4, joinType = "left")
      .select($"k", $"weight")
      .as[(Long, Option[Double])].collect()
    assert(got.length === hotLeft.count())
    // keys 51..400 (except hot 7) have no right match
    assert(got.count(_._2.isEmpty) ===
      hotLeft.where($"k" > 50 && $"k" =!= 7L).count())
  }

  test("plan: joins on (key, salt), never a broadcast — the salt must " +
      "land in the shuffle keys to spread the hot partition") {
    val aqeKey = "spark.sql.adaptive.enabled"
    val prior = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    val plan =
      try SkewJoin.saltedEquiJoin(hotLeft, smallRight, "k", "rk",
        buckets = 4).queryExecution.executedPlan
      finally spark.conf.set(aqeKey, prior)
    assert(plan.collect { case b: BroadcastHashJoinExec => b }.isEmpty,
      plan.toString)
    val joinKeys = plan.collect {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        j.leftKeys.map(_.sql).mkString(",")
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        j.leftKeys.map(_.sql).mkString(",")
    }
    assert(joinKeys.nonEmpty && joinKeys.head.contains("graft_salt"),
      s"salt must be a join key: $joinKeys\n$plan")
  }

  test("adaptiveSkewJoin: result equals the plain join on BOTH routes " +
      "(skewed input salts the hot key; flat input skips the salt)") {
    // skewed: key 7 holds 10% — above the 2% hotShare default
    val plainHot = hotLeft.join(smallRight, $"k" === $"rk")
      .select($"k", $"payload", $"weight")
      .as[(Long, String, Double)].collect().sorted
    val gotHot = SkewJoin.adaptiveSkewJoin(hotLeft, smallRight, "k", "rk",
        buckets = 4)
      .select($"k", $"payload", $"weight")
      .as[(Long, String, Double)].collect().sorted
    assert(gotHot.toSeq === plainHot.toSeq)
    // flat: uniform keys — no key above hotShare
    val flatLeft = (1L to 400L).map(i => (i, s"p$i")).toDF("k", "payload")
    val plainFlat = flatLeft.join(smallRight, $"k" === $"rk")
      .select($"k", $"payload", $"weight")
      .as[(Long, String, Double)].collect().sorted
    val gotFlat = SkewJoin.adaptiveSkewJoin(flatLeft, smallRight, "k", "rk",
        buckets = 4)
      .select($"k", $"payload", $"weight")
      .as[(Long, String, Double)].collect().sorted
    assert(gotFlat.toSeq === plainFlat.toSeq)
    // left join: unmatched and null-key probe rows survive either route
    val withNull = hotLeft.unionByName(
      Seq((Option.empty[Long], "pnull")).toDF("k", "payload"))
    val gotLeft = SkewJoin.adaptiveSkewJoin(withNull, smallRight, "k", "rk",
        buckets = 4, joinType = "left")
      .select($"k", $"weight").as[(Option[Long], Option[Double])].collect()
    assert(gotLeft.length === withNull.count())
    assert(gotLeft.exists(r => r._1.isEmpty && r._2.isEmpty))
    // right/full are rejected loudly (probe-sided split contract)
    intercept[IllegalArgumentException] {
      SkewJoin.adaptiveSkewJoin(hotLeft, smallRight, "k", "rk", 4, "right")
    }
  }

  test("adaptiveSkewJoin plan: flat input has NO graft_salt anywhere; " +
      "skewed input salts only the hot branch") {
    val aqeKey = "spark.sql.adaptive.enabled"
    val prior = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    try {
      val flatLeft = (1L to 4000L).map(i => (i, s"p$i")).toDF("k", "payload")
      val flatPlan = SkewJoin.adaptiveSkewJoin(flatLeft, smallRight,
        "k", "rk", buckets = 4).queryExecution.executedPlan.toString
      assert(!flatPlan.contains("graft_salt"),
        s"flat histogram must skip the salt:\n$flatPlan")
      val hotPlan = SkewJoin.adaptiveSkewJoin(hotLeft, smallRight,
        "k", "rk", buckets = 4).queryExecution.executedPlan.toString
      assert(hotPlan.contains("graft_salt"),
        s"skewed histogram must route the hot key to the salt:\n$hotPlan")
    } finally spark.conf.set(aqeKey, prior)
  }

  test("salt assignment is deterministic across evaluations (retry " +
      "stability) and spreads the hot key over multiple buckets") {
    val salted = hotLeft.withColumn("graft_salt",
      pmod(xxhash64(col("k"), col("payload")), lit(4)).cast("int"))
    val a = salted.select("k", "payload", "graft_salt")
      .as[(Long, String, Int)].collect().sorted
    val b = salted.select("k", "payload", "graft_salt")
      .as[(Long, String, Int)].collect().sorted
    assert(a.toSeq === b.toSeq)
    val hotSalts = a.filter(_._1 == 7L).map(_._3).distinct
    assert(hotSalts.length > 1,
      s"hot key must spread across buckets, got $hotSalts")
  }
}
