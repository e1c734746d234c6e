package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Backward as-of join ([[AsOf.joinBackward]]). */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("joinBackward picks the latest right row at or before each left " +
      "timestamp, null when none precedes, keys isolated") {
    val trades = Seq(
      (1L, 100L, ts(10), "t10"),
      (2L, 100L, ts(25), "t25"),
      (3L, 100L, ts(5), "t5"),    // before every quote → null match
      (4L, 200L, ts(50), "t50"))  // other key: must not see key-100 quotes
      .toDF("trade_id", "acct", "at", "tag")
    val quotes = Seq(
      (100L, ts(8), 1.0),
      (100L, ts(20), 2.0),
      (100L, ts(30), 3.0),
      (200L, ts(49), 9.0))
      .toDF("acct", "at", "px")

    val got = AsOf.joinBackward(trades, quotes, key = "acct", ts = "at")
      .select($"trade_id", $"at_matched", $"px")
      .as[(Long, Option[Timestamp], Option[Double])]
      .collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, Some(ts(8)), Some(1.0)),
      (2L, Some(ts(20)), Some(2.0)),
      (3L, None, None),
      (4L, Some(ts(49)), Some(9.0))))
  }

  test("joinBackward equal timestamps match inclusively (DuckDB ASOF " +
      "parity) and multi-column payloads carry through") {
    val left = Seq((1L, 7L, ts(100))).toDF("id", "k", "at")
    val right = Seq((7L, ts(100), 4.5, "exact"))
      .toDF("k", "at", "px", "note")
    val got = AsOf.joinBackward(left, right, key = "k", ts = "at")
      .select($"id", $"at_matched", $"px", $"note")
      .as[(Long, Timestamp, Double, String)].collect()
    assert(got.toSeq === Seq((1L, ts(100), 4.5, "exact")))
  }

  test("joinForward picks the earliest right row at or after each left " +
      "timestamp; inclusive ties; null when none follows") {
    val trades = Seq(
      (1L, 100L, ts(10)),   // next quote at 12
      (2L, 100L, ts(20)),   // exact tie at 20
      (3L, 100L, ts(31)))   // nothing follows → null
      .toDF("trade_id", "acct", "at")
    val quotes = Seq(
      (100L, ts(8), 1.0), (100L, ts(12), 2.0),
      (100L, ts(20), 3.0), (100L, ts(30), 4.0))
      .toDF("acct", "at", "px")
    val got = AsOf.joinForward(trades, quotes, key = "acct", ts = "at")
      .select($"trade_id", $"at_matched", $"px")
      .as[(Long, Option[Timestamp], Option[Double])]
      .collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, Some(ts(12)), Some(2.0)),
      (2L, Some(ts(20)), Some(3.0)),
      (3L, None, None)))
  }

  test("joinBackward is one shuffle — no pair explosion, no join node") {
    val left = (1L to 50L).map(i => (i, i % 3, ts(i * 10))).toDF("id", "k", "at")
    val right = (1L to 200L).map(i => (i % 3, ts(i * 3), i * 1.0))
      .toDF("k", "at", "px")
    val out = AsOf.joinBackward(left, right, key = "k", ts = "at")
    val aqeKey = "spark.sql.adaptive.enabled"
    val prior = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false") // deterministic physical plan to assert
    val plan =
      try AsOf.joinBackward(left, right, key = "k", ts = "at")
        .queryExecution.executedPlan
      finally spark.conf.set(aqeKey, prior)
    val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.size === 1, plan.toString)
    assert(!plan.toString.toLowerCase.contains("join"), plan.toString)
    val windows = plan.collect {
      case wn: org.apache.spark.sql.execution.window.WindowExec => wn }
    assert(windows.size === 1,
      s"payload carries must share ONE window pass\n$plan")
    // hot-key density: every left row still gets the correct latest match
    val row = out.where($"id" === 48L).select($"px").as[Double].head()
    // key 0, left ts 480 → right rows at ts ≡ 0 (mod 9) ≤ 480 → i=159
    assert(row === 159.0)
  }

  test("resampleFfill: aligned hourly grid per key, value carried " +
      "forward between observations, null before the first") {
    import java.sql.Timestamp
    def ts(x: String) = Timestamp.valueOf(x)
    val obs = Seq(
      (1L, ts("2024-01-01 10:30:00"), 5.0),
      (1L, ts("2024-01-01 13:10:00"), 7.0),
      (2L, ts("2024-01-01 11:00:00"), 9.0))
      .toDF("k", "at", "v")
    val got = AsOf.resampleFfill(obs, key = "k", ts = "at")
      .select(col("k"), col("at"), col("v"))
      .as[(Long, Timestamp, Option[Double])]
      .collect().toSeq.sortBy(r => (r._1, r._2.getTime))
    assert(got === Seq(
      // key 1: grid 10:00..13:00; 10:00 precedes the first obs -> null;
      // 11:00/12:00/13:00 carry 5.0 (13:10 is after the 13:00 point)
      (1L, ts("2024-01-01 10:00:00"), None),
      (1L, ts("2024-01-01 11:00:00"), Some(5.0)),
      (1L, ts("2024-01-01 12:00:00"), Some(5.0)),
      (1L, ts("2024-01-01 13:00:00"), Some(5.0)),
      // key 2: single on-grid obs -> one grid point, matched inclusively
      (2L, ts("2024-01-01 11:00:00"), Some(9.0))))
  }
}
