package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.EventStreams

/** Batch-mode driver queries exercising the streaming transforms
  * (graft.streaming.EventStreams): the same DataFrame=>DataFrame functions
  * run under readStream — batch here IS the streaming semantics oracle.
  */
object StreamQueries {

  /** q35: session windows (30-min gap) per user. The DuckDB oracle states
    * the same semantics as gaps-and-islands SQL (new session when the gap
    * to the previous event is >= 30 min; session_end = last event + gap).
    */
  def q35Sessionization(spark: SparkSession, sfDir: String): DataFrame =
    EventStreams.sessionAgg(Tables.events(spark, sfDir), "30 minutes")
      .orderBy("user_id", "session_start")

  /** q36: sliding 1-hour windows every 30 minutes per event type. */
  def q36SlidingWindow(spark: SparkSession, sfDir: String): DataFrame =
    EventStreams.slidingAgg(Tables.events(spark, sfDir), "1 hour", "30 minutes")
      .orderBy("window_start", "event_type")

  /** q66: interval join ([[EventStreams.intervalJoin]]) in batch mode —
    * per purchase, the count and value sum of the same user's views
    * within ±30 minutes (left join keeps zero-view purchases). The
    * streaming twin (watermarked stream-stream join, bounded state) is
    * spec-anchored in EventStreamsSpec; this gate proves the predicate
    * semantics against a plain range-join in DuckDB.
    */
  def q66IntervalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value"))
    EventStreams.intervalJoin(purchases, views, key = "user_id",
        factTs = "ts", ctxTs = "ts", before = "30 MINUTES",
        after = "30 MINUTES", joinType = "left")
      .groupBy(col("event_id"))
      .agg(count(col("ctx_ts")).as("n_views"),
        round(coalesce(sum(col("ctx_value")), lit(0.0)), 2)
          .as("sum_view_value"))
      .orderBy("event_id")
  }
}
