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
}
