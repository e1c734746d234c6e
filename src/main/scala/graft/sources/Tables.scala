package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All loaders are plain `spark.read.parquet` so Catalyst keeps full
  * pushdown/pruning freedom — no eager caching, no schema coercion.
  * Column pruning + predicate pushdown reach the parquet scan because
  * nothing here materializes the DataFrame.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "lineitem")
  /** events.parquet has shipped `ts` two ways across driver testdata
    * generations: TIMESTAMP(MICROS) (read directly — any timestamp-typed
    * `ts` is already the micros semantics every consumer wants) and
    * TIMESTAMP(NANOS), which Spark's vectorized reader rejects. For the
    * nanos generation, read nanos as raw long (legacy conf) and
    * floor-convert to a micros TimestampType — same truncation DuckDB
    * applies when materializing TIMESTAMP_NS, so oracle comparisons stay
    * exact. The generation is detected from the resolved schema, not
    * assumed.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // Micros generation: resolves cleanly and `ts` is timestamp-typed.
    // Nanos generation: schema resolution itself throws
    // (PARQUET_TYPE_ILLEGAL) without the legacy conf — fall through.
    val direct =
      try {
        val df = spark.read.parquet(s"$sfDir/events.parquet")
        if (df.schema("ts").dataType.typeName.startsWith("timestamp"))
          Some(df)
        else None
      } catch { case _: org.apache.spark.sql.AnalysisException => None }
    direct.getOrElse(eventsNanosLegacy(spark, sfDir))
  }

  /** Nanos-generation loader — see [[events]]. */
  private def eventsNanosLegacy(spark: SparkSession, sfDir: String): DataFrame = {
    // The legacy conf is needed while the parquet footer schema is converted
    // (eager, at read time — the schema converter reads the SESSION conf and
    // ignores reader options for this key; verified on this Spark version:
    // an option-only read throws PARQUET_TYPE_ILLEGAL) and again when the
    // physical scan captures its hadoopConf (lazy, at first action). Leaving
    // it set globally would be a side effect on a shared session, so:
    // set → force schema resolution → restore, and pin the scan's own copy
    // by re-stating the conf as a per-read option (DataFrameReader options
    // overlay the session conf in the scan's hadoopConf, surviving the
    // restore — TablesSpec asserts decoded VALUES post-restore).
    //
    // NOT thread-safe on a shared session: a concurrent reader resolving
    // OTHER nanos parquet during the set→restore window would see the
    // legacy decode. Callers doing concurrent nanos reads should serialize
    // schema resolution (one-line sync) or pre-resolve schemas up front.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val df = spark.read.option(key, "true")
        .parquet(s"$sfDir/events.parquet")
      df.schema // force footer→catalyst conversion under the scoped conf
      // `ts div 1000` — INTEGER division. `floor(ts / 1000)` would divide in
      // double, and epoch-nanos (~1.7e18) exceed double's 2^53 mantissa →
      // off-by-±1µs vs DuckDB's exact ns→µs truncation.
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
