package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.finance.{IngCsv, Store, TransactionSchema}

/** The finance spine under Structured Streaming — SURVEY §2.10's design
  * promise made concrete (reference semantics: panda.py:753-767, the
  * import command, re-expressed as a continuously-running ingest):
  *
  *   statement directory (new ING CSVs appear over time)
  *     → `binaryFile` readStream, one row per NEW file
  *     → the SAME preamble-skip + `from_csv` projection as the batch reader
  *     → the SAME categorizer cascade (stateless projection — lifts as-is)
  *     → fingerprint/cents store prep
  *     → `dropDuplicatesWithinWatermark(fingerprint)` — bounded-state dedup
  *     → `foreachBatch` merge-upsert into the parquet store
  *
  * Batch/stream parity is BY CONSTRUCTION: every transform is the shared
  * `DataFrame => DataFrame` the batch gate (q38) hash-verifies, so the
  * batch pipeline is the streaming correctness oracle — FinanceStreamSpec
  * asserts the drained store equals q38's output row-for-row.
  *
  * Scale posture: file listing is the only driver work; parse/categorize
  * are stateless projections; dedup state is watermark-bounded (keyed on
  * fingerprint, evicted past the horizon); the upsert inside foreachBatch
  * is the same fingerprint-keyed merge join the batch path uses — against
  * a bucketed store it stays Exchange-free on the store side.
  */
object FinanceStream {

  /** The binaryFile source's fixed schema — streaming file sources demand
    * it explicitly (no inference on a stream).
    */
  private val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("modificationTime",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("length",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("content",
      org.apache.spark.sql.types.BinaryType)))

  /** binaryFile readStream over `dir` → (path, line) rows past each file's
    * preamble — the per-file skip is a STATELESS flatMap, safe under any
    * trigger.
    */
  private def ingLines(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int]): DataFrame = {
    import spark.implicits._
    val header = TransactionSchema.ingHeaderPrefix
    val reader = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.csv")
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        new String(bytes, "ISO-8859-1").split("\r?\n", -1).iterator
          .dropWhile(!_.startsWith(header))
          .drop(1) // the header line itself
          .filter(_.nonEmpty)
          .map(l => (path, l))
      }
      .toDF("path", "line")
  }

  /** Streaming ING CSV source: one row per new file under `dir`, parsed
    * with the exact batch semantics ([[IngCsv.project]]).
    */
  def ingStream(spark: SparkSession, dir: String): DataFrame =
    IngCsv.project(ingLines(spark, dir, None))

  /** Raw 8-column transactions → categorized, fingerprinted, watermark-
    * deduplicated store-ready rows. Works on a streaming OR batch frame
    * (`dropDuplicatesWithinWatermark` requires streaming; that is the one
    * streaming-only node, by design — batch dedup is importBatch's
    * keep-first, same key via the fingerprint).
    *
    * The watermark rides `book_date` (the only event time a bank statement
    * carries): duplicate fingerprints arriving within `watermarkDelay` of
    * the max seen book_date are dropped; state evicts beyond it. Statement
    * re-exports overlap by days-to-weeks, so the default horizon is 30
    * days — a re-import older than that reaches the store upsert instead,
    * which handles it as an update (identity preserved), so correctness
    * degrades gracefully to the batch semantics, never to duplicates.
    */
  def spine(raw: DataFrame, watermarkDelay: String = "30 days"): DataFrame = {
    val withCats = raw
      .withColumn("transfer_category", lit(null).cast("string"))
      .withColumn("category", lit(null).cast("string"))
      .withColumn("category_manual", lit(null).cast("string"))
    Store.withStoreColumns(EventStreams.categorizeStream(withCats))
      .withColumn("book_ts", col("book_date").cast("timestamp"))
      .withWatermark("book_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fingerprint")
      .drop("book_ts")
  }

  /** Run the spine over everything currently in `dir`, upserting each
    * micro-batch into the parquet store at `storePath` and stopping when
    * the input is drained (Trigger.AvailableNow — the streaming analogue
    * of one import command; a deployment would drop the trigger and let it
    * run). `maxFilesPerTrigger` splits the drain into multiple micro-
    * batches — the spec uses it to prove incremental upserts compose.
    */
  def runSpine(spark: SparkSession, dir: String, storePath: String,
      checkpoint: String, watermarkDelay: String = "30 days",
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val deduped = spine(
      IngCsv.project(ingLines(spark, dir, maxFilesPerTrigger)),
      watermarkDelay)
    deduped.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sess = batch.sparkSession
        val fs = org.apache.hadoop.fs.FileSystem.get(
          sess.sparkContext.hadoopConfiguration)
        val existing =
          if (fs.exists(new org.apache.hadoop.fs.Path(storePath)))
            sess.read.parquet(storePath)
          else sess.createDataFrame(
            sess.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            TransactionSchema.storeSchema)
        val prepared = batch
          .withColumn("imported_at", current_timestamp())
          .select(TransactionSchema.storeSchema.fieldNames.toSeq
            .filterNot(_ == "transaction_id").map(col): _*)
        // the command pattern: release the upsert's internal cache entry
        // once the save materialized it (Store.upsertReleasable scaladoc)
        val (merged, release) = Store.upsertReleasable(existing, prepared)
        try Store.save(merged, storePath)
        finally release()
      }
      .start()
  }
}
