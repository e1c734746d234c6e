package graft.finance

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable transaction store: fingerprinting, cents encoding, id assignment
  * and the fingerprint-keyed merge-upsert.
  *
  * Reference semantics (/root/reference/panda.py:560-733) re-expressed as a
  * deterministic two-phase Spark job over a parquet system-of-record:
  *
  *   - money persists as exact integer cents via banker's rounding
  *     (pandas `.round()` is half-to-even → Spark `bround`, panda.py:678-679);
  *   - `fingerprint` = sha256 of the 7-field natural key with NULL→"" (amount
  *     NULL→"0"), '|'-separated, UTF-8 (panda.py:569-592) — computed with the
  *     codegen'd `sha2`/`concat` builtins, not a row-wise UDF;
  *   - upsert: rows whose fingerprint already exists keep their identity
  *     columns (`transaction_id`, natural key, `imported_at`) and take ONLY
  *     `transfer_category, category, category_manual, balance_cents` from the
  *     batch (panda.py:722-727); new rows get `MAX(id)+position` ids where
  *     position enumerates the whole batch in canonical order — conflicting
  *     rows burn their candidate ids, exactly like the reference
  *     (panda.py:685-691).
  *
  * Scale posture: the merge is one shuffle join keyed on fingerprint. At
  * fleet scale, write the store bucketed by fingerprint
  * ([[saveBucketed]]: `bucketBy(n, "fingerprint")` + `partitionBy(
  * book_year)`) so the merge join is co-located — the store side reads its
  * buckets with NO Exchange (only the small batch shuffles) — and
  * re-categorization jobs prune to the years they touch. StoreSpec asserts
  * both properties on the physical plan.
  */
object Store {

  /** Canonical output ordering (panda.py:647, 742-744), nulls last. */
  val canonicalOrder: Seq[Column] = Seq(
    asc_nulls_last("book_date"), asc_nulls_last("account"),
    asc_nulls_last("valuta_date"), asc_nulls_last("party"),
    asc_nulls_last("purpose"))

  /** `amount` (euros, double) → exact integer cents, banker's rounding. */
  def cents(c: Column): Column = bround(c * 100, 0).cast("long")

  /** sha256 natural-key fingerprint (panda.py:569-592). `concat_ws` would
    * skip NULLs instead of inserting "" — each field is coalesced explicitly.
    */
  def fingerprint(
      account: Column, bookDate: Column, valutaDate: Column, party: Column,
      bookText: Column, purpose: Column, amountCents: Column): Column =
    sha2(concat(
      coalesce(account, lit("")), lit("|"),
      coalesce(date_format(bookDate, "yyyy-MM-dd"), lit("")), lit("|"),
      coalesce(date_format(valutaDate, "yyyy-MM-dd"), lit("")), lit("|"),
      coalesce(party, lit("")), lit("|"),
      coalesce(bookText, lit("")), lit("|"),
      coalesce(purpose, lit("")), lit("|"),
      coalesce(amountCents.cast("string"), lit("0"))), 256)

  /** Decorate an in-memory batch (8-col raw layout + category columns) with
    * `amount_cents`, `balance_cents`, `fingerprint` (panda.py:672-682).
    */
  def withStoreColumns(df: DataFrame): DataFrame = {
    val d = df
      .withColumn("amount_cents", cents(col("amount")))
      .withColumn("balance_cents", cents(col("balance")))
    d.withColumn("fingerprint",
      fingerprint(col("account"), col("book_date"), col("valuta_date"),
        col("party"), col("book_text"), col("purpose"), col("amount_cents")))
  }

  /** Merge a prepared batch into the existing store (both carrying
    * [[TransactionSchema.storeSchema]] columns minus ids on the batch side).
    *
    * `existing` may be empty (first import). Returns the new store content.
    */
  def upsert(existing: DataFrame, batch: DataFrame): DataFrame =
    upsertReleasable(existing, batch)._1

  /** [[upsert]] plus a release handle that frees the internally persisted
    * sorted batch. Import COMMANDS (Cli.ingImport / Cli.categorize /
    * YamlStore.migrate) must call the handle after [[save]] materializes
    * the result — otherwise a long-lived import session accumulates one
    * MEMORY_AND_DISK entry per batch until `clearCache`. Lazy QUERY
    * consumers (the q39 gate) may ignore the handle: their cache entry is
    * released with the session, bounded by one entry per upsert call.
    */
  def upsertReleasable(existing: DataFrame, batch: DataFrame,
      idBase: Option[Long] = None): (DataFrame, () => Unit) = {
    val spark = existing.sparkSession
    import spark.implicits._

    // MAX(id)+1 offset — single tiny driver-side aggregate (panda.py:685-688).
    // `idBase` overrides it for callers merging against a SLICE of the
    // store ([[upsertBucketedYears]]): ids must continue from the GLOBAL
    // max, not the slice's.
    val maxId: Long = idBase.getOrElse(
      existing.agg(coalesce(max("transaction_id"), lit(0L))).as[Long].head())

    // Candidate ids enumerate the WHOLE batch in canonical order; ids of
    // conflicting rows are burned (panda.py:691). Range-repartition gives
    // a total order ACROSS partitions (partition i's ranges precede
    // partition i+1's), so id = maxId + (rows in earlier partitions) +
    // (rank within my partition) — MAX(id)+position semantics with no
    // single-partition exchange (a bare `Window.orderBy` funnels every
    // row through one task; at 100 TB that is the whole job's
    // bottleneck). Both pieces stay inside ONE Catalyst plan (no RDD
    // serde seam): the within-partition rank is a `row_number` window
    // PARTITIONED BY `spark_partition_id()` (parallel across partitions;
    // ties in canonicalOrder get arbitrary-but-unique ranks, exactly as
    // positional enumeration did), and the earlier-partition row counts
    // are a ≤(#partitions)-row aggregate cumulated by a tiny window and
    // broadcast back.
    //
    // NOTE: the batch is persisted because its lineage feeds two
    // consumers (the offsets aggregate and the main join) and because
    // `spark_partition_id()` must observe the SAME partition layout in
    // both — the cache pins the range partitioning computed once; the
    // cache entry lives until the import session ends (or
    // `spark.catalog.clearCache()`).
    val sorted = batch.drop("transaction_id")
      .repartitionByRange(canonicalOrder: _*)
      .sortWithinPartitions(canonicalOrder: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val byPid = sorted.withColumn("graft_pid", spark_partition_id())
    val pidW = org.apache.spark.sql.expressions.Window.orderBy("graft_pid")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = byPid.groupBy("graft_pid")
      .agg(count(lit(1)).as("graft_cnt"))
      .select(col("graft_pid"),
        coalesce(sum("graft_cnt").over(pidW), lit(0L)).as("graft_off"))
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy("graft_pid").orderBy(canonicalOrder: _*)
    val candidate = byPid.join(broadcast(offsets), Seq("graft_pid"))
      .withColumn("transaction_id",
        lit(maxId) + col("graft_off") + row_number().over(rankW).cast("long"))
      .drop("graft_pid", "graft_off")
      .select((sorted.columns :+ "transaction_id").map(col).toSeq: _*)

    val updateCols = Seq("transfer_category", "category", "category_manual",
      "balance_cents")
    val identityCols = TransactionSchema.storeSchema.fieldNames.toSeq
      .filterNot(updateCols.contains)

    val ex = existing.select(
      col("fingerprint").as("fp"),
      struct(existing.columns.map(col).toSeq: _*).as("ex"))
    val ba = candidate.select(
      col("fingerprint").as("fp"),
      struct(candidate.columns.map(col).toSeq: _*).as("ba"))

    // Full outer join on fingerprint = MERGE. Matched rows keep identity
    // columns from the store and take the 4 update columns from the batch.
    val merged = ex.join(ba, Seq("fp"), "full_outer").select(
      (identityCols.map(c =>
        coalesce(col(s"ex.$c"), col(s"ba.$c")).as(c)) ++
       updateCols.map(c =>
        when(col("ba").isNotNull, col(s"ba.$c"))
          .otherwise(col(s"ex.$c")).as(c))): _*)
      .select(TransactionSchema.storeSchema.fieldNames.map(col).toSeq: _*)
    // blocking: at a command boundary the point is freeing executor
    // memory BEFORE the next batch starts, not eventually
    (merged, () => { sorted.unpersist(blocking = true); () })
  }

  /** Batch-import composition (panda.py:736-745): store rows win over
    * re-imported rows on the 7-col natural key (keep='first' over the
    * store-then-batch concat). Encoded as a source-priority min_by
    * aggregation — bare `dropDuplicates` is non-deterministic about
    * survivors, and the previous `row_number over (partition by key)`
    * funnels every occurrence of a hot natural key into ONE window task
    * (a duplicate-heavy re-import at fleet scale = one straggler sorting
    * 10 % of the batch). min_by partial-aggregates map-side, so a hot key
    * reaches the reducer as ≤ one row per map partition; the `_pos`
    * tie-break keeps the survivor unique and store-first (ids are unique
    * per row, so min_by never sees ordering ties). ScaleSmoke drives the
    * hot-key shape and asserts no straggler.
    *
    * Survivor determinism, precisely: store-vs-batch priority is always
    * deterministic (`_src`). WITHIN one batch, `_pos` is
    * `monotonically_increasing_id()`, which follows partition layout — if
    * the same natural key repeats in a batch with DIFFERING non-key
    * columns, the surviving row can change when upstream partitioning
    * changes (AQE, different parallelism). The reference's pandas
    * keep='first' is file-order-stable instead; callers needing that
    * stability should carry an explicit ingest-order column (e.g. file
    * path + line offset) and pre-dedup on it. For the ING pipeline this
    * is moot: in-batch duplicates are full-row duplicates (same non-key
    * columns), so any survivor is the same row.
    */
  def importBatch(store: DataFrame, batch: DataFrame): DataFrame = {
    val tagged = store.withColumn("_src", lit(0L))
      .unionByName(batch.withColumn("_src", lit(1L)), allowMissingColumns = true)
      .withColumn("_pos", monotonically_increasing_id())
    val dataCols = tagged.columns.filterNot(Seq("_src", "_pos").contains).toSeq
    tagged
      .groupBy(TransactionSchema.dedupKey.map(col): _*)
      .agg(min_by(struct(dataCols.map(col): _*),
        struct(col("_src"), col("_pos"))).as("_row"))
      .select(dataCols.map(c => col(s"_row.$c").as(c)): _*)
  }

  /** Store reader (panda.py:620-660): cents → float euros, canonical order.
    * The sort only materializes at this read boundary — the store itself
    * stays unsorted so writes never pay a global sort.
    */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .orderBy(canonicalOrder: _*)
      .withColumn("amount", col("amount_cents") / 100.0)
      .withColumn("balance", col("balance_cents") / 100.0)
      .select("account", "book_date", "valuta_date", "party", "book_text",
        "purpose", "transfer_category", "category", "category_manual",
        "amount", "balance")

  /** The fleet-scale store layout, realized: fingerprint-bucketed,
    * `book_year`-partitioned parquet table. Properties this buys (both
    * asserted by StoreSpec on the physical plan):
    *
    *   - the [[upsert]] merge join reads the store side straight from its
    *     buckets — hashpartitioning(fingerprint, n) is satisfied by the
    *     layout, so EnsureRequirements inserts NO Exchange over the store
    *     scan; only the (small) incoming batch shuffles. At 100 TB the
    *     store never re-shuffles for its own merge.
    *   - year-scoped jobs (re-categorization, reports) prune to the
    *     `book_year=` directories they touch instead of scanning history.
    *
    * `sortBy(fingerprint)` keeps bucket files merge-ready. NULL book_date
    * lands in the `__HIVE_DEFAULT_PARTITION__` directory — still scanned
    * by unfiltered reads. saveAsTable registers in the session catalog; a
    * deployment would declare the same layout as an EXTERNAL table at the
    * store path.
    *
    * Two-phase like [[save]]: the frame is staged to `<table>_staging` and
    * swapped in via DROP + RENAME — a direct `mode("overwrite")` into the
    * table the frame was read from throws (Spark refuses to overwrite a
    * relation it is scanning), which would break the system-of-record cycle
    * `loadBucketed → upsert → saveBucketed`. The swap window (between DROP
    * and RENAME) mirrors [[save]]'s delete-then-rename. Year-SCOPED
    * rewrites should use [[replaceYearPartitions]] instead — a full-store
    * swap for a one-year re-categorization rewrites 100 TB to change one
    * partition.
    */
  def saveBucketed(df: DataFrame, table: String, nBuckets: Int = 16): Unit = {
    val spark = df.sparkSession
    val staging = table + "_staging"
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    df.withColumn("book_year", year(col("book_date")))
      .write.mode("overwrite")
      .partitionBy("book_year")
      .bucketBy(nBuckets, "fingerprint")
      .sortBy("fingerprint")
      .format("parquet")
      .saveAsTable(staging)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"ALTER TABLE $staging RENAME TO $table")
    // RENAME moves the managed table DIRECTORY but partition entries keep
    // their absolute staging locations — re-register them from the moved
    // tree or every partitioned scan resolves to the old (gone) paths
    spark.sql(s"ALTER TABLE $table RECOVER PARTITIONS")
  }

  /** Partition-level replace: overwrite ONLY the `book_year=` partitions
    * present in `updated`, leaving every other partition's data files
    * untouched (byte-identical — StoreSpec asserts checksums). This is the
    * fleet-scale shape of the reference's idempotent re-categorization
    * (panda.py:770-775): a year-scoped categorize touches that year's
    * directories, never the rest of history.
    *
    * Mechanics: dynamic partition overwrite (`partitionOverwriteMode=
    * dynamic`) through `insertInto`, which inherits the table's bucket
    * spec, so replaced partitions stay fingerprint-bucketed and the
    * upsert-merge stays Exchange-free afterwards. The replacement slice is
    * staged to a temp table first: Spark (correctly) refuses to overwrite
    * files that the insert's own plan is reading, and the slice is small —
    * proportional to the touched years, not the store.
    */
  def replaceYearPartitions(updated: DataFrame, table: String): Unit = {
    val spark = updated.sparkSession
    val staging = table + "_slice_staging"
    val cols = spark.table(table).columns // catalog order, book_year last
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    updated.withColumn("book_year", year(col("book_date")))
      .select(cols.map(col).toSeq: _*)
      .write.mode("overwrite").format("parquet").saveAsTable(staging)
    // session conf, not a writer option: insertInto into a catalog table
    // ignores writer options — with the conf unset a STATIC overwrite
    // would silently delete every untouched partition
    val modeKey = "spark.sql.sources.partitionOverwriteMode"
    val prevMode = spark.conf.getOption(modeKey)
    spark.conf.set(modeKey, "dynamic")
    try {
      spark.table(staging).write.mode("overwrite").insertInto(table)
    } finally {
      prevMode.fold(spark.conf.unset(modeKey))(spark.conf.set(modeKey, _))
      spark.sql(s"DROP TABLE IF EXISTS $staging")
    }
  }

  /** Read the bucketed store. Keeps the `book_year` partition column so
    * callers' year filters prune; [[upsert]] callers drop it.
    */
  def loadBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Incremental upsert into a bucketed store table, scoped to the
    * `book_year` partitions the batch touches — per-call cost is
    * O(touched years + batch), never O(store). This is the continuous-
    * ingest write shape ([[graft.streaming.FinanceStream.runSpineBucketed]]
    * calls it per micro-batch); a full [[save]]/[[saveBucketed]] rewrite
    * per batch would be O(100 TB) per trigger at fleet scale.
    *
    * Why the year scoping is CORRECT, not approximate: `book_date` is a
    * fingerprint field ([[fingerprint]]), so a batch row can only match a
    * store row with the identical book_date — i.e. inside its own
    * `book_year` partition — and the upsert's update columns
    * (categories + balance) never move a row across years. Untouched
    * years therefore cannot contain matches and their data files stay
    * byte-identical ([[replaceYearPartitions]] never opens them;
    * FinanceStreamSpec asserts checksums).
    *
    * Plan shape: the store slice is read through the table's partition
    * pruning (only touched `book_year=` directories are scanned) and its
    * fingerprint bucketing keeps the merge join Exchange-free on the
    * store side — only the batch shuffles. New ids continue from the
    * GLOBAL max id: one column-pruned aggregate over the store (parquet
    * footer stats), the single whole-store touch this path keeps.
    */
  def upsertBucketedYears(spark: SparkSession, table: String,
      batch: DataFrame): Unit = {
    import spark.implicits._
    val store = loadBucketed(spark, table)
    val maxId: Long = store.agg(coalesce(max("transaction_id"), lit(0L)))
      .as[Long].head()
    // the touched-year set is small by construction (statements span few
    // years) — collect is driver-safe; NULL book_date rows live in the
    // null partition, included via an explicit isNull branch
    val years = batch.select(year(col("book_date")).as("y")).distinct()
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    if (years.nonEmpty) {
      val inYears = years.flatten.toSeq match {
        case Seq() => None
        case ys    => Some(col("book_year").isin(ys: _*))
      }
      val nullYear =
        if (years.contains(None)) Some(col("book_year").isNull) else None
      val pred = (inYears ++ nullYear).reduce(_ || _)
      val slice = store.filter(pred).drop("book_year")
      val (merged, release) =
        upsertReleasable(slice, batch, idBase = Some(maxId))
      try replaceYearPartitions(merged, table)
      finally release()
    }
  }

  /** Two-phase overwrite: stage to `<path>.staging`, then swap. Parquet has
    * no in-place upsert; the staging write keeps the store readable until
    * the swap (at fleet scale this is a partition-level replace).
    */
  def save(df: DataFrame, path: String): Unit = {
    val staging = path + ".staging"
    df.write.mode("overwrite").parquet(staging)
    val spark = df.sparkSession
    val dst = new org.apache.hadoop.fs.Path(path)
    // the path's own filesystem — the store may live on a different
    // scheme (s3a://, file:///) than the cluster's fs.defaultFS
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), dst)
  }
}
