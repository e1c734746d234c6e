package graft.finance

import java.nio.file.Files
import java.security.MessageDigest
import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StoreSpec extends SparkSpec {
  import spark.implicits._

  private def rawRow(
      account: String, bookDate: String, valutaDate: String, party: String,
      bookText: String, purpose: String, amount: Double, balance: Double) =
    (account, Date.valueOf(bookDate), Date.valueOf(valutaDate), party,
      bookText, purpose, amount, balance)

  private def rawDf(rows: Seq[(String, Date, Date, String, String, String, Double, Double)]): DataFrame =
    rows.toDF("account", "book_date", "valuta_date", "party", "book_text",
      "purpose", "amount", "balance")
      .withColumn("transfer_category", lit(null).cast("string"))
      .withColumn("category", lit(null).cast("string"))
      .withColumn("category_manual", lit(null).cast("string"))

  private def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("fingerprint matches the reference format (golden vector)") {
    val d = Store.withStoreColumns(rawDf(Seq(
      rawRow("giro", "2024-06-03", "2024-06-04", "REWE MARKT", "Lastschrift",
        "Einkauf", -45.67, 1234.56),
      rawRow("giro", "2024-06-03", "2024-06-04", null, null, null, -45.67, 0.0))))
    val fps = d.orderBy(asc_nulls_last("party")).select("fingerprint")
      .as[String].collect()
    assert(fps(0) === sha256Hex(
      "giro|2024-06-03|2024-06-04|REWE MARKT|Lastschrift|Einkauf|-4567"))
    // NULL text fields → "", never the literal "null"
    assert(fps(1) === sha256Hex("giro|2024-06-03|2024-06-04||||-4567"))
  }

  test("cents use banker's rounding (half-to-even), matching pandas .round()") {
    val d = rawDf(Seq(
      rawRow("giro", "2024-01-01", "2024-01-01", "a", null, null, 0.125, 0.135),
      rawRow("giro", "2024-01-02", "2024-01-02", "b", null, null, -0.125, 0.0)))
    val out = Store.withStoreColumns(d)
      .orderBy("book_date").select("amount_cents", "balance_cents")
      .as[(Long, Long)].collect()
    assert(out(0) === ((12L, 14L)))  // 12.5 → 12 (even), 13.5 → 14 (even)
    assert(out(1)._1 === -12L)
  }

  test("upsert: new rows inserted with MAX(id)+position ids, burned on conflict") {
    val first = Store.withStoreColumns(rawDf(Seq(
      rawRow("giro", "2024-01-01", "2024-01-01", "a", null, "p1", -1.0, 0.0),
      rawRow("giro", "2024-01-02", "2024-01-02", "b", null, "p2", -2.0, 0.0))))
    // LocalRelation empty (not emptyRDD) so the no-RDD-seam plan assertion
    // below sees only relational leaves.
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      TransactionSchema.storeSchema)
    val store1 = Store.upsert(empty, first
      .withColumn("imported_at", current_timestamp()))
    assert(store1.select("transaction_id").as[Long].collect().sorted
      === Array(1L, 2L))

    // Second import: one existing row (conflict) + one new row. The batch
    // enumerates ids 3,4 in canonical order; the conflicting row burns its
    // candidate id; the new row keeps its position-based id.
    val second = Store.withStoreColumns(rawDf(Seq(
      rawRow("giro", "2024-01-01", "2024-01-01", "a", null, "p1", -1.0, 0.0),
      rawRow("giro", "2024-01-03", "2024-01-03", "c", null, "p3", -3.0, 0.0))))
    val store2 = Store.upsert(store1,
      second.withColumn("imported_at", current_timestamp()))
    val ids = store2.orderBy("book_date")
      .select("party", "transaction_id").as[(String, Long)].collect()
    assert(ids === Array(("a", 1L), ("b", 2L), ("c", 4L)))

    // The id-assignment path stays inside ONE Catalyst plan: no RDD seam
    // (Scan ExistingRDD / SerializeFromObject show up when a DataFrame is
    // rebuilt from an RDD, as the old zipWithIndex path did). The only
    // non-relational leaf allowed is the in-memory cache of the sorted
    // batch and the empty-store LocalRelation.
    val plan = store2.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), plan.take(2000))
    assert(!plan.contains("SerializeFromObject"), plan.take(2000))
  }

  test("upsert updates ONLY the 4-column policy, preserving identity columns") {
    val v1 = Store.withStoreColumns(rawDf(Seq(
      rawRow("giro", "2024-01-01", "2024-01-01", "a", null, "p1", -1.0, 10.0)))
      .withColumn("category", lit("old::cat")))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      TransactionSchema.storeSchema)
    val store1 = Store.upsert(empty,
      v1.withColumn("imported_at", to_timestamp(lit("2024-01-01 00:00:00"))))

    // Re-import the same natural key with new categorization and balance.
    val v2 = Store.withStoreColumns(rawDf(Seq(
      rawRow("giro", "2024-01-01", "2024-01-01", "a", null, "p1", -1.0, 99.0))
      ).withColumn("category", lit("new::cat"))
       .withColumn("transfer_category", lit("t::x")))
    // same fingerprint: balance is NOT part of the natural key
    val store2 = Store.upsert(store1,
      v2.withColumn("imported_at", to_timestamp(lit("2025-01-01 00:00:00"))))

    val row = store2.collect().head
    assert(store2.count() === 1)
    assert(row.getAs[Long]("transaction_id") === 1L)            // preserved
    assert(row.getAs[java.sql.Timestamp]("imported_at").toString
      .startsWith("2024-01-01"))                                // preserved
    assert(row.getAs[String]("category") === "new::cat")        // updated
    assert(row.getAs[String]("transfer_category") === "t::x")   // updated
    assert(row.getAs[Long]("balance_cents") === 9900L)          // updated
  }

  test("importBatch: store rows beat re-imported rows on the natural key") {
    val store = rawDf(Seq(
      rawRow("giro", "2024-01-01", "2024-01-01", "a", "t", "p", -1.0, 0.0)))
      .withColumn("category", lit("kept"))
    val batch = rawDf(Seq(
      rawRow("giro", "2024-01-01", "2024-01-01", "a", "t", "p", -1.0, 50.0),
      rawRow("giro", "2024-01-05", "2024-01-05", "z", "t", "p", -9.0, 0.0)))
    val out = Store.importBatch(store, batch).orderBy("book_date").collect()
    assert(out.length === 2)
    assert(out(0).getAs[String]("category") === "kept")
    assert(out(0).getAs[Double]("balance") === 0.0)  // store row survived
    assert(out(1).getAs[String]("party") === "z")
  }

  test("bucketed store: shuffle-free store side in upsert, pruned year scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val aqeKey = "spark.sql.adaptive.enabled"
    val prior = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false") // deterministic physical plan to assert
    try {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        TransactionSchema.storeSchema)
      val batch1 = Store.withStoreColumns(rawDf(Seq(
        rawRow("giro", "2023-03-01", "2023-03-01", "a", null, "p1", -1.0, 0.0),
        rawRow("giro", "2024-01-02", "2024-01-02", "b", null, "p2", -2.0, 0.0),
        rawRow("common", "2024-05-01", "2024-05-01", "c", null, "p3", -3.0, 0.0))))
        .withColumn("imported_at", current_timestamp())
      spark.sql("DROP TABLE IF EXISTS store_bucketed_spec")
      Store.saveBucketed(Store.upsert(empty, batch1),
        "store_bucketed_spec", nBuckets = 4)

      // (a) year filters prune partitions: only book_year=2024 is scanned
      val bucketed = Store.loadBucketed(spark, "store_bucketed_spec")
      val pruned = bucketed.filter(col("book_year") === 2024)
      val scan = pruned.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f }.head
      assert(scan.partitionFilters.nonEmpty, "year filter must prune")
      assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
        .map(_.values.getInt(0)).toSet === Set(2024))

      // (b) upsert over the bucketed store: the merge SMJ reads the store
      // side straight from its buckets — no Exchange in that subtree; only
      // the batch side shuffles
      val batch2 = Store.withStoreColumns(rawDf(Seq(
        rawRow("giro", "2024-01-02", "2024-01-02", "b", null, "p2", -2.0, 9.0),
        rawRow("giro", "2024-06-06", "2024-06-06", "d", null, "p4", -4.0, 0.0))))
        .withColumn("imported_at", current_timestamp())
      val next = Store.upsert(bucketed.drop("book_year"), batch2)
      val smjs = next.queryExecution.executedPlan.collect {
        case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, "expected the merge to be a sort-merge join")
      val storeSide = smjs.head.left // ex (store) side of the full-outer join
      assert(storeSide.collect { case f: FileSourceScanExec => f }
        .exists(_.bucketedScan), "store side must be a bucketed scan")
      assert(storeSide.collect { case e: ShuffleExchangeLike => e }.isEmpty,
        "bucketed store side must not re-shuffle for its own merge")
      // and the merge result is still correct
      val out = next.orderBy("book_date")
        .select("party", "balance_cents").as[(String, Long)].collect()
      assert(out === Array(("a", 0L), ("b", 900L), ("c", 0L), ("d", 0L)))
    } finally {
      spark.conf.set(aqeKey, prior)
      spark.sql("DROP TABLE IF EXISTS store_bucketed_spec")
    }
  }

  test("bucketed store survives the read-modify-write cycle (staged swap)") {
    // loadBucketed → upsert → saveBucketed into the SAME table: the direct
    // overwrite threw AnalysisException (writing a relation being read);
    // the staged swap must make the full system-of-record cycle work.
    val table = "store_rmw_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        TransactionSchema.storeSchema)
      // distinct row contents (rmw-*): identical literal batches elsewhere
      // in the suite would let CacheManager dedup upsert's internal persist
      val batch1 = Store.withStoreColumns(rawDf(Seq(
        rawRow("giro", "2024-01-01", "2024-01-01", "rmw-a", null, "p1", -1.0, 0.0))))
        .withColumn("imported_at", current_timestamp())
      Store.saveBucketed(Store.upsert(empty, batch1), table, nBuckets = 4)
      val batch2 = Store.withStoreColumns(rawDf(Seq(
        rawRow("giro", "2024-02-02", "2024-02-02", "rmw-b", null, "p2", -2.0, 0.0))))
        .withColumn("imported_at", current_timestamp())
      Store.saveBucketed(
        Store.upsert(Store.loadBucketed(spark, table).drop("book_year"),
          batch2), table, nBuckets = 4)
      val back = Store.loadBucketed(spark, table)
      assert(back.select("party").as[String].collect().sorted
        === Array("rmw-a", "rmw-b"))
      // the swapped-in table keeps the bucket layout (catalog bucket spec
      // survives RENAME): scans can still satisfy the merge without an
      // Exchange on the store side
      import org.apache.spark.sql.execution.FileSourceScanExec
      val aqeKey = "spark.sql.adaptive.enabled"
      val prior = spark.conf.get(aqeKey)
      spark.conf.set(aqeKey, "false")
      try {
        val scan = Store.upsert(back.drop("book_year"), batch1)
          .queryExecution.executedPlan.collect {
            case f: FileSourceScanExec => f }
        assert(scan.exists(_.bucketedScan),
          "renamed table must still produce a bucketed scan")
      } finally spark.conf.set(aqeKey, prior)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("replaceYearPartitions rewrites only touched partitions byte-for-byte") {
    val table = "store_partrepl_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        TransactionSchema.storeSchema)
      val batch = Store.withStoreColumns(rawDf(Seq(
        rawRow("giro", "2023-03-01", "2023-03-01", "pr-a", null, "p1", -1.0, 0.0),
        rawRow("giro", "2023-07-01", "2023-07-01", "pr-b", null, "p2", -2.0, 0.0),
        rawRow("giro", "2024-01-02", "2024-01-02", "pr-c", null, "p3", -3.0, 0.0))))
        .withColumn("imported_at", to_timestamp(lit("2024-01-01 00:00:00")))
      Store.saveBucketed(Store.upsert(empty, batch), table, nBuckets = 4)

      val loc = java.nio.file.Paths.get(new java.net.URI(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table))
          .location.toString))
      def partFiles(year: Int): Map[String, String] = {
        val dir = loc.resolve(s"book_year=$year")
        val files = Files.list(dir).toArray.map(_.toString).filter(
          _.endsWith(".parquet"))
        files.map { f =>
          val bytes = Files.readAllBytes(java.nio.file.Paths.get(f))
          f -> MessageDigest.getInstance("SHA-256").digest(bytes)
            .map("%02x".format(_)).mkString
        }.toMap
      }
      val before2023 = partFiles(2023)
      assert(before2023.nonEmpty)

      // year-scoped re-categorization: touch ONLY 2024
      val updated = Store.loadBucketed(spark, table)
        .filter(col("book_year") === 2024).drop("book_year")
        .withColumn("category", lit("recat::done"))
      Store.replaceYearPartitions(updated, table)

      // 2023 partition data files: same paths, same bytes
      assert(partFiles(2023) === before2023,
        "untouched partition files must be byte-identical")
      // 2024 content replaced, everything else intact
      val back = Store.loadBucketed(spark, table)
      val cats = back.orderBy("book_date")
        .select("party", "category").as[(String, String)].collect()
      assert(cats === Array(("pr-a", null), ("pr-b", null),
        ("pr-c", "recat::done")))
      // replaced partition keeps the bucket layout for the merge join
      import org.apache.spark.sql.execution.FileSourceScanExec
      val aqeKey = "spark.sql.adaptive.enabled"
      val prior = spark.conf.get(aqeKey)
      spark.conf.set(aqeKey, "false")
      try {
        val scans = Store.upsert(back.drop("book_year"),
          batch).queryExecution.executedPlan.collect {
            case f: FileSourceScanExec => f }
        assert(scans.exists(_.bucketedScan),
          "store must stay a bucketed scan after partition replace")
      } finally spark.conf.set(aqeKey, prior)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("upsertReleasable frees the internal cache entry after save") {
    val dir = Files.createTempDirectory("store-rel").resolve("tx.parquet")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      TransactionSchema.storeSchema)
    val batch = Store.withStoreColumns(rawDf(Seq(
      rawRow("giro", "2024-01-01", "2024-01-01", "a", null, "p1", -1.0, 0.0))))
      .withColumn("imported_at", current_timestamp())
    // delta-based so other suites' (never-released) persists don't bleed in
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (next, release) = Store.upsertReleasable(empty, batch)
    Store.save(next, dir.toString) // materializes → the cached RDD exists
    val mine = spark.sparkContext.getPersistentRDDs.keySet
      .filterNot(before.contains)
    assert(mine.nonEmpty, "upsert persists its sorted batch")
    release()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(after.intersect(mine).isEmpty,
      "release() must leave zero cache entries after the command")
    assert(spark.read.parquet(dir.toString).count() === 1)
  }

  test("save + load round-trip restores euros and canonical order") {
    val dir = Files.createTempDirectory("store").resolve("tx.parquet").toString
    val batch = Store.withStoreColumns(rawDf(Seq(
      rawRow("giro", "2024-02-01", "2024-02-01", "b", null, null, -2.5, 1.0),
      rawRow("common", "2024-01-01", "2024-01-01", "a", null, null, 1.25, 2.0))))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      TransactionSchema.storeSchema)
    Store.save(Store.upsert(empty,
      batch.withColumn("imported_at", current_timestamp())), dir)
    val back = Store.load(spark, dir)
    val rows = back.collect()
    assert(rows.map(_.getAs[String]("account")).toSeq === Seq("common", "giro"))
    assert(rows.map(_.getAs[Double]("amount")).toSeq === Seq(1.25, -2.5))
  }
}
