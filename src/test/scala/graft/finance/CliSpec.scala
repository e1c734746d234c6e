package graft.finance

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.FinanceQueries

/** End-to-end CLI wiring over the committed ING fixtures: import →
  * re-import (idempotent) → re-categorize (idempotent) — the user's actual
  * first contact with the engine, exercising loadOrEmpty, the store↔raw
  * column conversions and the save/swap path that the per-operator specs
  * don't touch together.
  */
class CliSpec extends SparkSpec {
  import spark.implicits._

  private val csvs = FinanceQueries.ingFixtures
    .map(f => s"${FinanceQueries.fixtureDir}/${f._2}").mkString(",")

  test("ing-import: fixtures → categorized fingerprinted parquet store") {
    val dir = Files.createTempDirectory("clistore")
    val store = dir.resolve("tx.parquet").toString
    Cli.ingImport(spark, store, csvs)

    val out = spark.read.parquet(store)
    assert(out.count() === 23)
    val ids = out.select("transaction_id").as[Long].collect().sorted
    assert(ids === (1L to 23L).toArray)
    assert(out.filter(col("category").isNotNull).count() > 0)
    assert(out.filter(col("fingerprint").rlike("^[0-9a-f]{64}$")).count() === 23)

    // re-importing the same files is a no-op: same rows, same ids, same
    // imported_at (conflicting rows keep identity columns)
    val before = out.orderBy("transaction_id")
      .select("transaction_id", "fingerprint", "category", "imported_at")
      .collect().toSeq
    Cli.ingImport(spark, store, csvs)
    val after = spark.read.parquet(store).orderBy("transaction_id")
      .select("transaction_id", "fingerprint", "category", "imported_at")
      .collect().toSeq
    assert(after === before)

    // re-categorization is idempotent too (stable rules, stable ids)
    Cli.categorize(spark, store)
    val recat = spark.read.parquet(store).orderBy("transaction_id")
      .select("transaction_id", "fingerprint", "category", "imported_at")
      .collect().toSeq
    assert(recat === before)
  }
}
