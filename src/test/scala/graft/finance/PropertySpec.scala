package graft.finance

import java.sql.Date
import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based invariants (SURVEY §5.2): fingerprint determinism and
  * injectivity-on-key, categorize idempotence, import idempotence, upsert
  * re-apply stability. Generators mix adversarial inputs: NULLs, rule-
  * triggering substrings, umlauts, whitespace-only manual categories,
  * duplicate natural keys. Fixed seed → deterministic suite.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val genText: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(s => if (s.isEmpty) "x" else s.take(12)),
    Gen.oneOf("REWE MARKT GMBH", "amazon payments", "VISA APPLE.COM/BILL",
      "Kreuzwerker", "PayPal Europe", "Miete für die Wohnung",
      "Überweisung Straßenbahn", "Darl.-Leistung Tilgung 1,00 Zinsen 2,00"),
    Gen.const(null: String))

  private val genManual: Gen[String] = Gen.oneOf(
    Gen.const(null: String), Gen.const(""), Gen.const("   "),
    Gen.const("manual::cat"))

  private val genTx: Gen[(String, Date, Date, String, String, String, Double, Double, String)] =
    for {
      account <- Gen.oneOf("giro", "gesa", "common", "extra", "kontist")
      bd      <- Gen.choose(19000L, 20500L).map(d => Date.valueOf(LocalDate.ofEpochDay(d)))
      vd      <- Gen.choose(19000L, 20500L).map(d => Date.valueOf(LocalDate.ofEpochDay(d)))
      party   <- genText
      bookTxt <- genText
      purpose <- genText
      amount  <- Gen.choose(-2000000L, 2000000L).map(_ / 100.0)
      balance <- Gen.choose(-2000000L, 2000000L).map(_ / 100.0)
      manual  <- genManual
    } yield (account, bd, vd, party, bookTxt, purpose, amount, balance, manual)

  // duplicates are interesting: sometimes re-append a prefix of the batch
  private val genBatch: Gen[List[(String, Date, Date, String, String, String, Double, Double, String)]] =
    for {
      base <- Gen.listOfN(12, genTx)
      dups <- Gen.choose(0, 4)
    } yield base ++ base.take(dups)

  private def df(rows: Seq[(String, Date, Date, String, String, String, Double, Double, String)]): DataFrame =
    rows.toDF("account", "book_date", "valuta_date", "party", "book_text",
      "purpose", "amount", "balance", "category_manual")
      .withColumn("transfer_category", lit(null).cast("string"))
      .withColumn("category", lit(null).cast("string"))

  private def canon(d: DataFrame): Seq[String] =
    d.collect().map(_.toString).sorted.toSeq

  private def check(name: String, prop: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(5)
      .withInitialSeed(Seed(0xC0FFEEL))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("fingerprint is deterministic and injective on the 7-field key") {
    check("fingerprint", Prop.forAll(genBatch) { rows =>
      val d = Store.withStoreColumns(df(rows))
      val nKeys = d.select(TransactionSchema.dedupKey.map(col): _*)
        .distinct().count()
      val nFps = d.select("fingerprint").distinct().count()
      val again = Store.withStoreColumns(df(rows))
        .select("fingerprint").distinct().count()
      nFps == nKeys && again == nFps
    })
  }

  test("categorize pipeline is idempotent") {
    check("categorize", Prop.forAll(genBatch) { rows =>
      val once = Categorizer.pipeline(df(rows))
      canon(Categorizer.pipeline(once)) == canon(once)
    })
  }

  test("importBatch is idempotent (import o import == import)") {
    check("import", Prop.forAll(genBatch, genBatch) { (storeRows, batchRows) =>
      val store = df(storeRows)
      val batch = df(batchRows)
      val once = Store.importBatch(store, batch)
      canon(Store.importBatch(once, batch)) == canon(once)
    })
  }

  test("upsert re-applying the same batch is a stable no-op (ids included)") {
    check("upsert", Prop.forAll(genBatch) { rows =>
      val prepared = Store.withStoreColumns(df(rows).drop("category_manual")
          .withColumn("category_manual", lit(null).cast("string")))
        .withColumn("imported_at", to_timestamp(lit("2024-01-01 00:00:00")))
        // upsert assumes fingerprint-unique batches (the reference dedups
        // first); mirror importBatch's keep-first here
        .dropDuplicates("fingerprint")
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], TransactionSchema.storeSchema)
      val store1 = Store.upsert(empty, prepared)
      val store2 = Store.upsert(store1, prepared)
      canon(store2) == canon(store1)
    })
  }
}
