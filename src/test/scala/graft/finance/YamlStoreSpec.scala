package graft.finance

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

class YamlStoreSpec extends SparkSpec {
  import spark.implicits._

  private val sample = Seq(
    ("giro", Date.valueOf("2024-01-02"), Date.valueOf("2024-01-02"),
      "REWE MARKT GMBH", "Lastschrift", "REWE SAGT DANK 123456",
      -54.32, 1234.56, "einkaufen", ""),
    ("gesa", Date.valueOf("2024-02-03"), Date.valueOf("2024-02-04"),
      "Müller & Söhne GmbH", "Überweisung", null,
      100.0, 2000.0, null, "manuell::ok"))
    .toDF("account", "book_date", "valuta_date", "party", "book_text",
      "purpose", "amount", "balance", "category", "category_manual")

  test("yaml round-trip: records list, ISO dates, index dropped, unicode") {
    val yml = YamlStore.toYaml(sample)
    // dump shape: records list with legacy index first, dates as strings
    assert(yml.contains("index: 0"))
    assert(yml.contains("book_date: '2024-01-02'"))
    assert(yml.contains("Müller & Söhne GmbH")) // unicode not escaped
    val back = YamlStore.fromYaml(spark, yml)
    assert(!back.columns.contains("index"))
    assert(back.schema("book_date").dataType.typeName === "date")
    val rows = back.orderBy("book_date").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Date]("book_date") === Date.valueOf("2024-01-02"))
    assert(rows(0).getAs[Double]("amount") === -54.32)
    assert(rows(1).getAs[String]("party") === "Müller & Söhne GmbH")
    assert(rows(1).getAs[String]("purpose") === null)
  }

  test("toYaml backfills category_manual with empty string when absent") {
    val yml = YamlStore.toYaml(sample.drop("category_manual"))
    assert(yml.contains("category_manual: ''"))
  }

  test("fromYaml accepts the legacy fixture shape (quoted dates, index)") {
    val legacy =
      """- index: 0
        |  account: giro
        |  book_date: '2024-01-02'
        |  valuta_date: '2024-01-02'
        |  party: REWE MARKT GMBH
        |  book_text: Lastschrift
        |  purpose: REWE SAGT DANK 123456
        |  amount: -54.32
        |  balance: 1234.56
        |  category: einkaufen
        |  category_manual: ''
        |""".stripMargin
    val df = YamlStore.fromYaml(spark, legacy)
    val r = df.collect().head
    assert(r.getAs[Date]("book_date") === Date.valueOf("2024-01-02"))
    assert(r.getAs[Double]("amount") === -54.32)
    assert(r.getAs[String]("category_manual") === "")
  }

  test("fromYaml parses UNQUOTED PyYAML dates as the civil UTC date") {
    // reference migrate.py dumps quote dates, but hand-edited/legacy YAML
    // may not; snakeyaml parses these as java.util.Date at UTC midnight,
    // which must not shift a day in UTC-negative JVM timezones
    val legacy =
      """- index: 0
        |  account: giro
        |  book_date: 2024-01-02
        |  valuta_date: 2024-01-02
        |  party: X
        |  book_text: b
        |  purpose: p
        |  amount: -1.0
        |  balance: 0.0
        |""".stripMargin
    val r = YamlStore.fromYaml(spark, legacy).collect().head
    assert(r.getAs[Date]("book_date") === Date.valueOf("2024-01-02"))
  }

  test("load of a missing file yields an empty frame") {
    assert(YamlStore.load(spark, "/tmp/does-not-exist.yml").isEmpty)
  }

  test("migrate: yaml → store upsert with ✓ row-count verification") {
    val dir = Files.createTempDirectory("yamlmig")
    val yamlPath = dir.resolve("pandacount.yml").toString
    val storePath = dir.resolve("tx.parquet").toString
    // legacy yaml without the category columns → migration backfills NULL
    YamlStore.save(sample.drop("category", "category_manual"), yamlPath)
    assert(YamlStore.migrate(spark, yamlPath, storePath))
    val store = Store.load(spark, storePath)
    assert(store.count() === 2)
    assert(store.select("transfer_category").as[String].collect()
      .forall(_ == null))
    // ids assigned in canonical order starting at 1
    val raw = spark.read.parquet(storePath)
    assert(raw.orderBy("transaction_id").select("account").as[String]
      .collect() === Array("giro", "gesa"))
    // re-running the migration is idempotent (fingerprint conflicts update,
    // never duplicate) and still verifies ✓
    assert(YamlStore.migrate(spark, yamlPath, storePath))
    assert(spark.read.parquet(storePath).count() === 2)
  }
}
