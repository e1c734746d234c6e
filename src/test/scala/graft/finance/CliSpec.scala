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

  test("HTML report render matches the committed golden file") {
    import java.sql.Date
    // deterministic categorized frame (post-addCat shape) covering income,
    // account-pivoted expenses, an uncategorized row, HTML-escaping in a
    // category name, and every home-office signal (Naturstrom, Wohngeld,
    // Grundst, Darl.-Leistung Zinsen extract)
    val pc = Seq(
      ("giro", Date.valueOf("2024-01-15"), "Arbeitgeber GmbH", "Gehalt",
        "Gehalt Januar", 3500.0, "einnahmen::gehalt::andreas"),
      ("gesa", Date.valueOf("2024-02-15"), "Uni", "Gehalt/Rente",
        "Gehalt Februar", 2800.5, "einnahmen::gehalt::gesa"),
      ("giro", Date.valueOf("2024-03-01"), "REWE", "Lastschrift",
        "Einkauf", -54.32, "einkaufen"),
      ("giro", Date.valueOf("2024-03-02"), "Laden", "Lastschrift",
        "Spezial", -10.0, "sonder & <besonders>"),
      ("common", Date.valueOf("2024-03-05"), "Naturstrom AG", "Lastschrift",
        "Strom Abschlag", -89.0, "wohnen::strom"),
      ("common", Date.valueOf("2024-04-01"), "WEG Verwaltung", "Dauerauftrag",
        "Wohngeld April", -320.0, "wohnen::wohngeld"),
      ("common", Date.valueOf("2024-05-10"), "Finanzamt", "Lastschrift",
        "Grundsteuer Q2 Grundst.", -150.0, "wohnen"),
      ("common", Date.valueOf("2024-06-01"), "Bank", "Rate",
        "Darl.-Leistung Tilgung 898,22 Zinsen 140,12", -1038.34,
        "wohnen::rate"),
      ("gesa", Date.valueOf("2024-07-01"), "Bäckerei", "Lastschrift",
        "Brot", -12.5, "einkaufen"),
      ("giro", Date.valueOf("2024-08-01"), "Unbekannt", "Lastschrift",
        "offen", -5.0, null.asInstanceOf[String]))
      .toDF("account", "book_date", "party", "book_text", "purpose",
        "amount", "cat")
      .withColumn("transfer_category", lit(null).cast("string"))
      .withColumn("valuta_date", col("book_date"))
      .withColumn("balance", lit(0.0))
    val html = Report.render(pc, 2024,
      afaCosts = Seq("Wohnung (AfA)" -> 250000.0), afaYears = 50,
      officeRatio = 13.0 / 110.0)
    // content sanity independent of the snapshot
    assert(html.contains("sonder &amp; &lt;besonders&gt;")) // escaped
    assert(html.contains("<tr class=\"total\">"))           // total rows
    assert(html.contains("3.500,00"))                       // German format
    assert(html.contains("140,12"))                         // Zinsen extract
    val goldenPath = java.nio.file.Paths.get(
      "src/test/resources/golden_report.html")
    if (sys.env.contains("REGENERATE_GOLDEN")) // dev hook: refresh snapshot
      Files.writeString(goldenPath, html)
    val golden = Files.readString(goldenPath)
    assert(html === golden)
    // Formatters must pin their locale EXPLICITLY — the golden cannot
    // depend on the JVM default (round-5 VERDICT #8): re-render under two
    // different default locales (US: 1,234.56; FR: spaces + comma) and
    // require byte-identity. local[4] shares the JVM, so setDefault
    // reaches the executor threads too.
    val dflt = java.util.Locale.getDefault
    try {
      for (l <- Seq(java.util.Locale.US, java.util.Locale.FRANCE)) {
        java.util.Locale.setDefault(l)
        val again = Report.render(pc, 2024,
          afaCosts = Seq("Wohnung (AfA)" -> 250000.0), afaYears = 50,
          officeRatio = 13.0 / 110.0)
        assert(again === golden, s"report drifted under default locale $l")
      }
    } finally java.util.Locale.setDefault(dflt)
  }

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
