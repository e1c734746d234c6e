package graft.finance

import java.sql.Date

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class AnalysisSpec extends SparkSpec {
  import spark.implicits._

  // pc layout: account, book_date, party, purpose, transfer_category, amount, cat
  private def pc(rows: (String, String, String, String, String, Double, String)*): DataFrame =
    rows.map { case (a, d, p, u, t, m, c) =>
      (a, Date.valueOf(d), Date.valueOf(d), p, null: String, u, t, m, 0.0, c)
    }.toDF("account", "book_date", "valuta_date", "party", "book_text",
      "purpose", "transfer_category", "amount", "balance", "cat")

  private val base = pc(
    ("giro", "2024-03-01", "Kreuzwerker", null, null, 4000.0, "einnahmen::gehalt::andreas"),
    ("gesa", "2024-03-05", "Arbeitgeber", null, null, 2000.0, "einnahmen::gehalt::gesa"),
    ("giro", "2024-04-01", "Broker", "Smartbroker Dividende", null, 55.5, "einnahmen::dividende"),
    ("giro", "2024-04-02", "REWE", null, null, -80.0, "einkaufen"),
    ("common", "2024-04-03", "INES BORNEMANN", null, null, -120.0, "wohnen::putzen"),
    ("giro", "2024-04-04", "Mystery GmbH", null, null, -30.0, null),
    ("extra", "2024-04-05", "X", null, "extra::giro", -500.0, null),
    ("giro", "2023-04-02", "REWE", null, null, -70.0, "einkaufen"),
    ("common", "2024-05-01", "Bank", "Rechnung Darl.-Leistung 607 Tilgung 898,22 Zinsen 140,12", null, -1038.34, "wohnen::rate"),
    ("common", "2024-06-01", "Bank", "Rechnung Darl.-Leistung 607 Tilgung 900,00 Zinsen 1.138,40", null, -2038.40, "wohnen::rate"))

  test("uncategorized: year + main accounts + transfer-null + cat-null, sorted") {
    val out = Analysis.uncategorized(base, 2024).collect()
    assert(out.map(_.getAs[String]("party")).toSeq === Seq("Mystery GmbH"))
  }

  test("income overview sums by category with Overall Sum row") {
    val out = Analysis.incomeOverview(base, 2024)
      .as[(String, Double)].collect().toSeq
    assert(out.contains(("einnahmen::gehalt::andreas", 4000.0)))
    assert(out.contains(("einnahmen::dividende", 55.5)))
    assert(out.last === (("Overall Sum", 6055.5)))
  }

  test("expense overview pivots by account with totals") {
    val out = Analysis.expenseOverview(base, 2024).collect()
    val byCat = out.map(r => r.getAs[String]("cat") -> r).toMap
    assert(byCat("einkaufen").getAs[Double]("giro") === -80.0)
    assert(byCat("einkaufen").getAs[Double]("common") === 0.0)
    assert(byCat("Uncategorized").getAs[Double]("category_sum") === -30.0)
    val overall = byCat("Overall Sum")
    // expenses exclude einnahmen/intern cats, transfers, non-main accounts:
    // -80 - 120 - 30 - 1038.34 - 2038.40
    assert(math.abs(overall.getAs[Double]("category_sum") - (-3306.74)) < 1e-9)
  }

  test("loan interest: regex-extract German amounts from purpose, summed") {
    val out = Analysis.loanInterest(base, 2024).as[Double].head()
    assert(math.abs(out - (140.12 + 1138.40)) < 1e-9)
  }

  test("home-office report: AfA rows + running costs, area-scaled") {
    val report = Analysis.homeOfficeReport(base, 2024,
      afaCosts = Seq("Kaufsumme" -> 575000.0), afaYears = 50,
      officeRatio = 13.0 / 110.0)
    val rows = report.collect().map(r =>
      r.getAs[String]("position") -> r.getAs[Double]("raumkosten")).toMap
    assert(math.abs(rows("Kaufsumme") - 575000.0 / 50 * 13 / 110) < 1e-9)
    assert(math.abs(rows("Darlehenszinsen") - 1278.52 * 13 / 110) < 1e-6)
  }
}
