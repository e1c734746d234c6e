package graft.finance

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Self-contained HTML report sink — the downstream artifact the reference
  * pipeline feeds (/root/reference/reports/finanzberatung-report.html, a
  * sectioned document of numbered headings + right-aligned numeric tables
  * with a bold total row, built from panda_analysis.py's queries).
  *
  * Same structure, original markup: numbered sections each holding one
  * table; the three tables are the year's income overview
  * ([[Analysis.incomeOverview]]), the account-pivoted expense overview
  * ([[Analysis.expenseOverview]]) and the home-office deduction
  * ([[Analysis.homeOfficeReport]], panda_analysis.py:386-450). Amounts are
  * German-formatted ("1.234,56"), values HTML-escaped, no external assets —
  * one file a tax advisor can open offline.
  *
  * The queries stay distributed until the final collect of each (tiny,
  * bounded: #categories / #positions rows) result table — the report cost
  * is the queries, not the rendering.
  */
object Report {

  private val css =
    """body{font-family:sans-serif;margin:0;background:#f4f5f7;color:#222}
      |main{max-width:860px;margin:0 auto;padding:32px 20px}
      |h1{font-size:26px;margin-bottom:2px}
      |p.when{color:#667;font-size:13px;margin-top:0}
      |section{background:#fff;border:1px solid #dde;border-radius:10px;
      |padding:18px 22px;margin:18px 0}
      |h2{font-size:18px;margin:0 0 10px}
      |h2 em.no{font-style:normal;color:#364;background:#e7f0ea;
      |border-radius:6px;padding:1px 8px;margin-right:8px;font-size:14px}
      |table{width:100%;border-collapse:collapse;font-size:14px}
      |th,td{padding:7px 9px;border-bottom:1px solid #e5e8ee;text-align:left}
      |th{color:#667;font-size:12px;text-transform:uppercase}
      |td.num,th.num{text-align:right;font-variant-numeric:tabular-nums}
      |tr.total td{font-weight:bold;border-top:2px solid #222;border-bottom:0}
      |""".stripMargin

  private[finance] def esc(s: String): String =
    Option(s).getOrElse("").replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")

  /** German amount format, deterministic: "-1.234,56". */
  private[finance] def eur(v: Double): String = {
    val nf = java.text.NumberFormat.getNumberInstance(java.util.Locale.GERMANY)
    nf.setMinimumFractionDigits(2)
    nf.setMaximumFractionDigits(2)
    nf.setGroupingUsed(true)
    nf.format(v)
  }

  /** Render one table: (header, isNumeric) columns + string/double rows;
    * rows whose first cell equals `totalLabel` get the bold total style.
    */
  private def table(cols: Seq[(String, Boolean)], rows: Seq[Seq[Any]],
      totalLabel: String = "Overall Sum"): String = {
    val head = cols.map { case (h, num) =>
      s"""<th${if (num) " class=\"num\"" else ""}>${esc(h)}</th>""" }
      .mkString
    val body = rows.map { r =>
      val cls = if (r.headOption.contains(totalLabel)) " class=\"total\"" else ""
      val cells = r.zip(cols).map {
        case (v: Double, (_, _)) => s"""<td class="num">${eur(v)}</td>"""
        case (null, _)           => "<td></td>"
        case (v, _)              => s"<td>${esc(v.toString)}</td>"
      }.mkString
      s"<tr$cls>$cells</tr>"
    }.mkString("\n")
    s"<table><thead><tr>$head</tr></thead>\n<tbody>\n$body\n</tbody></table>"
  }

  private def section(no: Int, title: String, html: String): String =
    s"""<section><h2><em class="no">$no</em>${esc(title)}</h2>\n$html\n</section>"""

  /** Categories alphabetical, the 'Overall Sum' row last — imposed on the
    * COLLECTED rows, not inherited from the plan: Spark does not guarantee
    * that `orderBy(...).unionByName(total)` order survives collect-time
    * partition concatenation across plan changes (AQE, partition count), and
    * the report is byte-golden-tested.
    */
  private def stableRows(rows: Array[Seq[Any]]): Seq[Seq[Any]] = {
    val (total, cats) = rows.partition(_.headOption.contains("Overall Sum"))
    (cats.sortBy(_.head.asInstanceOf[String]) ++ total).toSeq
  }

  /** Build the full report document for a year. `pc` is the categorized
    * store frame (post-[[Categorizer.addCat]]).
    */
  /** The report sink's COLLECT CONTRACT, enforced: each collected frame
    * is a per-category / per-position AGGREGATE — row count bounded by
    * the category vocabulary (~dozens), never by data volume. A future
    * schema change that accidentally turns one of these into a
    * row-level frame would otherwise become a silent driver-side
    * data-volume collect; fail loudly instead. */
  private def boundedCollect(df: DataFrame,
      what: String): Array[org.apache.spark.sql.Row] = {
    val rows = df.collect()
    require(rows.length <= 1000,
      s"report sink: $what collected ${rows.length} rows — this frame " +
        "must stay a category-level aggregate (bounded by the category " +
        "vocabulary), not a row-level collect")
    rows
  }

  def render(pc: DataFrame, yr: Int,
      afaCosts: Seq[(String, Double)], afaYears: Int,
      officeRatio: Double): String = {
    val income = stableRows(boundedCollect(
      Analysis.incomeOverview(pc, yr), "income overview")
      .map(r => Seq[Any](r.getAs[String]("cat"),
        r.getAs[Double]("category_sum"))))
    val expense = stableRows(boundedCollect(
      Analysis.expenseOverview(pc, yr), "expense overview")
      .map(r => Seq[Any](r.getAs[String]("cat"),
        r.getAs[Double]("category_sum"), r.getAs[Double]("giro"),
        r.getAs[Double]("gesa"), r.getAs[Double]("common"))))
    // Office positions in presentation order: AfA entries as given, then the
    // fixed running-cost positions (Analysis.homeOfficeReport's union order,
    // re-imposed driver-side for the same order-stability reason).
    val officeOrder = (afaCosts.map(_._1) ++
      Seq("Darlehenszinsen", "Stromkosten", "Hausgeld", "Grundsteuer"))
      .zipWithIndex.toMap
    val office = boundedCollect(
      Analysis.homeOfficeReport(pc, yr, afaCosts, afaYears,
        officeRatio), "home-office report")
      .map(r => Seq[Any](r.getAs[String]("position"),
        r.getAs[Double]("gesamtkosten"), r.getAs[Double]("raumkosten")))
      .sortBy(r => officeOrder.getOrElse(r.head.asInstanceOf[String], Int.MaxValue))
    val officeTotal = Seq[Any]("Overall Sum",
      office.map(_(1).asInstanceOf[Double]).sum,
      office.map(_(2).asInstanceOf[Double]).sum)

    s"""<!DOCTYPE html>
       |<html lang="de">
       |<head>
       |<meta charset="utf-8">
       |<title>Finanzübersicht $yr</title>
       |<style>
       |$css</style>
       |</head>
       |<body><main>
       |<header><h1>Finanzübersicht $yr</h1>
       |<p class="when">pandacount-spark · Berichtsjahr $yr</p></header>
       |${section(1, s"Einnahmen $yr", table(
            Seq("Kategorie" -> false, "Summe" -> true), income.toSeq))}
       |${section(2, s"Ausgaben $yr", table(
            Seq("Kategorie" -> false, "Summe" -> true, "giro" -> true,
              "gesa" -> true, "common" -> true), expense.toSeq))}
       |${section(3, s"Arbeitszimmer $yr (Anteil ${eur(officeRatio * 100)} %)",
          table(Seq("Position" -> false, "Gesamtkosten" -> true,
            "Raumkosten" -> true), office.toSeq :+ officeTotal))}
       |<footer><p class="when">Erzeugt aus dem Transaktions-Store ·
       |alle Beträge in EUR</p></footer>
       |</main></body>
       |</html>
       |""".stripMargin
  }

  /** Render and write the report file (UTF-8). */
  def write(pc: DataFrame, yr: Int, path: String,
      afaCosts: Seq[(String, Double)] = Seq("Wohnung (AfA)" -> 250000.0),
      afaYears: Int = 50, officeRatio: Double = 13.0 / 110.0): Unit =
    Files.writeString(Paths.get(path), render(pc, yr, afaCosts, afaYears,
      officeRatio))
}
