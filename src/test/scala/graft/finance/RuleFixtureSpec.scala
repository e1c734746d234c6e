package graft.finance

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Rule-extraction fidelity gate.
  *
  * The q38/q41 oracle (CascadeSql) is generated from the SAME
  * CategoryRuleTable the Spark side compiles, so it validates rule
  * COMPILATION (automaton vs CASE), not rule EXTRACTION. This spec closes
  * that loop: src/test/resources/reference_rules.tsv holds the (kind,
  * category, attribute, pattern, accountScope) tuples AST-extracted from
  * the reference's dict literals (/root/reference/panda.py:87-465 and
  * :531-537 via tools/extract_rules.py) as an independently-committed
  * artifact, and the Scala table must match it tuple-for-tuple IN ORDER —
  * order is semantics (last writer wins).
  */
class RuleFixtureSpec extends SparkSpec {
  import spark.implicits._

  private case class Fx(kind: String, category: String, attribute: String,
    pattern: String, scope: Option[String])

  private lazy val fixture: Seq[Fx] = {
    val raw = new String(Files.readAllBytes(
      Paths.get(getClass.getResource("/reference_rules.tsv").toURI)),
      StandardCharsets.UTF_8)
    raw.split("\n").toSeq.filter(_.nonEmpty).map { line =>
      // -1 keeps the trailing empty scope field
      val f = line.split("\t", -1)
      assert(f.length === 5, s"malformed fixture line: $line")
      Fx(f(0), f(1), f(2), f(3), if (f(4).isEmpty) None else Some(f(4)))
    }
  }

  test("fixture counts match the reference: 303 category + 5 transfer") {
    assert(fixture.count(_.kind == "category") === 303)
    assert(fixture.count(_.kind == "transfer") === 5)
  }

  test("CategoryRuleTable equals the fixture tuple-for-tuple, in order") {
    val fxCat = fixture.filter(_.kind == "category")
      .map(f => (f.category, f.attribute, f.pattern, f.scope))
    val scalaCat = CategoryRuleTable.categoryRules
      .map(r => (r.category, r.attribute, r.pattern, r.accountScope))
    assert(scalaCat === fxCat)
    val fxXfer = fixture.filter(_.kind == "transfer")
      .map(f => (f.category, f.attribute, f.pattern, f.scope))
    val scalaXfer = CategoryRuleTable.transferRules
      .map(r => (r.category, r.attribute, r.pattern, r.accountScope))
    assert(scalaXfer === fxXfer)
  }

  test("spot checks quoting the reference dict entries") {
    val cat = fixture.filter(_.kind == "category")
    // panda.py:88 — the very first rule pair
    assert(cat.head === Fx("category", "anwalt::centurion", "party",
      "zirngibl", None))
    // panda.py:464 — the very last rule
    assert(cat.last === Fx("category", "wohnen::wohngeld", "party",
      "WEG Holsteinische Strase 43 in 10717 Berlin", None))
    // panda.py:132 — the ONLY account-scoped rules: both gesa::amazon,
    // both scoped to the common account, in tuple order
    val scoped = cat.filter(_.scope.isDefined)
    assert(scoped === Seq(
      Fx("category", "gesa::amazon", "party", "AMAZON PAYMENTS EUROPE",
        Some("common")),
      Fx("category", "gesa::amazon", "party", "AMAZON EU S.A R.L.",
        Some("common"))))
    // panda.py:531-537 — transfer cascade order is semantics
    assert(fixture.filter(_.kind == "transfer").map(f =>
      (f.category, f.pattern)) === Seq(
      ("giro::gesa", "Ausgleich Steuerklasse"),
      ("giro::common", "Rate, Putzen, Naturstrom"),
      ("giro::common", "Ausgleich WEG"),
      ("giro::common", "Sparen Depot Paula"),
      ("giro::extra", "giro::extra")))
  }

  private def row(account: String, party: String, bookText: String,
      purpose: String, amount: Double) =
    (account, Date.valueOf("2024-01-01"), Date.valueOf("2024-01-01"),
      party, bookText, purpose, amount, 0.0)

  private def df(rows: (String, Date, Date, String, String, String, Double, Double)*) =
    rows.toDF("account", "book_date", "valuta_date", "party", "book_text",
      "purpose", "amount", "balance")

  test("special rules pin the reference predicates, not just substrings") {
    // panda.py:490-493 — Apple rule fires STRICTLY above -50: -49.99 is
    // media, exactly -50.00 falls through to the table (no rule → null)
    val apple = Categorizer.categorize(df(
      row("giro", "VISA APPLE.COM/BILL", "x", "x", -49.99),
      row("giro", "VISA APPLE.COM/BILL", "x", "x", -50.0)))
      .orderBy(desc("amount")).select("category").as[String].collect()
    assert(apple === Array("media", null))
    // panda.py:506-513 — the documented reason the Smartbroker special
    // rule exists: "the party might be andreas, so it could be overwritten
    // as internal". party "Andreas Profous" hits the LATE `intern` table
    // rule (fixture line 201) which overrides the EARLY dividende purpose
    // rule (line 32); only the post-loop special rule (giro ∧ Smartbroker
    // ∧ amount>0) rescues the credit — the debit stays intern
    val sb = Categorizer.categorize(df(
      row("giro", "Andreas Profous", "x", "Smartbroker Kauf", 10.0),
      row("giro", "Andreas Profous", "x", "Smartbroker Kauf", -10.0)))
      .orderBy(desc("amount")).select("category").as[String].collect()
    assert(sb === Array("einnahmen::dividende", "intern"))
  }

  test("transfer pre-rule has LOWEST precedence (panda.py:539 before loop)") {
    // an extra-account debit matches the pre-rule, but a purpose matching
    // the cascade overwrites it — the pre-rule runs BEFORE the loop
    val out = Categorizer.transferCategorize(df(
      row("extra", "p", "x", "unrelated", -5.0),
      row("extra", "p", "x", "Ausgleich Steuerklasse", -5.0)))
      .orderBy("purpose").select("transfer_category").as[String].collect()
    assert(out === Array("giro::gesa", "extra::giro"))
  }
}
