package graft.finance

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class CategorizerSpec extends SparkSpec {
  import spark.implicits._

  private def tx(
      account: String = "giro", party: String = null, bookText: String = null,
      purpose: String = null, amount: Double = -10.0,
      categoryManual: String = null): (String, Date, Date, String, String, String, Double, Double, String) =
    (account, Date.valueOf("2024-06-01"), Date.valueOf("2024-06-01"),
      party, bookText, purpose, amount, 0.0, categoryManual)

  private def df(rows: Seq[(String, Date, Date, String, String, String, Double, Double, String)]): DataFrame =
    rows.toDF("account", "book_date", "valuta_date", "party", "book_text",
      "purpose", "amount", "balance", "category_manual")

  private def catOf(d: DataFrame): Seq[String] =
    Categorizer.pipeline(d).select("category").as[String].collect().toSeq

  test("case-insensitive literal substring match, null-safe") {
    val out = catOf(df(Seq(
      tx(party = "REWE MARKT GMBH Berlin"),   // einkaufen (rule: "REWE MARKT")
      tx(party = "rewe markt gmbh"),          // case-insensitive
      tx(party = null))))                     // null never matches, never errors
    assert(out === Seq("einkaufen", "einkaufen", null))
  }

  test("last-writer-wins precedence across overlapping rules") {
    // 'zirngibl' (first rule in the table, anwalt::centurion) vs a later
    // einkaufen rule: if party matches both, the LATER rule must win.
    val d = df(Seq(tx(party = "zirngibl edeka")))
    assert(catOf(d) === Seq("einkaufen"))
  }

  test("account-scoped rule applies only on its account") {
    // (amazon, gesa) → gesa::amazon, but only on account 'gesa'
    // (reference panda.py:131-133,478-489).
    val rule = CategoryRuleTable.categoryRules
      .find(_.accountScope.isDefined).get
    val hit  = tx(account = rule.accountScope.get,
      party = if (rule.attribute == "party") rule.pattern else null,
      purpose = if (rule.attribute == "purpose") rule.pattern else null)
    val miss = tx(account = "giro",
      party = if (rule.attribute == "party") rule.pattern else null,
      purpose = if (rule.attribute == "purpose") rule.pattern else null)
    val out = catOf(df(Seq(hit, miss)))
    assert(out.head === rule.category)
    assert(out(1) !== rule.category)
  }

  test("Apple special rule honors the amount > -50 boundary") {
    val out = catOf(df(Seq(
      tx(party = "VISA APPLE.COM/BILL", amount = -49.99), // matches → media
      tx(party = "VISA APPLE.COM/BILL", amount = -50.0), // boundary: NOT matched
      tx(party = "VISA APPLE.COM/BILL", amount = -120.0))))
    assert(out(0) === "media")
    assert(out(1) !== "media")
    assert(out(2) !== "media")
  }

  test("special rules outrank the rule table") {
    // Finanzamt Charlottenburg + book_text Gutschrift → steuererstattung,
    // even though the table maps Finanzamt to a steuer category.
    val out = catOf(df(Seq(
      tx(party = "Finanzamt Charlottenburg", bookText = "Gutschrift"))))
    assert(out === Seq("einnahmen::steuererstattung"))
  }

  test("transfer pre-rule (extra, amount<0) has lowest precedence") {
    val d = df(Seq(
      tx(account = "extra", amount = -5.0),                       // pre-rule only
      tx(account = "extra", amount = -5.0,
        purpose = "Ausgleich Steuerklasse Juni")))                // cascade overrides
    val out = Categorizer.pipeline(d)
      .select("transfer_category").as[String].collect().toSeq
    assert(out.head === "extra::giro")
    assert(out(1) === "giro::gesa")
  }

  test("addCat: whitespace-only category_manual is NULL, manual wins otherwise") {
    val d = Categorizer.pipeline(df(Seq(
      tx(party = "edeka", categoryManual = "   "),
      tx(party = "edeka", categoryManual = "override::x"),
      tx(party = "edeka"))))
    val out = Categorizer.addCat(d).select("cat").as[String].collect().toSeq
    assert(out === Seq("einkaufen", "override::x", "einkaufen"))
  }

  test("no rule match leaves pre-existing category intact (incremental recat)") {
    val base = df(Seq(tx(party = "no match here")))
      .withColumn("category", lit("preexisting"))
    val out = Categorizer.categorize(base)
      .select("category").as[String].collect().toSeq
    assert(out === Seq("preexisting"))
  }

  test("automaton categorize equals the naive CaseWhen compilation") {
    // adversarial corpus: every rule pattern embedded in noise (as party,
    // purpose and book_text), every account, overlapping pattern pairs,
    // NULLs, and amounts either side of the Apple -50 boundary
    val rules = CategoryRuleTable.categoryRules
    val rows = rules.zipWithIndex.flatMap { case (r, i) =>
      val acct = Seq("giro", "gesa", "common", "extra")(i % 4)
      val amt = if (i % 2 == 0) -10.0 else -100.0
      Seq(
        tx(account = acct, party = s"xx ${r.pattern} yy", amount = amt),
        tx(account = acct, purpose = s"A ${r.pattern.toUpperCase} B", amount = amt),
        tx(account = acct, bookText = r.pattern, amount = amt))
    } ++ Seq(
      tx(party = null, purpose = null, bookText = null),
      tx(party = "VISA APPLE.COM/BILL", amount = -49.0),
      tx(party = "VISA APPLE.COM/BILL", amount = -51.0),
      tx(account = "gesa", bookText = "Gehalt/Rente"),
      tx(party = "edeka zirngibl"))
    val d = df(rows)
    val fast = Categorizer.categorize(d).select("category").as[String].collect().toSeq
    val naive = Categorizer.categorizeCaseWhen(d).select("category").as[String].collect().toSeq
    assert(fast === naive)
  }

  test("rule table shape matches the reference inventory") {
    assert(CategoryRuleTable.categoryRules.length === 303)
    assert(CategoryRuleTable.categoryRules.count(_.accountScope.isDefined) === 2)
    assert(CategoryRuleTable.transferRules.length === 5)
  }
}
