package graft.finance

/** DuckDB SQL renderings of the categorization cascade — the ORACLE side of
  * the driver's correctness gate for the finance spine (q38/q41).
  *
  * Generated from the same [[CategoryRuleTable]] the Spark-side
  * [[Categorizer]] compiles, with the same last-writer-wins scheme: branches
  * emitted in REVERSE rule order into one CASE (first match over reversed
  * order == last writer in reference order; the five post-loop special
  * rules sit outermost). Only the five special rules (panda.py:490-523) are
  * transcribed by hand — they are conditions over amount/account/book_text,
  * not table entries.
  */
object CascadeSql {

  private def esc(s: String): String = s.replace("'", "''")

  private def cond(r: SubstringRule): String = {
    val base =
      s"contains(lower(coalesce(${r.attribute}, '')), '${esc(r.pattern.toLowerCase)}')"
    r.accountScope.fold(base)(a => s"($base AND account = '${esc(a)}')")
  }

  private def caseOf(branches: Seq[(String, String)], elseSql: String): String =
    branches.reverse
      .map { case (c, v) => s"WHEN $c THEN '${esc(v)}'" }
      .mkString("CASE ", " ", s" ELSE $elseSql END")

  /** The five post-loop special rules in reference order (highest
    * precedence; mirrors Categorizer.specialRules).
    */
  private val specialRules: Seq[(String, String)] = Seq(
    "(contains(lower(coalesce(party, '')), 'visa apple.com/bill') AND amount > -50)" ->
      "media",
    "(account = 'gesa' AND book_text = 'Gehalt/Rente')" ->
      "einnahmen::gehalt::gesa",
    "(account = 'giro' AND (party = 'Kreuzwerker' OR party = 'ANDREAS EDMOND PROFOUS'))" ->
      "einnahmen::gehalt::andreas",
    "(account = 'giro' AND contains(lower(coalesce(purpose, '')), 'smartbroker') AND amount > 0)" ->
      "einnahmen::dividende",
    "(contains(lower(coalesce(party, '')), 'finanzamt charlottenburg') AND book_text = 'Gutschrift')" ->
      "einnahmen::steuererstattung")

  /** CASE expression for `category` (303 table rules + 5 special rules). */
  def categoryCase: String =
    caseOf(
      CategoryRuleTable.categoryRules.map(r => cond(r) -> r.category) ++
        specialRules,
      "NULL")

  /** CASE expression for `transfer_category`: the amount<0/extra pre-rule
    * has LOWEST precedence (the ELSE), then the 5-pattern cascade.
    */
  def transferCase: String =
    caseOf(
      CategoryRuleTable.transferRules.map(r => cond(r) -> r.category),
      "(CASE WHEN (amount < 0 AND account = 'extra') THEN 'extra::giro' END)")

  /** sha256 natural-key fingerprint over the store columns (F13 semantics:
    * NULL→"", amount NULL→"0", ISO dates, '|'-separated).
    */
  def fingerprintSql: String =
    """sha256(
       coalesce(account, '') || '|' ||
       coalesce(strftime(book_date, '%Y-%m-%d'), '') || '|' ||
       coalesce(strftime(valuta_date, '%Y-%m-%d'), '') || '|' ||
       coalesce(party, '') || '|' ||
       coalesce(book_text, '') || '|' ||
       coalesce(purpose, '') || '|' ||
       coalesce(CAST(amount_cents AS VARCHAR), '0'))"""
}
