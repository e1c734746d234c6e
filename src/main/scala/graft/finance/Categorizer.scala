package graft.finance

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The categorization engine: the reference's ~310 sequential full-column
  * rule passes (/root/reference/panda.py:85-549) compiled into ONE
  * projection per output column.
  *
  * Compilation scheme: fold the ordered rule list so each later rule WRAPS
  * the chain built so far — at eval time later rules are tested first, which
  * is exactly the reference's last-writer-wins overwrite semantics, in a
  * single pass over the data instead of O(rules) passes. Rows matched by no
  * rule keep their pre-existing column value (the reference's `.loc` writes
  * only touch matched rows), which is what makes re-categorization after a
  * rule-table change incremental.
  *
  * Everything is Catalyst builtins (Contains/Lower/CaseWhen) → whole-stage
  * codegen'd, embarrassingly parallel, zero shuffles.
  */
object Categorizer {

  /** Null-safe case-insensitive literal containment — the reference's
    * `fillna("").str.lower().str.contains(pat.lower(), regex=False)`.
    */
  private[finance] def containsCi(attr: Column, pattern: String): Column =
    lower(coalesce(attr, lit(""))).contains(pattern.toLowerCase)

  private def ruleCondition(r: SubstringRule): Column = {
    val base = containsCi(col(r.attribute), r.pattern)
    r.accountScope.fold(base)(a => base && col("account") === a)
  }

  /** Compile an ordered last-writer-wins cascade into ONE flat CaseWhen.
    *
    * Branches are emitted in REVERSE rule order: CaseWhen takes the first
    * matching branch, and first-match-over-reversed-order is exactly the
    * reference's last-writer-wins overwrite semantics. A flat CaseWhen (one
    * node, ~310 branches) instead of ~310 nested nodes keeps the expression
    * tree shallow — nesting overflows the analyzer stack and defeats
    * Catalyst's CaseWhen simplification.
    */
  private[finance] def compileChain(branches: Seq[(Column, String)], base: Column): Column =
    branches.reverse match {
      case Nil => base
      case (c0, v0) +: rest =>
        rest.foldLeft(when(c0, v0)) { case (acc, (c, v)) => acc.when(c, v) }
          .otherwise(base)
    }

  private[finance] def compileCascade(rules: Seq[SubstringRule], base: Column): Column =
    compileChain(rules.map(r => ruleCondition(r) -> r.category), base)

  private def existingOrNull(df: DataFrame, name: String): Column =
    if (df.columns.contains(name)) col(name) else lit(null).cast("string")

  /** The five post-loop special rules (panda.py:490-523), highest precedence,
    * in reference order (later entries override earlier ones).
    */
  private[finance] val specialRules: Seq[(DataFrame => Column, String)] = Seq(
    ((_: DataFrame) => containsCi(col("party"), "VISA APPLE.COM/BILL") &&
      col("amount") > -50) -> "media",
    ((_: DataFrame) => col("account") === "gesa" &&
      col("book_text") === "Gehalt/Rente") -> "einnahmen::gehalt::gesa",
    ((_: DataFrame) => col("account") === "giro" &&
      (col("party") === "Kreuzwerker" || col("party") === "ANDREAS EDMOND PROFOUS")) ->
      "einnahmen::gehalt::andreas",
    ((_: DataFrame) => col("account") === "giro" &&
      containsCi(col("purpose"), "Smartbroker") && col("amount") > 0) ->
      "einnahmen::dividende",
    ((_: DataFrame) => containsCi(col("party"), "Finanzamt Charlottenburg") &&
      col("book_text") === "Gutschrift") -> "einnahmen::steuererstattung")

  /** Set `category` from the 303-rule table + 5 special rules
    * (panda.py:85-525).
    *
    * The table rules compile to Aho–Corasick automata
    * ([[graft.functions.TextExprs.MultiContainsMax]]) — one per
    * (attribute, accountScope) group, each walking its text ONCE and
    * returning the highest-matching GLOBAL rule index; `greatest` across
    * groups + an index→category array lookup reproduces last-writer-wins
    * exactly (last writer == max rule index). The flat 308-branch CaseWhen
    * this replaces re-scanned each attribute per rule — O(rules×len) vs
    * O(len); 3.6× on the full table at sf0.1, and the gap grows with the
    * rule count. [[categorizeCaseWhen]] keeps the naive compilation for
    * the parity spec. The 5 special rules (non-substring predicates) stay
    * an ordinary when-chain wrapped OUTSIDE the table lookup, preserving
    * their post-loop precedence.
    */
  def categorize(df: DataFrame): DataFrame = {
    val rules = CategoryRuleTable.categoryRules
    val groups = rules.zipWithIndex
      .groupBy { case (r, _) => (r.attribute, r.accountScope) }
    val groupIdx: Seq[Column] = groups.toSeq.map {
      case ((attr, scope), rs) =>
        val idx = graft.functions.TextExprs.multiContainsMax(
          lower(coalesce(col(attr), lit(""))),
          rs.map(_._1.pattern.toLowerCase), rs.map(_._2))
        scope.fold(idx)(a =>
          when(col("account") === a, idx).otherwise(lit(-1)))
    }
    val best = groupIdx.reduce((a, b) => greatest(a, b))
    val tableCat = when(best >= 0,
      element_at(lit(rules.map(_.category).toArray), best + 1))
      .otherwise(existingOrNull(df, "category"))
    val branches = specialRules.map { case (cond, cat) => cond(df) -> cat }
    df.withColumn("category", compileChain(branches, tableCat))
  }

  /** Naive CaseWhen compilation of the same cascade (reference shape for
    * the parity spec; semantics identical to [[categorize]]).
    */
  private[finance] def categorizeCaseWhen(df: DataFrame): DataFrame = {
    val branches =
      CategoryRuleTable.categoryRules.map(r => ruleCondition(r) -> r.category) ++
      specialRules.map { case (cond, cat) => cond(df) -> cat }
    df.withColumn("category",
      compileChain(branches, existingOrNull(df, "category")))
  }

  /** Set `transfer_category` (panda.py:528-549): the amount<0/extra pre-rule
    * has LOWEST precedence (it runs before the loop), then the 5-pattern
    * cascade.
    */
  def transferCategorize(df: DataFrame): DataFrame = {
    val preRule = when(col("amount") < 0 && col("account") === "extra", "extra::giro")
      .otherwise(existingOrNull(df, "transfer_category"))
    val chain = compileCascade(CategoryRuleTable.transferRules, preRule)
    df.withColumn("transfer_category", chain)
  }

  /** Finalize `cat` = COALESCE(category_manual, category) with
    * whitespace-only manual values normalized to NULL, dropping the inputs
    * (panda.py:552-558).
    */
  def addCat(df: DataFrame): DataFrame = {
    val manual = when(col("category_manual").rlike("^\\s*$"), lit(null).cast("string"))
      .otherwise(col("category_manual"))
    df.withColumn("cat", coalesce(manual, col("category")))
      .drop("category", "category_manual")
  }

  /** Full pipeline (panda.py:748-750): transfer first, then category. */
  def pipeline(df: DataFrame): DataFrame = categorize(transferCategorize(df))
}
