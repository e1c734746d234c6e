package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.finance.{CascadeSql, Categorizer, IngCsv, Store, TransactionSchema}
import graft.sources.Tables

/** Driver-gated queries over the FINANCE spine — the reference's actual
  * entry path (panda.py:753-767): CSV ingest → dedup → rule cascade →
  * fingerprint/cents store prep → merge-upsert. Round 1 covered these only
  * with ScalaTest specs; these entries put the whole path behind the DuckDB
  * hash-compare gate.
  *
  * Oracle strategy: q38 re-reads the committed ING fixture CSVs with
  * DuckDB's read_csv and re-states the full 308-rule cascade as generated
  * SQL ([[graft.finance.CascadeSql]]); q39/q41 synthesize deterministic
  * transaction-shaped inputs from the `orders` table with arithmetic that
  * is expressible identically in both engines.
  */
object FinanceQueries {

  /** Committed fixture files: (account, filename, preamble lines to skip). */
  val ingFixtures: Seq[(String, String, Int)] = Seq(
    ("giro", "Umsatzanzeige_DE69500105175402313946_20240110.csv", 5),
    ("gesa", "Umsatzanzeige_DE27500105175404412327_20240110.csv", 3),
    ("common", "Umsatzanzeige_DE97500105175409854125_20240110.csv", 4),
    ("extra", "Umsatzanzeige_DE18500105175525166237_20240110.csv", 3))

  val fixtureDir = "/root/repo/fixtures/ing"

  /** q38: the full import pipeline (S1-S4, R1-R6, U1-U2, F13-F14) over the
    * committed ING fixtures. sfDir is unused — the fixture is the input by
    * design (the CSV preamble/encoding path has no parquet equivalent).
    */
  def q38IngPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val paths = ingFixtures.map(f => s"$fixtureDir/${f._2}").mkString(",")
    val batch = IngCsv.read(spark, paths)
      .withColumn("transfer_category", lit(null).cast("string"))
      .withColumn("category", lit(null).cast("string"))
      .withColumn("category_manual", lit(null).cast("string"))
    val merged = Store.importBatch(batch.limit(0), batch)
    val categorized = Categorizer.pipeline(merged)
    Store.withStoreColumns(categorized)
      .select("account", "book_date", "valuta_date", "party", "book_text",
        "purpose", "amount_cents", "balance_cents", "transfer_category",
        "category", "fingerprint")
      .orderBy(Store.canonicalOrder: _*)
  }

  def q38Oracle: String = {
    val unions = ingFixtures.map { case (acct, file, skip) =>
      s"""SELECT '$acct' AS account, * FROM read_csv('$fixtureDir/$file',
          delim=';', skip=$skip, header=true, all_varchar=true)"""
    }.mkString("\n UNION ALL\n")
    s"""WITH raw AS ($unions),
       parsed AS (SELECT account,
         strptime(Buchung, '%d.%m.%Y')::DATE AS book_date,
         strptime(Wertstellungsdatum, '%d.%m.%Y')::DATE AS valuta_date,
         Auftraggeber AS party, Buchungstext AS book_text,
         Verwendungszweck AS purpose,
         CAST(replace(replace(Betrag, '.', ''), ',', '.') AS DOUBLE) AS amount,
         CAST(replace(replace(Saldo, '.', ''), ',', '.') AS DOUBLE) AS balance
        FROM raw),
       dedup AS (SELECT * EXCLUDE (rn) FROM (
         SELECT *, ROW_NUMBER() OVER (
           PARTITION BY account, book_date, valuta_date, party, book_text,
                        purpose, amount
           ORDER BY account) AS rn
         FROM parsed) WHERE rn = 1),
       cat AS (SELECT *,
         CAST(ROUND(amount * 100, 0) AS BIGINT) AS amount_cents,
         CAST(ROUND(balance * 100, 0) AS BIGINT) AS balance_cents,
         ${CascadeSql.transferCase} AS transfer_category,
         ${CascadeSql.categoryCase} AS category
        FROM dedup)
       SELECT account, book_date, valuta_date, party, book_text, purpose,
         amount_cents, balance_cents, transfer_category, category,
         ${CascadeSql.fingerprintSql} AS fingerprint
       FROM cat ORDER BY book_date, account, valuta_date, party, purpose"""
  }

  // ------------------------------------------------------------------ q39

  /** Deterministic transaction-shaped rows derived from `orders` (both
    * engines compute the identical expressions).
    */
  private def mergeBase(spark: SparkSession, sfDir: String): DataFrame = {
    val k = col("o_orderkey")
    Tables.orders(spark, sfDir)
      .filter(k < 3000)
      .select(
        k.as("k"),
        when(k % 4 === 0, "giro").when(k % 4 === 1, "gesa")
          .when(k % 4 === 2, "common").otherwise("extra").as("account"),
        to_date(col("o_orderdate")).as("book_date"),
        date_add(to_date(col("o_orderdate")), 1).as("valuta_date"),
        concat(lit("party-"), k).as("party"),
        lit("bt").as("book_text"),
        concat(lit("purpose-"), k).as("purpose"),
        (round(col("o_totalprice"), 2) - 200000).as("amount"),
        ((k % 100).cast("double") / 10.0).as("balance"))
  }

  private val mergeBaseSql =
    """SELECT o_orderkey AS k,
       CASE CAST(o_orderkey % 4 AS INTEGER)
         WHEN 0 THEN 'giro' WHEN 1 THEN 'gesa' WHEN 2 THEN 'common'
         ELSE 'extra' END AS account,
       CAST(o_orderdate AS DATE) AS book_date,
       CAST(o_orderdate AS DATE) + 1 AS valuta_date,
       'party-' || CAST(o_orderkey AS VARCHAR) AS party,
       'bt' AS book_text,
       'purpose-' || CAST(o_orderkey AS VARCHAR) AS purpose,
       ROUND(o_totalprice, 2) - 200000 AS amount,
       CAST(o_orderkey % 100 AS DOUBLE) / 10.0 AS balance
     FROM orders WHERE o_orderkey < 3000"""

  /** q39: the fingerprint merge-upsert (S5/J2): an existing store (every
    * k%3==0 row) merged with a re-import batch (k%3<2): matched rows keep
    * identity columns and take ONLY the 4 update columns; new rows get
    * MAX(id)+position ids in canonical order with burned candidates.
    */
  def q39UpsertMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val base = mergeBase(spark, sfDir)
    val k = col("k")
    val fp = Store.fingerprint(col("account"), col("book_date"),
      col("valuta_date"), col("party"), col("book_text"), col("purpose"),
      col("amount_cents"))
    val existing = base.filter(k % 3 === 0)
      .withColumn("amount_cents", Store.cents(col("amount")))
      .withColumn("balance_cents", Store.cents(col("balance")))
      .select(
        k.as("transaction_id"), col("account"), col("book_date"),
        col("valuta_date"), col("party"), col("book_text"), col("purpose"),
        col("amount_cents"), col("balance_cents"),
        lit(null).cast("string").as("transfer_category"),
        concat(lit("old::"), k % 5).as("category"),
        lit(null).cast("string").as("category_manual"),
        fp.as("fingerprint"),
        to_timestamp(lit("2024-01-01 00:00:00")).as("imported_at"))
    val batch = base.filter(k % 3 < 2)
      .withColumn("amount_cents", Store.cents(col("amount")))
      .withColumn("balance_cents", Store.cents(col("balance") + 1.0))
      .select(
        col("account"), col("book_date"), col("valuta_date"), col("party"),
        col("book_text"), col("purpose"), col("amount_cents"),
        col("balance_cents"),
        concat(lit("t::"), k % 2).as("transfer_category"),
        concat(lit("new::"), k % 7).as("category"),
        lit(null).cast("string").as("category_manual"),
        fp.as("fingerprint"),
        to_timestamp(lit("2025-01-01 00:00:00")).as("imported_at"))
    Store.upsert(existing, batch).orderBy("transaction_id")
  }

  def q39Oracle: String =
    s"""WITH base AS ($mergeBaseSql),
       basec AS (SELECT *,
         CAST(ROUND(amount * 100, 0) AS BIGINT) AS amount_cents
        FROM base),
       existing AS (SELECT k AS transaction_id, account, book_date,
         valuta_date, party, book_text, purpose, amount_cents,
         CAST(ROUND(balance * 100, 0) AS BIGINT) AS balance_cents,
         CAST(NULL AS VARCHAR) AS transfer_category,
         'old::' || CAST(k % 5 AS VARCHAR) AS category,
         CAST(NULL AS VARCHAR) AS category_manual,
         ${CascadeSql.fingerprintSql} AS fingerprint,
         TIMESTAMP '2024-01-01 00:00:00' AS imported_at
        FROM basec WHERE k % 3 = 0),
       batch AS (SELECT account, book_date, valuta_date, party, book_text,
         purpose, amount_cents,
         CAST(ROUND((balance + 1.0) * 100, 0) AS BIGINT) AS balance_cents,
         't::' || CAST(k % 2 AS VARCHAR) AS transfer_category,
         'new::' || CAST(k % 7 AS VARCHAR) AS category,
         CAST(NULL AS VARCHAR) AS category_manual,
         ${CascadeSql.fingerprintSql} AS fingerprint,
         TIMESTAMP '2025-01-01 00:00:00' AS imported_at
        FROM basec WHERE k % 3 < 2),
       cand AS (SELECT b.*,
         (SELECT COALESCE(MAX(transaction_id), 0) FROM existing) +
           ROW_NUMBER() OVER (ORDER BY book_date, account, valuta_date,
                              party, purpose) AS cand_id
        FROM batch b)
       SELECT
         COALESCE(e.transaction_id, c.cand_id) AS transaction_id,
         COALESCE(e.account, c.account) AS account,
         COALESCE(e.book_date, c.book_date) AS book_date,
         COALESCE(e.valuta_date, c.valuta_date) AS valuta_date,
         COALESCE(e.party, c.party) AS party,
         COALESCE(e.book_text, c.book_text) AS book_text,
         COALESCE(e.purpose, c.purpose) AS purpose,
         COALESCE(e.amount_cents, c.amount_cents) AS amount_cents,
         CASE WHEN c.fingerprint IS NOT NULL THEN c.balance_cents
              ELSE e.balance_cents END AS balance_cents,
         CASE WHEN c.fingerprint IS NOT NULL THEN c.transfer_category
              ELSE e.transfer_category END AS transfer_category,
         CASE WHEN c.fingerprint IS NOT NULL THEN c.category
              ELSE e.category END AS category,
         CASE WHEN c.fingerprint IS NOT NULL THEN c.category_manual
              ELSE e.category_manual END AS category_manual,
         COALESCE(e.fingerprint, c.fingerprint) AS fingerprint,
         COALESCE(e.imported_at, c.imported_at) AS imported_at
       FROM existing e FULL OUTER JOIN cand c
         ON e.fingerprint = c.fingerprint
       ORDER BY transaction_id"""

  // ------------------------------------------------------------------ q41

  /** Deterministic text pools hitting a representative rule mix: table
    * rules on party/purpose, the account-scoped amazon rule, all five
    * special rules, overlapping last-writer-wins patterns, transfers, and
    * NULL attributes. Shared by the Spark side and the SQL generator.
    */
  private val parties: Seq[String] = Seq(
    "REWE MARKT GMBH", "VISA APPLE.COM/BILL", "Kreuzwerker",
    "Finanzamt Charlottenburg", "AMAZON PAYMENTS EUROPE S.C.A.",
    "bargeldauszahlung GA 123", "Edeka Zirngibl Center",
    "ANDREAS EDMOND PROFOUS", "ELIXIA Berlin", null)
  private val purposes: Seq[String] = Seq(
    "REWE SAGT DANK 443322", "Ausgleich Steuerklasse",
    "Dividende Smartbroker", "ING Bargeld Ausz 01.02",
    "Rate, Putzen, Naturstrom", "Uebertrag giro::extra", null)
  private val bookTexts: Seq[String] = Seq(
    "Lastschrift", "Gehalt/Rente", "Gutschrift", "Ueberweisung", null)
  private val accounts: Seq[String] = Seq("giro", "gesa", "common", "extra")

  private def pick(k: Column, pool: Seq[String]): Column =
    pool.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (null, _)) => acc
      case (acc, (v, i)) => when(k % pool.size === i, v).otherwise(acc)
    }

  private def pickSql(expr: String, pool: Seq[String]): String =
    pool.zipWithIndex.collect { case (v, i) if v != null =>
      s"WHEN $i THEN '${v.replace("'", "''")}'"
    }.mkString(s"CASE CAST($expr % ${pool.size} AS INTEGER) ", " ",
      " ELSE NULL END")

  /** q41: the FULL 308-rule cascade (303 table + 5 special rules, the real
    * CategoryRuleTable — q17 gates a 5-rule toy) + transfer cascade over an
    * orders-derived synthetic transactions table at the bench scale factor.
    * This is both the cascade's correctness gate and its bench entry.
    */
  def q41RuleCascadeFull(spark: SparkSession, sfDir: String): DataFrame = {
    val k = col("o_orderkey")
    val synth = Tables.orders(spark, sfDir).select(
      when(k % 4 === 0, accounts(0)).when(k % 4 === 1, accounts(1))
        .when(k % 4 === 2, accounts(2)).otherwise(accounts(3)).as("account"),
      pick(k, parties).as("party"),
      pick(k, bookTexts).as("book_text"),
      pick(k, purposes).as("purpose"),
      (round(col("o_totalprice"), 2) - 200000).as("amount"))
    Categorizer.pipeline(synth)
      .groupBy(
        coalesce(col("category"), lit("(none)")).as("category"),
        coalesce(col("transfer_category"), lit("(none)"))
          .as("transfer_category"))
      .agg(count(lit(1)).as("n"),
        sum(Store.cents(col("amount"))).as("sum_cents"))
      .orderBy("category", "transfer_category")
  }

  def q41Oracle: String =
    s"""WITH synth AS (SELECT
         CASE CAST(o_orderkey % 4 AS INTEGER)
           WHEN 0 THEN 'giro' WHEN 1 THEN 'gesa' WHEN 2 THEN 'common'
           ELSE 'extra' END AS account,
         ${pickSql("o_orderkey", parties)} AS party,
         ${pickSql("o_orderkey", bookTexts)} AS book_text,
         ${pickSql("o_orderkey", purposes)} AS purpose,
         ROUND(o_totalprice, 2) - 200000 AS amount
        FROM orders),
       cat AS (SELECT *,
         ${CascadeSql.transferCase} AS transfer_category,
         ${CascadeSql.categoryCase} AS category
        FROM synth)
       SELECT COALESCE(category, '(none)') AS category,
         COALESCE(transfer_category, '(none)') AS transfer_category,
         COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(amount * 100, 0) AS BIGINT)) AS BIGINT)
           AS sum_cents
       FROM cat GROUP BY 1, 2 ORDER BY 1, 2"""
}
