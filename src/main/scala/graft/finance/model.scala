package graft.finance

import org.apache.spark.sql.types._

/** One ordered substring-match categorization rule.
  *
  * Semantics (reference: /root/reference/panda.py:467-489): case-insensitive
  * LITERAL substring test of `pattern` against the NULL→"" coalesced
  * `attribute` column; `accountScope` adds an `account == x` conjunct. Rules
  * are applied as an ordered cascade where the last matching rule wins.
  */
final case class SubstringRule(
    category: String,
    attribute: String,
    pattern: String,
    accountScope: Option[String])

/** Canonical transaction schemas + ingest constants.
  *
  * Mirrors the reference store DDL (/root/reference/panda.py:596-617) with
  * Spark types per SURVEY.md §1.2: money as exact integer cents (LongType),
  * never floats.
  */
object TransactionSchema {

  /** IBAN (embedded in ING CSV filenames) → logical account name
    * (/root/reference/panda.py:34-40).
    */
  val ibanAccountMap: Map[String, String] = Map(
    "DE97500105175409854125" -> "common",
    "DE69500105175402313946" -> "giro",
    "DE27500105175404412327" -> "gesa",
    "DE18500105175525166237" -> "extra",
    "DE28500105175544958810" -> "extra-common")

  /** Header-line prefix that ends the ING CSV preamble
    * (/root/reference/panda.py:47).
    */
  val ingHeaderPrefix = "Buchung;Wertstellungsdatum;Auftraggeber"

  /** Raw ING CSV layout after the preamble, all strings pre-parse. The
    * duplicated Währung column gets the `.1`-suffix name pandas assigns
    * (/root/reference/panda.py:50-57) so downstream names line up.
    */
  val ingRawSchema: StructType = StructType(Seq(
    StructField("Buchung", StringType),
    StructField("Wertstellungsdatum", StringType),
    StructField("party", StringType),
    StructField("book_text", StringType),
    StructField("purpose", StringType),
    StructField("Saldo", StringType),
    StructField("currency", StringType),
    StructField("Betrag", StringType),
    StructField("currency1", StringType)))

  /** The 8-column canonical in-memory layout produced by ingest
    * (/root/reference/panda.py:70-81).
    */
  val rawColumns: Seq[String] = Seq(
    "account", "book_date", "valuta_date", "party", "book_text", "purpose",
    "amount", "balance")

  /** Natural dedup key for batch imports (/root/reference/panda.py:738-741). */
  val dedupKey: Seq[String] = Seq(
    "account", "book_date", "valuta_date", "party", "book_text", "purpose",
    "amount")

  /** Durable store schema (parquet system-of-record). */
  val storeSchema: StructType = StructType(Seq(
    StructField("transaction_id", LongType, nullable = false),
    StructField("account", StringType, nullable = false),
    StructField("book_date", DateType, nullable = false),
    StructField("valuta_date", DateType, nullable = false),
    StructField("party", StringType),
    StructField("book_text", StringType),
    StructField("purpose", StringType),
    StructField("amount_cents", LongType, nullable = false),
    StructField("balance_cents", LongType),
    StructField("transfer_category", StringType),
    StructField("category", StringType),
    StructField("category_manual", StringType),
    StructField("fingerprint", StringType, nullable = false),
    StructField("imported_at", TimestampType)))
}
