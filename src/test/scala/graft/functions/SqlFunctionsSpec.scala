package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.textops.TextStats

/** The SQL front door ([[GraftFunctions]]): every registered function
  * must produce EXACTLY what the Column API produces — same builder
  * table, so SQL vs Column is one implementation behind two surfaces.
  */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private val docs = Seq(
    (1L, "The quick brown Fox  jumps\tover the lazy dog the fox"),
    (2L, "Füße über grüne   Wiesen und der Himmel ist blau heute"),
    (3L, ""),
    (4L, "alpha beta alpha beta alpha beta alpha beta gamma delta"))
    .toDF("doc_id", "text")

  test("scalar text functions via SQL equal the Column API bit for bit") {
    docs.createOrReplaceTempView("sql_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_fold_text(text) AS f,
           graft_token_count(text) AS tc,
           graft_quality_score(text) AS q,
           graft_lang_id(text) AS lang,
           graft_content_fingerprint(text) AS fp,
           graft_kr_hash(text) AS kh,
           graft_word_shingles(graft_words(text), 3) AS sh
         FROM sql_docs ORDER BY doc_id""").collect().toSeq
    val viaCol = docs.select(col("doc_id"),
        TextExprs.foldText(col("text")).as("f"),
        TextStats.tokenCount(col("text")).as("tc"),
        TextStats.qualityScore(col("text")).as("q"),
        TextStats.langId(col("text")).as("lang"),
        TextStats.contentFingerprint(col("text")).as("fp"),
        TextExprs.krHash(col("text")).as("kh"),
        ArrayExprs.wordShingles(TextStats.words(col("text")), 3).as("sh"))
      .orderBy("doc_id").collect().toSeq
    assert(viaSql === viaCol)
  }

  test("array functions via SQL: dot / cosine / sorted intersect") {
    val got = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
           round(graft_cosine_sim(array(1.0D, 0.0D),
             array(1.0D, 1.0D)), 6) AS cs,
           graft_sorted_intersect_long(array(1L, 3L, 7L),
             array(3L, 5L, 7L, 9L)) AS si
         """).head()
    assert(got.getDouble(0) === 11.0)
    assert(got.getDouble(1) === math.rint(1.0 / math.sqrt(2) * 1e6) / 1e6)
    assert(got.getInt(2) === 2)
  }

  test("aggregate functions via SQL: capped collect, top-k, bin counts") {
    spark.range(100).select((col("id") % 5).as("g"), col("id"))
      .createOrReplaceTempView("sql_nums")
    val rows = spark.sql(
      """SELECT g, size(graft_collect_capped(id, 7)) AS n_capped,
           graft_collect_topk(id, 3) AS top3,
           graft_bin_counts(CAST(id % 4 AS BIGINT), 4) AS bins
         FROM sql_nums GROUP BY g ORDER BY g""").collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getInt(1) === 7) // cap bounds the buffer
      val g = r.getLong(0)
      assert(r.getSeq[Long](2) === Seq(95 + g, 90 + g, 85 + g))
      assert(r.getSeq[Long](3).sum === 20L)
    }
  }

  test("config parameters must be literals — a column reference fails " +
      "loudly at analysis, never silently misconfigures") {
    spark.range(3).toDF("id").createOrReplaceTempView("sql_ids")
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_collect_topk(id, CAST(id AS INT)) FROM sql_ids " +
          "GROUP BY id").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"), e.getMessage)
  }

  test("graft_json_field equals get_json_object on every in-contract " +
      "shape (scalars, escapes, nesting skipped, null/missing/" +
      "malformed) and nulls the documented non-scalar seam") {
    val cases = Seq(
      """{"k": 69}""",
      """{"k":-12.5e3,"j":1}""",
      """{"a": 1, "k": 2, "z": 3}""",
      """{ "k" : true }""",
      """{"k": false, "k": 99}""",              // duplicate: first wins
      """{"k": "plain"}""",
      """{"k": "a\"b\\c\/d\n\té😀"}""", // escapes + surrogate
      """{"k": null}""",                        // JSON null -> SQL NULL
      """{"j": 1}""",                           // missing key
      """{"nested": {"k": 5}, "k": 7}""",       // inner k must not match
      """{"arr": [1, {"k": 9}, "k"], "k": 8}""",
      """{"s": "has \"k\": inside", "k": 4}""", // key-lookalike in a value
      """{}""",
      """   {"k": 42}   """,
      """not json at all""",
      """[1, 2, 3]""",                          // non-object
      """{"k": """,                             // truncated
      null)
    val df = cases.zipWithIndex
      .map { case (j, i) => (i.toLong, Option(j)) }.toDF("i", "js")
    val got = df.select(col("i"),
        TextExprs.jsonScalarField(col("js"), "$.k").as("v"))
      .orderBy("i").collect().map(r => Option(r.getString(1))).toSeq
    val ref = df.select(col("i"),
        get_json_object(col("js"), "$.k").as("v"))
      .orderBy("i").collect().map(r => Option(r.getString(1))).toSeq
    assert(got === ref)
    // documented seam: matched OBJECT/ARRAY values return NULL here
    // (GetJsonObject re-serializes them) — the wrapper name pins the
    // scalar contract
    val seam = Seq("""{"k": {"x": 1}}""", """{"k": [1,2]}""").toDF("js")
    assert(seam.select(TextExprs.jsonScalarField(col("js"), "$.k"))
      .collect().forall(_.isNullAt(0)))
    // non-simple paths fall back to get_json_object transparently
    val nested = Seq("""{"a": {"b": 7}}""").toDF("js")
    assert(nested.select(TextExprs.jsonScalarField(col("js"), "$.a.b")
      .cast("long")).head.getLong(0) === 7L)
    // SQL registration: same values through the SQL front door
    df.createOrReplaceTempView("sql_json")
    val viaSql = spark.sql(
      "SELECT graft_json_field(js, 'k') AS v FROM sql_json ORDER BY i")
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(viaSql === ref)
  }

  test("SQL and Column build the SAME expression tree (canonical plan " +
      "equality, not just value equality)") {
    docs.createOrReplaceTempView("sql_docs2")
    val sqlPlan = spark.sql(
      "SELECT graft_fold_text(text) AS f FROM sql_docs2")
      .queryExecution.analyzed.canonicalized
    val colPlan = docs.select(TextExprs.foldText(col("text")).as("f"))
      .queryExecution.analyzed.canonicalized
    assert(sqlPlan === colPlan)
  }
}
