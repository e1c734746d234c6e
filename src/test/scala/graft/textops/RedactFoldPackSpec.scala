package graft.textops

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextExprs

/** PII redaction ([[Redact]]), Unicode folding
  * ([[graft.functions.TextExprs.FoldText]]) and sequence packing
  * ([[Packing]]).
  */
class RedactFoldPackSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(s: String): (String, Int, Int, Int) =
    Seq(Tuple1(s)).toDF("t")
      .select(Seq(Redact.redactPii(col("t")).as("r")) ++
        Redact.redactionCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
      .as[(String, Int, Int, Int)].head()

  private def redactAllOne(s: String): (String, Int, Int, Int) =
    Seq(Tuple1(s)).toDF("t")
      .select(Redact.redactAll(col("t")).as("r"))
      .select(col("r.redacted"), col("r.n_emails"), col("r.n_ips"),
        col("r.n_nums"))
      .as[(String, Int, Int, Int)].head()

  test("redactPii replaces emails, IPv4s and long digit runs") {
    val (r, ne, ni, nn) = redactOne(
      "mail a.b+c@sub.example.org then 192.168.0.1 and card 4111111111111111")
    assert(r === "mail <EMAIL> then <IP> and card <NUM>")
    assert((ne, ni, nn) === ((1, 1, 1)))
  }

  test("redactPii ordering: digit-run rule never splits IPs or emails") {
    // the dotted quad survives as <IP>, not 4 separate short runs; the
    // email's digit-bearing local part goes with the email, not <NUM>
    val (r, _, _, _) = redactOne("x1234567@a.io 10.20.30.40 0001112223334")
    assert(r === "<EMAIL> <IP> <NUM>")
  }

  test("redactPii leaves clean text and short digit runs untouched") {
    val s = "version 1.2 of chapter 12 costs 123456 cents"
    val (r, ne, ni, nn) = redactOne(s)
    assert(r === s)
    assert((ne, ni, nn) === ((0, 0, 0)))
  }

  test("redactAll: single alternation pass reproduces the sequential " +
      "redaction and counts redactions per class") {
    for (s <- Seq(
        "mail a.b+c@sub.example.org then 192.168.0.1 and card " +
          "4111111111111111",
        "x1234567@a.io 10.20.30.40 0001112223334",
        "version 1.2 of chapter 12 costs 123456 cents",
        "1.2.3.4@5.6.7.8 a@b.cd1234567", "")) {
      val (r, ne, ni, nn) = redactAllOne(s)
      assert(r === redactOne(s)._1, s"redacted mismatch on '$s'")
      // counts = placeholders actually present in the output
      assert(ne === "<EMAIL>".r.findAllIn(r).size, s)
      assert(ni === "<IP>".r.findAllIn(r).size, s)
      assert(nn === "<NUM>".r.findAllIn(r).size, s)
    }
  }

  test("redactAll counts nested matches ONCE, for the outer class") {
    // "1234567" sits inside the email's local part: the independent
    // per-pattern count sees 2 digit runs, the redaction count sees 1
    val (r, ne, ni, nn) = redactAllOne("x1234567@a.io and 0001112223334")
    assert(r === "<EMAIL> and <NUM>")
    assert((ne, ni, nn) === ((1, 0, 1)))
    assert(redactOne("x1234567@a.io and 0001112223334")._4 === 2)
  }

  test("redactAll classifies correctly when a pattern carries its OWN " +
      "capturing groups (alternation numbering shifts)") {
    import graft.functions.TextExprs
    import org.apache.spark.sql.graftshim.{columnExpr, exprColumn}
    // class 0 has 2 inner groups: naive `cls+1` walking would misattribute
    // class-1/2 matches (or walk off the end); offsets must absorb them
    val e = exprColumn(TextExprs.RedactPiiAll(columnExpr(col("t")),
      names = Seq("n_ab", "n_ip", "n_num"),
      patterns = Seq("(a+)(b+)", "\\d+\\.\\d+\\.\\d+\\.\\d+", "\\d{7,}"),
      placeholders = Seq("<AB>", "<IP>", "<NUM>")))
    val r = Seq("xaabb 1.2.3.4 12345678 ab").toDF("t")
      .select(e.as("r")).select("r.*").collect().head
    assert(r.getString(0) === "x<AB> <IP> <NUM> <AB>")
    assert((r.getInt(1), r.getInt(2), r.getInt(3)) === ((2, 1, 1)))
  }

  test("foldUtf8: de-accents, lowercases, collapses whitespace, trims") {
    assert(TextExprs.foldUtf8(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "  Héllo\t Wörld\r\n Ñandú  ")).toString === "hello world nandu")
  }

  test("foldUtf8: precomposed and decomposed input fold identically") {
    def f(s: String) = TextExprs.foldUtf8(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
    assert(f("été") === "ete")            // é precomposed
    assert(f("été") === "ete")          // e + combining acute
    assert(f("İ") === "i")                     // dotted capital I
    assert(f("   \t \n ") === "")
    // RE2 \s excludes vertical tab — the fold must too (oracle parity)
    assert(f("ab") === "ab")
  }

  test("foldUtf8 is idempotent — folding folded text is the identity") {
    def f(s: String) = TextExprs.foldUtf8(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
    val rng = new scala.util.Random(42)
    val alphabet = "aA éÉöÑ \t\n.zZ09"
    (1 to 200).foreach { _ =>
      val s = Seq.fill(rng.nextInt(40))(
        alphabet(rng.nextInt(alphabet.length))).mkString
      assert(f(f(s)) === f(s), s"not idempotent on ${s.getBytes.toSeq}")
    }
  }

  test("FoldText through a DataFrame (codegen path) matches direct eval") {
    val rows = Seq("MiXeD   CaSe", "  tabs\tand\nnewlines ", "", "çàüöñ")
    val got = rows.toDF("t")
      .select(TextExprs.foldText(col("t")).as("f")).as[String].collect()
    val want = rows.map(s => TextExprs.foldUtf8(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString)
    assert(got.toSeq === want)
    val gotNull = Seq[Option[String]](None).toDF("t")
      .select(TextExprs.foldText(col("t"))).collect()
    assert(gotNull.head.isNullAt(0))
  }

  test("assignPacks: doc joins the pack its first token falls in") {
    // tokens: 3, 3, 3 with capacity 4 → cum_before 0, 3, 6 → packs 0,0,1
    val docs = Seq((1L, "a b c", "s"), (2L, "d e f", "s"), (3L, "g h i", "s"))
      .toDF("id", "text", "src")
    val got = Packing.assignPacks(docs, col("text"), col("src"), col("id"),
        capacity = 4L)
      .select("id", "pack_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 0L), (2L, 0L), (3L, 1L)))
  }

  test("assignPacks: exact-boundary start opens the next pack; " +
      "oversized docs take one pack; sources pack independently") {
    val docs = Seq(
      (1L, "a b c d", "s1"),       // 4 tokens, cum_before 0 → pack 0
      (2L, "e f", "s1"),           // cum_before 4 = capacity → pack 1
      (3L, Seq.fill(9)("w").mkString(" "), "s2"), // oversized → pack 0
      (4L, "x", "s2"))             // cum_before 9 → pack 2
      .toDF("id", "text", "src")
    val got = Packing.assignPacks(docs, col("text"), col("src"), col("id"),
        capacity = 4L)
      .select("id", "pack_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 0L), (2L, 1L), (3L, 0L), (4L, 2L)))
  }

  test("packStats aggregates fill and span per pack; one shuffle total") {
    val docs = Seq((1L, "a b c", "s"), (2L, "d e", "s"), (3L, "f g h", "s"))
      .toDF("id", "text", "src")
    val stats = Packing.packStats(docs, col("text"), col("src"), col("id"),
      capacity = 5L)
    val got = stats.orderBy("pack_id")
      .select("src", "pack_id", "n_docs", "n_tokens", "first_doc", "last_doc")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq(("s", 0L, 2L, 5L, 1L, 2L), ("s", 1L, 1L, 3L, 3L, 3L)))
    // window + groupBy share the source partitioning: the aggregation
    // reuses the window's shuffle, so exactly ONE exchange in the plan
    val aqeKey = "spark.sql.adaptive.enabled"
    val prior = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false") // deterministic physical plan to assert
    val plan =
      try Packing.packStats(docs, col("text"), col("src"), col("id"),
        capacity = 5L).queryExecution.executedPlan
      finally spark.conf.set(aqeKey, prior)
    val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.size === 1, plan.toString)
  }
}
