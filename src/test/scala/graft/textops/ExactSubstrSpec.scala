package graft.textops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{ArrayExprs, TextExprs}

/** Exact substring dedup (the q82 operator): rolling window-hash
  * equivalence against a non-rolling Horner reference over real corpus
  * text, and the span semantics (merge-on-touch islands, within-doc
  * repeats, short-doc exclusion) against hand-computed expectations.
  */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("rolling double-KR window hashes equal the non-rolling Horner " +
      "reference on every sf0.001 document") {
    val n = 13
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("w", TextStats.words(col("text")))
      .filter(size(col("w")) >= n)
    // reference: per-window Horner over per-token KrHash values, no
    // rolling update — O(m·n), test-only
    def horner(mod: Long) = transform(
      sequence(lit(0), size(col("w")) - n),
      i => aggregate(
        transform(slice(col("w"), i + 1, lit(n)),
          t => TextExprs.krHash(t, 257L, mod)),
        lit(0L), (acc, t) => (acc * 257L + t) % mod))
    val mismatches = docs
      .withColumn("rolling", ArrayExprs.rollingGramKrHashes(col("w"), n))
      .withColumn("ref", zip_with(horner(1000000007L), horner(998244353L),
        (h1, h2) => h1 * 998244353L + h2))
      .filter(not(col("rolling") === col("ref")))
      .count()
    assert(mismatches === 0)
  }

  test("cross-doc shared run: one merged span per doc covering exactly " +
      "the shared tokens") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y a b c d z w"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8")).toDF("doc_id", "text")
    // shared 4-token run "a b c d": windows(3) at A:0,1 and B:2,3 merge
    val out = Dedup.exactSubstringSpans(docs, minTokens = 3)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, 1L, 4L, 4), (2L, 1L, 4L, 4)))
  }

  test("within-doc repeat counts as duplication; touching windows merge " +
      "into one maximal span") {
    val docs = Seq((7L, "p q r s p q r s")).toDF("doc_id", "text")
    // windows(3): (p q r)@0,4 and (q r s)@1,5 repeat; positions 0,1,4,5
    // merge (gap 3 ≤ L) into one island covering tokens 0..7
    val out = Dedup.exactSubstringSpans(docs, minTokens = 3)
      .as[(Long, Long, Long, Int)].collect()
    assert(out.toSeq === Seq((7L, 1L, 8L, 8)))
  }

  test("distant repeats stay separate spans") {
    // two copies of a 3-token phrase far apart in one doc: two spans
    val filler = (1 to 10).map(i => s"f$i").mkString(" ")
    val docs = Seq((9L, s"m n o $filler m n o")).toDF("doc_id", "text")
    val out = Dedup.exactSubstringSpans(docs, minTokens = 3)
      .as[(Long, Long, Long, Int)].collect()
    assert(out.toSeq === Seq((9L, 2L, 6L, 3)))
  }

  test("docs shorter than the window never appear, even as exact copies") {
    val docs = Seq((1L, "k l"), (2L, "k l")).toDF("doc_id", "text")
    assert(Dedup.exactSubstringSpans(docs, minTokens = 3).count() === 0)
  }

  test("short-doc rolling hash output is empty, not a whole-text gram") {
    val one = Seq(("a b")).toDF("t")
      .select(ArrayExprs.rollingGramKrHashes(
        TextStats.words(col("t")), 3).as("h"))
      .as[Seq[Long]].head()
    assert(one.isEmpty)
  }
}
