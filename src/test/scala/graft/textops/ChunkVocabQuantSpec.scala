package graft.textops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Overlapping chunking ([[Chunking]]), vocabulary extraction
  * ([[TextStats.vocabulary]]) and scalar quantization ([[Quantize]]).
  */
class ChunkVocabQuantSpec extends SparkSpec {
  import spark.implicits._

  test("chunkByChars: offsets at stride multiples < len, short tail, " +
      "empty doc keeps one empty chunk") {
    val docs = Seq(
      (1L, "x" * 80),    // < size → one chunk
      (2L, "y" * 200),   // offsets 0,150 → tail chunk of 50
      (3L, ""),          // one empty chunk
      (4L, "z" * 351))   // offsets 0,150,300 → 200,200,51 chars
      .toDF("doc_id", "text")
    val got = Chunking.chunkByChars(docs, col("text"), size = 200,
        stride = 150)
      .select("doc_id", "chunk_idx", "offset", "n_chars")
      .as[(Long, Int, Int, Int)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(
      (1L, 0, 0, 80),
      (2L, 0, 0, 200), (2L, 1, 150, 50),
      (3L, 0, 0, 0),
      (4L, 0, 0, 200), (4L, 1, 150, 200), (4L, 2, 300, 51)))
  }

  test("chunkByChars: every character is covered; interior chunks " +
      "overlap by size - stride") {
    val text = ('a' to 'z').mkString * 20 // 520 chars
    val chunks = Chunking.chunkByChars(
        Seq((1L, text)).toDF("doc_id", "text"),
        col("text"), size = 200, stride = 150)
      .select("offset", "chunk").as[(Int, String)].collect().sortBy(_._1)
    val covered = chunks.flatMap { case (off, c) => off until off + c.length }
    assert(covered.toSet === (0 until text.length).toSet)
    chunks.sliding(2).foreach { case Array((o1, c1), (o2, _)) =>
      assert(o1 + c1.length - o2 === 50, "interior overlap must be 50")
    case _ => () }
    // reassembling unique-coverage prefixes reproduces the document
    val rebuilt = chunks.map { case (off, c) =>
      val keep = chunks.find(_._1 > off).map(_._1 - off).getOrElse(c.length)
      c.take(keep) }.mkString
    assert(rebuilt === text)
  }

  test("vocabulary: frequencies, doc frequency, deterministic tie-break " +
      "and top-k boundary") {
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana cherry date"),
      (3L, "apple  banana\tcherry")) // multi-whitespace splits clean
      .toDF("doc_id", "text")
    val got = TextStats.vocabulary(docs, topK = 3)
      .as[(String, Long, Long)].collect()
    // counts: apple 3 (docs 1,3), banana 3 (1,2,3), cherry 3 (1,2,3),
    // date 1 — tie at 3 broken alphabetically, date cut by top-3
    assert(got.toSeq === Seq(
      ("apple", 3L, 2L), ("banana", 3L, 3L), ("cherry", 3L, 3L)))
  }

  test("tfidfTopTerms: hand-computed scores, rare terms outrank " +
      "frequent ones, rank order deterministic") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "apple date"))
      .toDF("doc_id", "text")
    val got = TextStats.tfidfTopTerms(docs, k = 2)
      .orderBy("doc_id", "rank")
      .select("doc_id", "rank", "term", "score")
      .as[(Long, Int, String, Double)].collect()
    // df: apple 2, banana 2, cherry 1, date 1; N = 3
    // ln(3/2) = 0.4055, ln(3) = 1.0986 (4dp)
    assert(got.toSeq === Seq(
      (1L, 1, "apple", 0.8109),  // tf 2 · ln(1.5)
      (1L, 2, "banana", 0.4055),
      (2L, 1, "cherry", 1.0986), // rare beats shared banana
      (2L, 2, "banana", 0.4055),
      (3L, 1, "date", 1.0986),
      (3L, 2, "apple", 0.4055)))
  }

  test("scalarQuantize: endpoint codes, code range, half-step error " +
      "bound, constant-vector guard") {
    val embs = Seq(
      (1L, Seq(-0.5f, 0.25f, 0.5f, 0.0f)),
      (2L, Seq(0.3f, 0.3f, 0.3f))) // constant → span 0
      .toDF("vec_id", "embedding")
    val rows = Quantize.scalarQuantize(embs, col("embedding"))
      .select($"vec_id", $"vmin", $"vmax", $"codes", $"max_abs_err")
      .as[(Long, Double, Double, Seq[Int], Double)]
      .collect().sortBy(_._1)

    val (_, vmin, vmax, codes, err) = rows(0)
    assert((vmin, vmax) === ((-0.5, 0.5)))
    assert(codes.min === 0 && codes.max === 255)
    assert(codes.forall(c => c >= 0 && c <= 255))
    assert(err <= (vmax - vmin) / 510.0 + 1e-12, s"err=$err")

    val (_, _, _, codes2, err2) = rows(1)
    assert(codes2.forall(_ === 0) && err2 === 0.0)
  }
}
