package graft.textops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend"),  // near-dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank"),  // exact dup of 1
    (4L, "der schnelle braune fuchs springt und ist nicht mit dem hund"),
    (5L, "completely different words about spark catalyst optimizer plans"),
    (6L, "le chat est dans la maison et les oiseaux dans les arbres pour que"),
    (7L, "el perro es una mascota por para con los gatos del jardin se"),
    (8L, "12345 67890 !!! ??? ... ;;; 11111 22222"))
    .toDF("doc_id", "text")

  test("exact dedup keeps min doc_id per identical content") {
    val out = Dedup.exact(docs).select("doc_id").as[Long].collect().sorted
    assert(out === Array(1L, 2L, 4L, 5L, 6L, 7L, 8L))  // 3 deduped into 1
    val stats = Dedup.exactDupStats(docs)
      .filter(col("n_docs") > 1).collect()
    assert(stats.length === 1)
    assert(stats.head.getAs[Long]("keep_id") === 1L)
    assert(stats.head.getAs[Long]("n_docs") === 2L)
  }

  test("exact dedup emits ONE row per fingerprint even when ids repeat") {
    // duplicated ingestion: the surviving (fingerprint, id) appears twice —
    // a semi-join-on-min-id shape would keep both copies
    val dupIngested = Seq(
      (1L, "same text twice"), (1L, "same text twice"),
      (2L, "same text twice"), (3L, "unrelated other text")
    ).toDF("doc_id", "text")
    val out = Dedup.exact(dupIngested).collect()
    assert(out.length === 2)
    assert(out.map(_.getAs[Long]("doc_id")).sorted === Array(1L, 3L))
  }

  test("ngram Jaccard finds near-dup and exact-dup pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L)))  // exact dup: jaccard 1.0
    assert(pairs.contains((1L, 2L)))  // near dup: 1 word differs
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("minhash LSH recalls the exact high-jaccard pairs") {
    val exact = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val approx = Dedup.minhashLshPairs(docs, n = 3, k = 64, bands = 16,
        estThreshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(exact.subsetOf(approx),
      s"missed pairs: ${exact.diff(approx)}")
  }

  test("releasable twins free their persisted intermediate on release()") {
    def cached = spark.sparkContext.getPersistentRDDs.size
    spark.catalog.clearCache()
    val base = cached
    val variants = Seq[(String, (org.apache.spark.sql.DataFrame, () => Unit))](
      "jaccard" -> Dedup.ngramJaccardPairsReleasable(docs, n = 3,
        threshold = 0.5),
      "prefix" -> Dedup.ngramJaccardPairsPrefixReleasable(docs, n = 3,
        threshold = 0.7),
      "minhash" -> Dedup.minhashLshPairsReleasable(docs, n = 3))
    variants.foreach { case (name, (pairs, release)) =>
      pairs.count() // materialize → the internal persist registers its RDD
      assert(cached > base, s"$name: expected a cache entry after the action")
      release()
      assert(cached === base, s"$name: release() must drop the cache entry")
    }
    // the admission door (minhashLshAdmitReleasable) — the operator built
    // for REPEATED daily calls, where a leaked signature frame per call
    // compounds — follows the same contract
    val idx = java.nio.file.Files
      .createTempDirectory("minhash-idx-release").toString
    Dedup.saveMinhashIndex(docs, idx, n = 3)
    val (admitted, releaseAdmit) =
      Dedup.minhashLshAdmitReleasable(docs.limit(2), idx, n = 3)
    admitted.count()
    assert(cached > base, "admit: expected a cache entry after the action")
    releaseAdmit()
    assert(cached === base, "admit: release() must drop the cache entry")
    // semDedup's assignment frame has four plan consumers — same contract
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val cents = Similarity.trainIvfCentroids(emb, nCentroids = 4)
    val (sem, releaseSem) =
      Similarity.semDedupReleasable(emb, cents, threshold = 0.95)
    sem.count()
    assert(cached > base, "semdedup: expected a cache entry after the action")
    releaseSem()
    assert(cached === base, "semdedup: release() must drop the cache entry")
  }

  test("minhashLshAdmit fails loudly when the probe parameters do not " +
      "match the index's manifest (a mismatch is silently-wrong " +
      "est_jaccard, never an error, without the check)") {
    val idx = java.nio.file.Files
      .createTempDirectory("minhash-idx-params").toString
    Dedup.saveMinhashIndex(docs, idx, n = 3, k = 64, bands = 16)
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashLshAdmit(docs.limit(1), idx, n = 3, k = 64, bands = 8)
        .count()
    }
    assert(e.getMessage.contains("was built with"))
    // matching parameters pass through the gate
    assert(Dedup.minhashLshAdmit(docs.limit(1), idx, n = 3, k = 64,
      bands = 16).count() >= 0)
  }

  test("simhash: identical texts collide, near-dups are close, distinct far") {
    val sh = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) === sh(3L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(2L)) <= 12)
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(5L)) > 12)
    val pairs = Dedup.simhashPairs(docs, maxDist = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L)))
  }

  test("sortedIntersectCount: merge count equals array_intersect size") {
    import graft.functions.ArrayExprs
    // directed cases over sorted (h, s) struct arrays, including the
    // hash-collision tie-break (same h, different s) the merge must NOT
    // count as a match, plus empty/disjoint/identical shapes
    val cases = spark.sql("""SELECT * FROM VALUES
      (array(named_struct('h', 1L, 's', 'a'), named_struct('h', 1L, 's', 'b'),
             named_struct('h', 5L, 's', 'c')),
       array(named_struct('h', 1L, 's', 'b'), named_struct('h', 2L, 's', 'z'),
             named_struct('h', 5L, 's', 'c'))),
      (array(named_struct('h', 1L, 's', 'a')),
       array(named_struct('h', 1L, 's', 'x'))),
      (array(named_struct('h', 1L, 's', 'a'), named_struct('h', 2L, 's', 'b')),
       array(named_struct('h', 1L, 's', 'a'), named_struct('h', 2L, 's', 'b'))),
      (array(named_struct('h', 1L, 's', 'a')), CAST(array() AS
       ARRAY<STRUCT<h: BIGINT, s: STRING>>)),
      (array(named_struct('h', 1L, 's', 'a'), named_struct('h', 3L, 's', 'q')),
       array(named_struct('h', 2L, 's', 'a'), named_struct('h', 4L, 's', 'q')))
      AS t(a, b)""")
    val got = cases.select(
        ArrayExprs.sortedIntersectCount(col("a"), col("b")).as("merge"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
      .collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1), r.toString))
    assert(got.map(_.getInt(0)).toSeq === Seq(2, 0, 2, 0, 0))

    // pipeline-derived case: the exact (h, s) layout the prefix verifier
    // feeds it, compared against the string-projection intersect on the
    // full docs fixture's cross pairs
    val sorted = docs.select(col("doc_id"),
      array_sort(transform(
        array_distinct(TextStats.shingles(col("text"), 3)),
        s => struct(xxhash64(s).as("h"), s.as("s")))).as("sh"))
    val pairs = sorted.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      .crossJoin(sorted.select(col("doc_id").as("id_b"), col("sh").as("sh_b")))
      .filter(col("id_a") < col("id_b"))
    val strings = (c: org.apache.spark.sql.Column) =>
      transform(c, p => p.getField("s"))
    val both = pairs.select(
        ArrayExprs.sortedIntersectCount(col("sh_a"), col("sh_b")).as("merge"),
        size(array_intersect(strings(col("sh_a")), strings(col("sh_b"))))
          .as("builtin"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getInt(0) === r.getInt(1), r.toString))
  }

  test("sortedIntersectCountLong: multiset merge over sorted longs equals " +
      "a reference intersection, including duplicates and negatives") {
    import graft.functions.ArrayExprs
    val rnd = new scala.util.Random(42)
    // random sorted multisets (duplicates kept — the hash-collision shape)
    // spanning negative longs; plus directed empty/disjoint cases
    val cases: Seq[(Seq[Long], Seq[Long])] =
      (1 to 60).map { _ =>
        def mk = Seq.fill(rnd.nextInt(20))(
          (rnd.nextLong() % 8) * (if (rnd.nextBoolean()) 1 else -1)).sorted
        (mk, mk)
      } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+
        ((Seq(-5L, -1L, 3L), Seq(-4L, 0L, 4L)))
    def refIntersect(a: Seq[Long], b: Seq[Long]): Int = {
      val bc = scala.collection.mutable.Map.empty[Long, Int]
      b.foreach(x => bc(x) = bc.getOrElse(x, 0) + 1)
      a.foldLeft(0) { (acc, x) =>
        val c = bc.getOrElse(x, 0)
        if (c > 0) { bc(x) = c - 1; acc + 1 } else acc
      }
    }
    val df = cases.toDF("a", "b")
    val got = df.select(
      ArrayExprs.sortedIntersectCountLong(col("a"), col("b")).as("n"))
      .as[Int].collect().toSeq
    assert(got === cases.map { case (a, b) => refIntersect(a, b) })
  }

  test("prefix-filtered Jaccard pairs equal the posting-list exact pairs") {
    for (t <- Seq(0.5, 0.7, 0.9)) {
      val full = Dedup.ngramJaccardPairs(docs, n = 3, threshold = t)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val pref = Dedup.ngramJaccardPairsPrefix(docs, n = 3, threshold = t)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(pref === full, s"threshold $t")
    }
  }

  test("bucket caps bound adversarial skew with bounded recall loss") {
    // Every doc shares one corpus-wide boilerplate prefix (the adversarial
    // stop-shingle case): with an uncapped posting list all 200 docs land
    // in a handful of groups; with the cap those groups are dropped and the
    // operators still complete, finding pairs only via non-degenerate keys.
    val boiler = "terms of service apply to this document all rights reserved"
    val skewed = (0L until 200L).map { i =>
      val tail = if (i % 2 == 0) s"unique payload number $i alpha beta"
                 else s"unique payload number $i gamma delta"
      (i, s"$boiler $tail")
    }.toDF("doc_id", "text")
    // cap smaller than the degenerate group (200) but bigger than real ones
    val capped = Dedup.ngramJaccardPairs(skewed, n = 3, threshold = 0.9,
      maxPostingList = 64)
    assert(capped.count() === 0) // boilerplate-only overlap is not a dup
    val lsh = Dedup.minhashLshPairs(skewed, n = 3, estThreshold = 0.9,
      maxBucket = 64)
    assert(lsh.count() < 200 * 199 / 2) // never the quadratic blowup
    val sim = Dedup.simhashPairs(skewed, maxDist = 1, maxBucket = 64)
    assert(sim.count() < 200 * 199 / 2)
  }

  test("capped posting lists: jaccard values stay exact, drops observable") {
    // 12 docs share the stop-shingle run "terms of service apply"; docs 100
    // and 101 are true near-dups whose shared shingles INCLUDE the dropped
    // stop-shingles. With maxPostingList=8 the boilerplate groups (12 and
    // 14 members) are dropped, but the reported jaccard for (100,101) must
    // still count those shingles in |A∩B| — the exact-verify path.
    val boiler = "terms of service apply"
    val corpus = (0L until 12L).map(i =>
        (i, s"$boiler unique filler payload number $i"))
      .toDF("doc_id", "text")
      .union(Seq(
        (100L, s"$boiler shared body of the near duplicate pair alpha"),
        (101L, s"$boiler shared body of the near duplicate pair beta"))
        .toDF("doc_id", "text"))
    val obs = new org.apache.spark.sql.Observation("cap-stats")
    val out = Dedup.ngramJaccardPairs(corpus, n = 3, threshold = 0.5,
        maxPostingList = 8, dropStats = Some(obs))
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    // brute-force oracle jaccard over full distinct shingle sets
    def shingleSet(t: String): Set[String] =
      t.toLowerCase.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val sa = shingleSet(s"$boiler shared body of the near duplicate pair alpha")
    val sb = shingleSet(s"$boiler shared body of the near duplicate pair beta")
    val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
    assert(out.get((100L, 101L)).contains(exact),
      s"reported ${out.get((100L, 101L))} vs exact $exact")
    val m = obs.get
    assert(m("dropped_groups").asInstanceOf[Long] >= 1L,
      "cap should have fired on the boilerplate groups")
    // max_group rides on the count(*) in the capped aggregation (Long)
    assert(m("max_group").asInstanceOf[Long] === 14L)
  }

  test("repetitionStats: hand-computed duplicate fractions and top-2-gram " +
      "share, zeros on degenerate text") {
    val fixture = Seq(
      // 6 words: "spam and eggs spam and eggs" — words: 3 distinct of 6
      // → dup_word 0.5; 3-grams (4): "spam and eggs","and eggs spam",
      // "eggs spam and","spam and eggs" → 1 dup of 4 = 0.25; 2-grams (5):
      // "spam and"×2,"and eggs"×2,"eggs spam" → top 2/5 = 0.4
      (1L, "spam and eggs spam and eggs"),
      (2L, "all tokens here are fully distinct"), // no repetition at all
      (3L, "   "), // whitespace-only → zeros
      (4L, "tiny doc")) // 2 words, single 3-gram/2-gram, no dups
      .toDF("doc_id", "text")
    val out = TextStats.repetitionStats(fixture)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out(1L) === ((6L, 0.5, 0.25, 0.4)))
    assert(out(2L) === ((6L, 0.0, 0.0, 0.2))) // 5 distinct 2-grams: top 1/5
    assert(out(3L) === ((0L, 0.0, 0.0, 0.0)))
    assert(out(4L) === ((2L, 0.0, 0.0, 1.0))) // the single 2-gram is 100%
  }

  test("crossDocNgramStats: corpus-frequent 3-grams counted per doc, " +
      "within-doc repeats collapse to one distinct shingle") {
    val fixture = Seq(
      (1L, "a b c d"),   // shingles: "a b c", "b c d"
      (2L, "a b c x"),   // shingles: "a b c", "b c x"
      (3L, "z z z z"))   // "z z z" twice → ONE distinct shingle
      .toDF("doc_id", "text")
    val out = TextStats.crossDocNgramStats(fixture, minDocs = 2)
      .select("doc_id", "n_shingles", "n_common", "common_frac")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // df("a b c") = 2 → common; every other shingle df = 1
    assert(out(1L) === ((2L, 1L, 0.5)))
    assert(out(2L) === ((2L, 1L, 0.5)))
    assert(out(3L) === ((1L, 0L, 0.0)))
  }

  test("langId picks the profile with most stopword hits") {
    val out = docs.select(col("doc_id"), TextStats.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "en")
    assert(out(4L) === "de")
    assert(out(6L) === "fr")
    assert(out(7L) === "es")
    assert(out(8L) === "und")
  }

  test("native langId equals the HOF/CASE oracle formulation") {
    // parity corpus includes ties (equal en/de hits), empty-ish rows and
    // NULL (both sides must say "und", not NULL)
    val tricky = docs.select(col("text"))
      .union(Seq("the und der is ist", "", "   ", "le el la los",
        null.asInstanceOf[String]).toDF("text"))
    val mismatch = tricky.select(
        TextStats.langId(col("text")).as("native"),
        TextStats.langIdHof(col("text")).as("hof"))
      .filter(not(col("native") <=> col("hof")))
    assert(mismatch.count() === 0)
  }

  test("quality score: English prose scores high, digit soup scores low") {
    val out = docs.select(col("doc_id"),
        TextStats.qualityScore(col("text")).as("q"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) > 0.6)
    assert(out(8L) < 0.2)
    assert(out.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("token counts: whitespace vs BPE-ish") {
    val out = docs.filter(col("doc_id") === 8)
      .select(TextStats.tokenCount(col("text")),
        TextStats.bpeTokenCount(col("text")))
      .as[(Int, Int)].head()
    assert(out._1 === 8)
    // 4 digit runs stay whole; each of the 12 punctuation chars is its own token
    assert(out._2 === 4 + 12)
  }

  test("winnowing: rolling recurrence equals the direct polynomial oracle") {
    // independent naive mirror: every k-gram hash computed directly,
    // window minima by brute force — no rolling, no deque
    val (k, w, b, m) = (8, 8, 257L, 1000000007L)
    def naive(text: String): Seq[Long] = {
      val cps = text.toLowerCase.trim.codePoints().toArray
      val g = cps.length - k + 1
      if (g < 1) return Seq.empty
      val hs = (0 until g).map { i =>
        (0 until k).foldLeft(0L)((h, j) => (h * b + cps(i + j)) % m)
      }
      val mins =
        if (g <= w) Seq(hs.min)
        else (0 to g - w).map(i => hs.slice(i, i + w).min)
      mins.distinct.sorted
    }
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaa",                  // degenerate: all grams equal
      "короткий пример с юникодом über äöü", // non-ASCII code points
      "exactly8",                            // single gram
      "short",                               // below k → empty
      "abcdefghijklmnop")
    val out = samples.toDF("text")
      .select(TextStats.winnowingFingerprint(col("text")).as("fp"))
      .as[Seq[Long]].collect()
    samples.zip(out).foreach { case (s, got) =>
      assert(got === naive(s), s"mismatch for '$s'")
    }
  }

  test("winnowing guarantee: shared passage ≥ w+k−1 chars ⇒ shared fp") {
    val passage = "this exact shared passage is long enough to guarantee"
    val a = s"prefix words before $passage and then a different ending"
    val b = s"совершенно другой текст $passage completely other tail words"
    val fps = Seq(a, b).toDF("text")
      .select(TextStats.winnowingFingerprint(col("text")).as("fp"))
      .as[Seq[Long]].collect()
    assert(fps(0).toSet.intersect(fps(1).toSet).nonEmpty)
    // and unrelated texts share nothing
    val unrel = Seq("one entirely distinct document body here",
      "what can possibly collide between these")
      .toDF("text")
      .select(TextStats.winnowingFingerprint(col("text")).as("fp"))
      .as[Seq[Long]].collect()
    assert(unrel(0).toSet.intersect(unrel(1).toSet).isEmpty)
  }

  test("cosine topK: exact and LSH agree on the top neighbor") {
    val vecs = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.9, 0.1, 0.0, 0.0)),   // closest to 0
      (2L, Array(0.0, 1.0, 0.0, 0.0)),
      (3L, Array(0.0, 0.9, 0.1, 0.0)),   // closest to 2
      (4L, Array(-1.0, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val exact = Similarity.cosineTopK(vecs, vecs.filter(col("vec_id") < 2), 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(exact(0L) === 1L)
    assert(exact(1L) === 0L)
    val approx = Similarity.annLshTopK(vecs, vecs.filter(col("vec_id") < 2),
        k = 1, bands = 4, bitsPerBand = 2, dims = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(approx(0L) === 1L)
  }

  test("IVF topK: deterministic and exact on a separable corpus") {
    val vecs = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.9, 0.1, 0.0, 0.0)),
      (2L, Array(0.0, 1.0, 0.0, 0.0)),
      (3L, Array(0.0, 0.9, 0.1, 0.0)),
      (4L, Array(-1.0, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    def run() = Similarity.ivfTopK(vecs, vecs.filter(col("vec_id") < 2),
        k = 1, nCentroids = 3, nProbe = 2, iters = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val out = run()
    assert(out(0L) === 1L)
    assert(out(1L) === 0L)
    assert(run() === out) // hash-picked init, no RNG → identical re-runs
  }

  test("IVF topK recall vs exact top-5 on the real embeddings table") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = df
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.cosineTopK(emb, queries, k = 5))
    val ivf = pairs(Similarity.ivfTopK(emb, queries, k = 5,
      nCentroids = 16, nProbe = 4, iters = 3))
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall below 0.6")
  }

  test("ANN LSH recall vs exact top-5 on the real embeddings table") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = df
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.cosineTopK(emb, queries, k = 5))
    val ann = pairs(Similarity.annLshTopK(emb, queries, k = 5))
    val recall = (exact intersect ann).size.toDouble / exact.size
    assert(recall >= 0.3, s"LSH recall $recall below 0.3")
  }

  test("ANN LSH candidate dedup shuffles ids only, never embedding arrays") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.types.ArrayType
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val df = Similarity.annLshTopK(emb, emb.filter(col("vec_id") < 8), k = 5)
    // dropDuplicates lowers to an Aggregate whose grouping is its whole
    // output; its input is what the dedup Exchange carries — assert no
    // array column (i.e. no embedding) rides through it.
    val dedups = df.queryExecution.optimizedPlan.collect {
      case a: Aggregate
        if a.aggregateExpressions.size == a.groupingExpressions.size => a
    }
    assert(dedups.nonEmpty, "expected a dedup Aggregate in the plan")
    for (a <- dedups; attr <- a.child.output)
      assert(!attr.dataType.isInstanceOf[ArrayType],
        s"dedup input carries array column ${attr.name}")
  }

  test("ANN LSH auto-r recall ≥ fixed-r recall at two corpus sizes") {
    // The r4→r5 scale fix, asserted: under a tight bucket cap, fixed r=4
    // (16 buckets per band forever) overflows the cap as the corpus grows
    // and its buckets get DROPPED — recall collapses. autoBandBits grows r
    // with log n, holding bucket density under the cap at any size. Both
    // variants share bands and the cap; only the per-band bit count moves.
    def recallAt(corpus: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val queries = corpus.filter(col("vec_id") < 8)
      def pairs(df: org.apache.spark.sql.DataFrame) = df
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val exact = pairs(Similarity.cosineTopK(corpus, queries, k = 5))
      def recall(df: org.apache.spark.sql.DataFrame) =
        (exact intersect pairs(df)).size.toDouble / exact.size
      // density target 32: auto resolves to the SAME r=4 at n=500 (recall
      // exactly ties — the hyperplanes are deterministic) and to r=6 at
      // n=2000, where fixed r=4's ~125-member buckets blow the cap and get
      // dropped while auto's ~31-member buckets survive it
      val fixed = recall(Similarity.annLshTopK(corpus, queries, k = 5,
        bands = 16, bitsPerBand = 4, maxBucket = 48))
      val auto = recall(Similarity.annLshTopK(corpus, queries, k = 5,
        bands = 16, targetBucketDensity = 32, maxBucket = 48))
      (auto, fixed)
    }
    def emb(sf: String) = spark.read
      .parquet(s"/root/testdata/$sf/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val (autoSmall, fixedSmall) = recallAt(emb("sf0.001")) // n = 500
    val (autoBig, fixedBig) = recallAt(emb("sf0.1"))       // n = 2000
    assert(autoSmall >= fixedSmall,
      s"n=500: auto-r recall $autoSmall < fixed-r $fixedSmall")
    assert(autoBig >= fixedBig,
      s"n=2000: auto-r recall $autoBig < fixed-r $fixedBig " +
        s"(small: auto $autoSmall fixed $fixedSmall)")
    // at the larger corpus the fixed geometry's buckets exceed the cap —
    // auto-r must not merely tie a degenerate 0-recall baseline
    assert(autoBig >= 0.25,
      s"auto-r recall $autoBig below 0.25 at n=2000 (fixed: $fixedBig)")
  }

  test("exactBandBits matches its spec on boundaries and clamps") {
    // smallest r in [lo, hi] with density·2^r ≥ n — exact at the powers
    // of two where the float ceil(log2) form risks a libm ULP flip
    assert(Similarity.exactBandBits(0) === 4)
    assert(Similarity.exactBandBits(1) === 4)
    assert(Similarity.exactBandBits(64L << 4) === 4)       // 64·2⁴ exactly
    assert(Similarity.exactBandBits((64L << 4) + 1) === 5) // one past it
    assert(Similarity.exactBandBits(64L << 9) === 9)
    assert(Similarity.exactBandBits((64L << 9) + 1) === 10)
    assert(Similarity.exactBandBits(Long.MaxValue) === 16) // hi clamp
    assert(Similarity.exactBandBits(500) === 4)            // the sf0.01 r
    assert(Similarity.exactBandBits(2000) === 5)           // the sf0.1 r
  }

  test("graph ANN: hops recover neighbors the entry probe misses") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = df
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.cosineTopK(emb, queries, k = 5))
    def recall(df: org.apache.spark.sql.DataFrame) =
      (exact intersect pairs(df)).size.toDouble / exact.size
    val entryOnly = recall(Similarity.nswTopK(emb, queries, k = 5,
      hops = 0))
    val hopped = recall(Similarity.nswTopK(emb, queries, k = 5, hops = 2))
    // hops only ADD candidates (the beam re-ranks a superset) — recall
    // is monotone in hops; and the hopped search must clear a real floor
    assert(hopped >= entryOnly,
      s"hops reduced recall: $hopped < entry-only $entryOnly")
    assert(hopped >= 0.5, s"graph-ANN recall $hopped below 0.5 " +
      s"(entry-only: $entryOnly)")
  }

  test("graph ANN is deterministic across runs and respects the degree cap") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val queries = emb.filter(col("vec_id") < 8)
    def run() = Similarity.nswTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    val a = run()
    assert(a.length === 40) // 8 queries × k — every query seeds a beam
    assert(run() === a) // deterministic planes + grid ranking, no RNG
    // out-degree ≤ m per band per source, distinct-unioned across bands
    val deg = Similarity.nswGraph(emb, m = 6, bands = 2)
      .groupBy("src").count().agg(max("count")).as[Long].head()
    assert(deg <= 12, s"out-degree $deg exceeds m×bands = 12")
  }

  test("saved NSW index: probe equals the in-memory build bit-for-bit; " +
      "nswExtend admits a batch (new docs reachable, old recall kept)") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val queries = emb.filter(col("vec_id") < 8)
    val path = java.nio.file.Files
      .createTempDirectory("nsw-index-spec").toString
    // build over the PRE-batch corpus (hold out 20 vectors as the batch)
    val batch = emb.filter(col("vec_id") % 25 === 7)
    val pre = emb.filter(col("vec_id") % 25 =!= 7)
    Similarity.saveNswIndex(pre, path)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
    // saved-index probe == in-memory build (the q119 gate's contract,
    // asserted here at spec scale without the oracle)
    val inMem = rows(Similarity.nswTopK(pre, queries, k = 5))
    val fromDisk = rows(Similarity.nswTopKIndexed(path, pre, queries, k = 5))
    assert(fromDisk === inMem)
    // admit the batch: new docs must be REACHABLE as neighbors when the
    // probe runs over the extended corpus
    Similarity.nswExtend(path, pre, batch)
    val extended = Similarity.nswTopKIndexed(path, emb, queries, k = 5)
    val exact = Similarity.cosineTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = extended.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.5, s"post-extend recall $recall below 0.5")
    // at least one exact neighbor pair that involves a batch vector must
    // be served — the extension made the admitted docs findable
    val batchIds = batch.select("vec_id").as[Long].collect().toSet
    val exactBatchPairs = exact.filter(p => batchIds(p._2))
    if (exactBatchPairs.nonEmpty)
      assert(got.exists(p => batchIds(p._2)),
        "no admitted vector ever served as a neighbor after nswExtend")
  }

  test("graph ANN excludes zero-quantized-norm vectors instead of NaN-ranking them") {
    // a ~zero embedding quantizes to the zero vector; its similarity to
    // anything is 0/0 — the contract excludes it from graph, candidacy
    // AND querying rather than letting NaN float to rank 1
    val dims = 4
    val base = (0L until 40L).map { i =>
      (i, Array.tabulate(dims)(d => math.sin(i * 13.7 + d) / 2 + 0.6))
    }
    val withZero = (base :+ ((40L, Array.fill(dims)(1e-9)))).toDF(
      "vec_id", "embedding")
    val out = Similarity.nswTopK(withZero,
        withZero.filter(col("vec_id") < 2 || col("vec_id") === 40L),
        k = 3, dims = dims)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    assert(!out.exists(_._2 == 40L), "zero-norm vector served as neighbor")
    assert(!out.exists(_._1 == 40L), "zero-norm vector ran as query")
  }

  test("ANN LSH drops a degenerate bucket with an observable count") {
    // 64 identical vectors collide in EVERY band's bucket; the cap must
    // drop that bucket (bounded fan-out) and say so via the observation.
    val clones = (0L until 64L).map(i => (i + 100L, Array(1.0, 0.0, 0.0)))
    val distinct = Seq((0L, Array(0.0, 1.0, 0.0)), (1L, Array(0.0, 0.9, 0.1)))
    val corpus = (clones ++ distinct).toDF("vec_id", "embedding")
    val obs = org.apache.spark.sql.Observation("ann_caps")
    val out = Similarity.annLshTopK(corpus, corpus.filter(col("vec_id") < 2),
        k = 3, bands = 4, bitsPerBand = 4, dims = 3, maxBucket = 16,
        dropStats = Some(obs))
      .collect()
    val m = obs.get
    assert(m("dropped_groups").asInstanceOf[Long] >= 1L,
      s"expected the clone bucket to be dropped, got $m")
    // results remain valid: the un-dropped buckets still pair the queries
    assert(out.forall(r => r.getAs[Long]("query_id") < 2))
  }

  test("IVF train-once/probe-many: identical probes from a saved quantizer") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val queries = emb.filter(col("vec_id") < 8)
    // the centroid TABLE round-trips through its collected array form
    val table = Similarity.trainIvf(emb, nCentroids = 8, iters = 2,
      trainMod = 2)
    val cents = Similarity.centroidArray(table)
    assert(cents.length === 8)
    def probe() = Similarity.ivfTopKWith(emb, queries, k = 5, cents)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
      .collect().map(_.toSeq).sortBy(_.toString)
    val first = probe()
    assert(first.nonEmpty)
    // probing is purely deterministic given the centroids (and training
    // itself is bit-deterministic on the integer grid — trainIvfCentroids)
    assert(probe() === first)
    // the one-shot ivfTopK is exactly train-then-probe composed
    val oneShot = Similarity.ivfTopK(emb, queries, k = 5, nCentroids = 8,
      nProbe = 4, iters = 2, trainMod = 2)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(oneShot === first)
  }

  test("LSH near-dup pairs: recall ≥ 0.8 vs exact, values exact, subset") {
    // sf0.01 embeddings: all 112 exact pairs sit just above the 0.38
    // threshold (max sim 0.513) — the worst case for hyperplane LSH, so
    // this recall bound is the operator's honest floor.
    val emb = spark.read
      .parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    def toMap(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b", "cos_sim")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    val exact = toMap(Similarity.cosineNearDupPairs(emb, 0.38))
    val lsh = toMap(Similarity.cosineNearDupPairsLsh(emb, 0.38))
    assert(exact.nonEmpty)
    // every LSH row is a true pair with the exact cosine value
    lsh.foreach { case (k, v) =>
      assert(exact.get(k).contains(v), s"pair $k: lsh=$v exact=${exact.get(k)}")
    }
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH pair recall $recall below 0.8")
    // both dedup placements are the same operator: identical output
    val late = toMap(Similarity.cosineNearDupPairsLsh(emb, 0.38,
      dedupCandidates = false))
    assert(late === lsh)
  }

  test("LSH near-dup pair dedup shuffles ids only, never embedding arrays") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.types.ArrayType
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val df = Similarity.cosineNearDupPairsLsh(emb, 0.38)
    val dedups = df.queryExecution.optimizedPlan.collect {
      case a: Aggregate
        if a.aggregateExpressions.size == a.groupingExpressions.size => a
    }
    assert(dedups.nonEmpty, "expected a dedup Aggregate in the plan")
    for (a <- dedups; attr <- a.child.output)
      assert(!attr.dataType.isInstanceOf[ArrayType],
        s"dedup input carries array column ${attr.name}")
  }

  test("LSH banding rejects configs that overflow the long packing") {
    val emb = Seq((0L, Array(1.0, 0.0))).toDF("vec_id", "embedding")
    // r = 64: (1L << 64) - 1 == 0 on the JVM → every vector would land in
    // bucket 0 and the cap would silently drop the whole corpus
    intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairsLsh(emb, 0.5, bands = 1, bitsPerBand = 64)
    }
    intercept[IllegalArgumentException] {
      Similarity.annLshTopK(emb, emb, k = 1, bands = 1, bitsPerBand = 64,
        dims = 2)
    }
  }

  test("banding is not capped at 64 total planes (bands × bits > 64)") {
    // 20 bands × 4 bits = 80 hyperplanes — impossible under the old packed-
    // long signature, required so recall (bands) can grow alongside auto-r
    val emb = Seq((0L, Array(1.0, 0.01)), (1L, Array(1.0, 0.012)),
      (2L, Array(-1.0, 0.5))).toDF("vec_id", "embedding")
    val out = Similarity.cosineNearDupPairsLsh(emb, 0.99,
        bands = 20, bitsPerBand = 4, dims = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out === Set((0L, 1L))) // near-identical pair found, far pair not
  }

  test("autoBandBits holds bucket density across corpus sizes") {
    import Similarity.autoBandBits
    // gate scales: sf0.01 (500) and sf0.1 (2000) both derive r=4, the
    // geometry the driver's q46 oracle SQL pins
    assert(autoBandBits(500) === 4)
    assert(autoBandBits(2000) === 4)
    // fleet scales: r grows with log n so n/2^r stays ≤ targetDensity —
    // the round-4 audit's failure case (n=1e9, fixed r=4 → 6e7 ids/bucket)
    for (n <- Seq(1000000L, 1000000000L, 100000000000L)) {
      val r = autoBandBits(n)
      assert(n.toDouble / math.pow(2.0, r.toDouble) <= 256.0,
        s"n=$n r=$r density ${n / math.pow(2, r)}")
    }
    assert(autoBandBits(1000000L) === 12)
    assert(autoBandBits(1000000000L) === 22)
    assert(autoBandBits(Long.MaxValue, 1) === 63) // packing cap
  }

  test("auto-r LSH recall ≥ 0.8 at two corpus sizes") {
    // same-operator recall check at both gate scales under the n-aware
    // DEFAULT geometry (bitsPerBand = 0 → autoBandBits); sf0.1 is 4× the
    // corpus with its own exact baseline
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
      val exact = Similarity.cosineNearDupPairs(emb, 0.38)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val auto = Similarity.cosineNearDupPairsLsh(emb, 0.38)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(exact.nonEmpty)
      assert(auto.subsetOf(exact), s"$sf: false pairs ${auto.diff(exact)}")
      val recall = auto.size.toDouble / exact.size
      assert(recall >= 0.8, s"$sf: auto-r recall $recall below 0.8")
    }
  }

  test("cap drops WARN via DropWarnings when no dropStats is wired") {
    val before = DropWarnings.warned.get()
    // 8 exact duplicates: one minhash bucket of 8 members per band, capped
    // at 4 → every group dropped; no dropStats passed → named observation.
    // Delivery caveat (documented in DropWarnings): CollectMetrics inside a
    // broadcast-exchange subtree never reaches the listener, and an all-
    // dropped run makes the candidate side empty — exactly what AQE loves
    // to broadcast. Pin the deliverable path by disabling broadcast joins
    // for this query; the warning is best-effort by design elsewhere.
    // ... and an all-dropped (empty-result) plan lets AQE propagate the
    // empty relation over the observe node entirely, so keep one small
    // surviving group (the 100/101 pair) alongside the 8 dropped dups
    val dups = (0L until 8L).map(i => (i, "identical text in every row"))
      .toDF("doc_id", "text")
      .union(Seq((100L, "another smaller duplicate group here"),
        (101L, "another smaller duplicate group here")).toDF("doc_id", "text"))
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val prevA = conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      assert(Dedup.minhashLshPairs(dups, maxBucket = 4).count() === 1)
    } finally {
      prev.fold(conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      prevA.fold(conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold"))(
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", _))
    }
    // QueryExecutionListener delivery is async — poll briefly
    val deadline = System.nanoTime() + 5000000000L
    while (DropWarnings.warned.get() === before &&
      System.nanoTime() < deadline) Thread.sleep(50)
    assert(DropWarnings.warned.get() > before,
      "expected a cap-drop warning from the unwatched minhash run")
  }

  test("near-dup pairs by cosine threshold") {
    val vecs = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.999, 0.01)), (2L, Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(vecs, 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("minhashLshAdmit: probing a saved index equals the batch LSH " +
      "restricted to new-by-existing pairs; build-time cap drops " +
      "buckets; signature joins never broadcast") {
    val existing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bend"),
      (4L, "der schnelle braune fuchs springt und ist nicht mit dem hund"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (11L, "completely unrelated material about catalyst optimizer rules"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("minhash-idx").toString
    Dedup.saveMinhashIndex(existing, dir)
    val admit = Dedup.minhashLshAdmit(batch, dir, estThreshold = 0.5)
    val got = admit.collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("old_id"),
        r.getAs[Double]("est_jaccard"))).toSet

    // reference: the batch operator over the union, pairs restricted to
    // (new, existing) — same signatures, same banding, same scoring
    val newIds = Set(10L, 11L)
    val want = Dedup.minhashLshPairs(existing.unionAll(batch),
        estThreshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("est_jaccard")))
      .collect {
        case (a, b, j) if newIds(b) && !newIds(a) => (b, a, j)
        case (a, b, j) if newIds(a) && !newIds(b) => (a, b, j)
      }.toSet
    assert(got === want)
    assert(got.exists { case (n, o, _) => n == 10L && (o == 1L || o == 2L) },
      s"planted near-dup must match: $got")
    assert(!got.exists(_._1 == 11L), "unique doc must be admissible")

    // build-time cap: maxBucket=0 empties the index -> everything admits
    val dir0 = java.nio.file.Files
      .createTempDirectory("minhash-idx0").toString
    Dedup.saveMinhashIndex(existing, dir0, maxBucket = 0)
    assert(Dedup.minhashLshAdmit(batch, dir0).isEmpty)

    // the signature joins are pinned shuffle_hash (arrays never
    // broadcast); only the id-triple probe join may broadcast
    val plan = admit.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan)
  }

  test("unigramNll matches a hand-rolled add-one unigram model; rare " +
      "vocabulary scores higher NLL than common") {
    val corpus = Seq(
      (1L, "the cat and the dog"),
      (2L, "the cat"),
      (3L, "zyzzyva qwerty"),      // rare vocabulary -> high NLL
      (4L, "   "))                 // whitespace-only -> absent
      .toDF("doc_id", "text")
    val got = TextStats.unigramNll(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_nll"))).toMap
    val toks = Map(1L -> Seq("the", "cat", "and", "the", "dog"),
      2L -> Seq("the", "cat"), 3L -> Seq("zyzzyva", "qwerty"))
    val counts = toks.values.flatten.groupBy(identity)
      .map { case (w, ws) => w -> ws.size }
    val n = counts.values.sum.toDouble
    val v = counts.size.toDouble
    def nll(id: Long): Double = {
      val ts = toks(id)
      val s = ts.map(w => -math.log((counts(w) + 1.0) / (n + v))).sum
      math.rint(s / ts.size * 10000.0) / 10000.0
    }
    assert(got.keySet === Set(1L, 2L, 3L),
      "tokenless docs must be absent")
    Seq(1L, 2L, 3L).foreach { id =>
      assert(got(id)._1 === toks(id).size.toLong, s"doc $id tokens")
      assert(math.abs(got(id)._2 - nll(id)) < 1e-9, s"doc $id nll")
    }
    assert(got(3L)._2 > got(1L)._2,
      "rare vocabulary must score higher NLL than common")
  }

  test("bm25TopK matches a hand-rolled BM25 and ranks without a window") {
    val corpus = Seq(
      (1L, "quick fox and quick dog"),
      (2L, "fox"),
      (3L, "the dog sleeps all day long here"),
      (4L, "nothing relevant whatsoever in this one"),
      (5L, "quick quick quick fox fox dog"))
      .toDF("doc_id", "text")
    val queries = Seq(0 -> Seq("quick", "fox"), 1 -> Seq("dog"),
      2 -> Seq("absent"))
    val k1 = 1.2; val b = 0.75
    val out = TextStats.bm25TopK(corpus, queries, k = 3, k1 = k1, b = b)
    // reference: plain-scala BM25 over the same corpus
    val toks = Map(1L -> Seq("quick", "fox", "and", "quick", "dog"),
      2L -> Seq("fox"), 3L -> Seq("the", "dog", "sleeps", "all", "day",
        "long", "here"),
      4L -> Seq("nothing", "relevant", "whatsoever", "in", "this", "one"),
      5L -> Seq("quick", "quick", "quick", "fox", "fox", "dog"))
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    def df(t: String) = toks.values.count(_.contains(t)).toDouble
    def score(id: Long, ts: Seq[String]): Double = {
      val raw = ts.filter(t => toks(id).contains(t)).map { t =>
        val tf = toks(id).count(_ == t).toDouble
        val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
        idf * (tf * (k1 + 1.0)) /
          (tf + k1 * ((1.0 - b) + b * toks(id).size / avgdl))
      }.sum
      math.rint(raw * 10000.0) / 10000.0  // spark round() HALF_UP ~ rint
    }
    val want = queries.flatMap { case (qid, ts) =>
      toks.keys.toSeq.map(id => (qid, id, score(id, ts)))
        .filter(_._3 > 0.0)
        .sortBy { case (_, id, s) => (-s, id) }.take(3).zipWithIndex
        .map { case ((q, id, s), i) => (q, i + 1, id, s) }
    }.toSet
    val got = out.collect().map(r => (r.getAs[Int]("query_id"),
      r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
      r.getAs[Double]("score"))).toSet
    assert(got === want)
    // the 'absent' query term reaches no document
    assert(!got.exists(_._1 == 2))
    // rank path is the bounded top-k aggregate, not a window sort
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("graft_collect_topk"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
