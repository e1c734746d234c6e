package graft.textops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID, document
  * fingerprinting.
  *
  * Everything here is a pure Column expression over the codegen'd builtins
  * (split / filter / aggregate / regexp_*) — no UDFs, no shuffles, each
  * operator is an embarrassingly-parallel projection that scales linearly
  * with input splits. Language profiles are literal arrays folded into the
  * plan (broadcast-free: they are constants, not data).
  */
object TextStats {

  /** Whitespace word tokenization (lowered). Byte-exact to
    * `split(lower(trim(text)), "\\s+")` — the split is the native
    * one-pass [[graft.functions.TextExprs.WhitespaceSplit]] (Java `\s`
    * is six ASCII bytes; the regex engine was the corpus hot loop),
    * while lower/trim stay the Catalyst builtins they always were.
    */
  def words(text: Column): Column =
    graft.functions.TextExprs.whitespaceSplit(lower(trim(text)))

  /** Whitespace token count — `size(words(text))` semantics without
    * materializing the token array
    * ([[graft.functions.TextExprs.WhitespaceCount]]; lowering cannot
    * change the count, so the trim feeds it directly). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(graft.functions.TextExprs.whitespaceCount(trim(text)))

  /** BPE-ish sub-word tokenization: letter runs, digit runs, and single
    * punctuation marks — the shape a byte-pair tokenizer's pre-tokenizer
    * produces. `regexp_extract_all` is codegen'd; no UDF.
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** English stopword profile used for the quality score. */
  val enStopwords: Seq[String] = Seq(
    "the", "and", "of", "to", "in", "is", "that", "it", "for", "on",
    "with", "as", "a", "an", "at", "by", "be", "this", "are", "was")

  private def countIn(ws: Column, set: Seq[String]): Column =
    size(filter(ws, w => array_contains(lit(set.toArray), w)))

  /** Punctuation character count (explicit class, dialect-portable). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:'\"()\\[\\]-]", ""))

  /** Heuristic document quality signals: length, token stats, punctuation /
    * digit / stopword ratios. Mirrors the usual pre-training quality
    * filters (C4/Gopher-style rules) as one wide projection.
    */
  def qualitySignals(text: Column): Seq[(String, Column)] = {
    val ws = words(text)
    val nChars = length(text)
    val nWords = size(ws)
    Seq(
      "n_chars" -> nChars,
      "n_words" -> nWords,
      "mean_word_len" ->
        (nChars.cast("double") / when(nWords === 0, 1).otherwise(nWords)),
      "punct_ratio" ->
        (punctCount(text).cast("double") /
          when(nChars === 0, 1).otherwise(nChars)),
      "digit_ratio" ->
        ((nChars - length(regexp_replace(text, "[0-9]", ""))).cast("double") /
          when(nChars === 0, 1).otherwise(nChars)),
      "stopword_ratio" ->
        (countIn(ws, enStopwords).cast("double") /
          when(nWords === 0, 1).otherwise(nWords)))
  }

  /** Composite quality score in [0,1]: stopword presence up-weights,
    * excessive punctuation/digits down-weight, degenerate length zeroes.
    */
  def qualityScore(text: Column): Column = {
    val s = qualitySignals(text).toMap
    val lengthOk = when(s("n_words") >= 5 && s("n_chars") >= 20, 1.0)
      .otherwise(0.2)
    val base = lit(0.5) + s("stopword_ratio") -
      s("punct_ratio") * 2 - s("digit_ratio")
    greatest(lit(0.0), least(lit(1.0), base * lengthOk))
  }

  /** Per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Order = deterministic tie-break priority.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "une", "pour", "que", "des"),
    "es" -> Seq("el", "los", "las", "es", "una", "por", "para", "con", "del", "se"))

  /** Language ID: argmax of per-profile stopword hit counts, ties resolved
    * by profile order, all-zero → "und" (undetermined). One projection, no
    * shuffle. All profile counts accumulate in ONE pass over the word array
    * via the native [[graft.functions.ArrayExprs.LangIdExpr]]; the
    * SQL-expressible `greatest + CASE` formulation it replaces (kept below
    * as [[langIdHof]] — it is what the DuckDB oracle runs, and the spec
    * asserts parity) re-evaluates the word split once per profile per CASE
    * branch.
    */
  def langId(text: Column): Column =
    // the native expression is null-intolerant (NULL text → NULL); the
    // HOF/CASE formulation and the DuckDB oracle both fall through to
    // "und" — keep parity on NULL rows
    coalesce(graft.functions.ArrayExprs.langId(words(text), langProfiles),
      lit("und"))

  /** HOF/CASE formulation of [[langId]] — oracle-shaped reference
    * implementation, used by the parity spec.
    */
  def langIdHof(text: Column): Column = {
    val ws = words(text)
    val scores = langProfiles.map { case (lang, set) => lang -> countIn(ws, set) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val chain = scores.foldLeft(when(best === 0, "und")) {
      case (acc, (lang, score)) => acc.when(score === best, lang)
    }
    chain.otherwise("und")
  }

  /** Exact-content fingerprint: sha256 over whitespace-normalized lowered
    * text — the key for exact dedup.
    */
  def contentFingerprint(text: Column): Column =
    sha2(concat_ws(" ", words(text)), 256)

  /** Rolling polynomial fingerprints over word w-shingles (winnowing-style
    * document fingerprinting): hash each w-gram, keep the per-document
    * minimum k — a compact locality signature. Deterministic (no
    * Math.random): fixed base/modulus.
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.ArrayExprs.wordShingles(words(text), n)

  /** xxhash64-based shingle fingerprint set (bottom-k sketch of w-grams). */
  def docFingerprint(text: Column, n: Int = 3, k: Int = 8): Column =
    slice(array_sort(transform(array_distinct(shingles(text, n)),
      s => xxhash64(s))), 1, k)

  /** TRUE rolling-hash winnowing fingerprints over character k-grams
    * ([[graft.functions.TextExprs.WinnowingFp]] — Schleimer et al. 2003):
    * the sorted distinct window-minimum Karp–Rabin hashes. Unlike
    * [[docFingerprint]]'s global bottom-k sketch, winnowing is LOCAL —
    * any shared passage of length ≥ w+k−1 chars yields a shared
    * fingerprint, so it detects contained/partial copies that
    * whole-document resemblance sketches dilute away. Text is lowered and
    * trimmed first (same normalization as every other text op here).
    */
  def winnowingFingerprint(text: Column, k: Int = 8, w: Int = 8): Column =
    graft.functions.TextExprs.winnowingFp(lower(trim(text)), k, w)

  /** ROBUST [[winnowingFingerprint]]: `array<struct<fp, pos>>` — each
    * selected window-minimum with the (0-based) gram position it covers,
    * ordered by position ([[graft.functions.TextExprs.WinnowingFpPos]]).
    * The variant contamination checks consume: shared fps LOCALIZE the
    * shared passage on both sides.
    */
  def winnowingFingerprintPos(text: Column, k: Int = 8, w: Int = 8): Column =
    graft.functions.TextExprs.winnowingFpPos(lower(trim(text)), k, w)

  /** Repetition statistics — the Gopher-family quality filters (Rae et al.
    * 2021 §A.1.1: documents dominated by repeated phrases are low-quality
    * and removed before training):
    *
    *   - `dup_word_frac` / `dup_3gram_frac`: occurrence-weighted fraction
    *     of duplicated words / word 3-grams, 1 − distinct/total — a
    *     row-local `array_distinct` projection;
    *   - `top_2gram_frac`: the most frequent 2-gram's share of all
    *     2-grams.
    *
    * All four signals come from ONE native expression
    * ([[graft.functions.ArrayExprs.RepetitionSignals]] — O(len) hash
    * counting over interned token ids, no per-gram strings): the whole
    * operator is a single shuffle-free projection. Earlier rounds
    * computed the 2-gram mode with explode → per-(id, gram) count →
    * max/sum → join-back (3 shuffles for a row-local statistic, guarding
    * against the O(len²) HOF formulation) and the dup fracs with
    * WordShingles(3) string arrays + array_distinct; the fused pass
    * measured 1.39 → 0.53 s at sf0.1 (the residual is the scan + the
    * regex tokenization + the gate's orderBy, not gram counting).
    *
    * Empty/whitespace-only text yields zeros across the board. Returns
    * (idCol, n_words, dup_word_frac, dup_3gram_frac, top_2gram_frac),
    * fractions rounded to 4 dp (the driver-gate convention).
    */
  def repetitionStats(df: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val empty = length(trim(col(textCol))) === 0
    // bind the struct as a real column: multiply-referenced non-cheap
    // aliases survive CollapseProject as separate projections, so the
    // signals pass runs once per row, not once per output column
    df.withColumn("graft_rep",
        graft.functions.ArrayExprs.repetitionSignals(
          words(col(textCol))))
      .select(col(idCol),
        when(empty, 0L).otherwise(col("graft_rep.n_words"))
          .as("n_words"),
        round(when(empty, 0.0).otherwise(col("graft_rep.dup_word_frac")), 4)
          .as("dup_word_frac"),
        round(when(empty, 0.0).otherwise(col("graft_rep.dup_3gram_frac")), 4)
          .as("dup_3gram_frac"),
        round(when(empty, 0.0).otherwise(col("graft_rep.top_2gram_frac")), 4)
          .as("top_2gram_frac"))
  }

  /** Corpus vocabulary extraction — the tokenizer-training prep step
    * (BPE/unigram trainers start from exactly this table): the `topK`
    * most frequent whitespace terms with occurrence and document
    * frequencies, deterministically tie-broken (count desc, term asc) so
    * the selected SET is reproducible run to run and engine to engine.
    *
    * Scale shape: explode → ONE hash aggregation keyed by term computes
    * both frequencies (`count_distinct` runs as the standard two-phase
    * expand — partial aggregates absorb hot terms map-side, so "the" at
    * 100 TB reaches its reducer pre-combined, never as raw rows), then
    * the top-k is a `TakeOrderedAndProject` — per-partition heaps of k
    * rows to the driver, NEVER a global sort of the term table.
    */
  def vocabulary(df: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      topK: Int = 500): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), explode(words(col(textCol))).as("term"))
      .where(col("term") =!= "")
      .groupBy("term")
      .agg(count(lit(1)).as("n_occ"),
        count_distinct(col(idCol)).as("n_docs"))
      .orderBy(col("n_occ").desc, col("term").asc)
      .limit(topK)

  /** Cross-document duplicated n-gram stats — the CORPUS-level Gopher
    * repetition signal (the row-local variants live in
    * [[repetitionStats]]): for each document, how many of its distinct
    * word-`n`-grams also appear in ≥ `minDocs` documents corpus-wide, and
    * the fraction. Pipelines drop documents whose `common_frac` is high —
    * boilerplate (headers, navigation, license blocks) that row-local
    * repetition can't see because each copy occurs once per document.
    *
    * Shape: distinct-shingle explode → shingle-keyed partial-agg document
    * frequency → one join BACK on the shingle key (co-partitioned with the
    * groupBy that produced it — the Exchange is reused, not repeated) →
    * per-doc partial-agg counts. Shuffles carry (doc_id, shingle) pairs
    * and (shingle, df) pairs — never document text. The ratio divides two
    * exact longs, so the rounded value is engine-portable by construction.
    */
  def crossDocNgramStats(df: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, minDocs: Long = 5): org.apache.spark.sql.DataFrame = {
    val sh = df.select(col(idCol),
      explode(array_distinct(shingles(col(textCol), n))).as("shingle"))
    val dfT = sh.groupBy("shingle").agg(count(lit(1)).as("graft_df"))
    // shuffle_hash, NOT broadcast: this is a self-join whose whole point
    // is that both consumers of `sh` share ONE shingle-keyed Exchange
    // (the explode — the expensive stage — runs once). A broadcast of
    // dfT severs that reuse: the probe side re-derives scan→shingle→
    // explode from scratch and every task probes a corpus-vocabulary
    // hash relation (measured at the 20× smoke when AQE's 64 MB
    // threshold started broadcasting the ~10⁶-row df table: 2.6 s →
    // 6-10 s). Co-partitioned hash join keeps the reuse and, unlike
    // sort-merge, pays no per-side sort; per-partition build is
    // |vocabulary|/partitions — scale-safe where a broadcast build of
    // the whole vocabulary is not.
    sh.join(dfT.hint("shuffle_hash"), "shingle")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum((col("graft_df") >= minDocs).cast("long")).as("n_common"))
      .withColumn("common_frac",
        round(col("n_common").cast("double") / col("n_shingles"), 4))
  }

  /** TF-IDF feature extraction: each document's `k` highest-scoring terms
    * with `score = tf · ln(N / df)` (raw term frequency, plain inverse
    * document frequency, N = ALL corpus documents including token-less
    * ones). Ranking runs on the 4-decimal-ROUNDED score with the term as
    * tie-break — a total order two engines reproduce even when their
    * `ln` libms differ in the last ulp.
    *
    * Shape: per-doc tf as a row-local histogram projection
    * ([[graft.functions.ArrayExprs.ArrayHistogram]] — the corpus-side
    * `groupBy(id, term)` Exchange is gone; one exploded row per DISTINCT
    * (doc, term)), term-keyed partial-agg [df], a join of the per-term
    * df table back onto tf, the corpus count as a broadcast scalar
    * (in-plan, never a driver action), and one window top-k per doc. The
    * df join carries NO broadcast hint: the df table is O(vocabulary),
    * which at web-corpus scale is 10⁸–10⁹ terms — a forced broadcast is
    * a guaranteed executor OOM there. Catalyst broadcasts it when it
    * measures small (AQE, test scale) and falls back to a shuffle join
    * on `term` otherwise. The only wide exchanges carry (id, term, tf)
    * triples — never document text.
    */
  def tfidfTopTerms(df: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 3): org.apache.spark.sql.DataFrame =
    { val (r, release) = tfidfTopTermsReleasable(df, idCol, textCol, k)
      graft.CacheHandles.register(release); r }

  /** [[tfidfTopTerms]] plus a release handle freeing the persisted tf
    * frame (see [[unigramNllReleasable]] for why the persist exists —
    * the same multi-consumer tokenize-once argument). */
  def tfidfTopTermsReleasable(df: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 3): (org.apache.spark.sql.DataFrame, () => Unit) = {
    import org.apache.spark.sql.expressions.Window
    val tf = perDocTf(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count_distinct(col(idCol)).as("graft_n"))
    val scored = tf
      .join(dfT, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("graft_n").cast("double") / col("df")), 4))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    val out = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("score"))
    (out, () => { tf.unpersist(blocking = false); () })
  }

  /** One distinct (doc, term, tf) row per document term — the shared
    * row-local tokenize+histogram pass behind tf-idf, the unigram LM and
    * BM25. The frame is meant to be PERSISTED by its caller: it always
    * feeds ≥2 plan consumers (a term-keyed model/df table AND a scoring
    * join), and column pruning specializes each consumer's copy of this
    * subtree (one keeps `idCol`, one drops it), so no exchange
    * canonicalizes equal and ReuseExchange cannot anchor — without a
    * cache the corpus TOKENIZES once per consumer (measured 3× on q114;
    * the plan-audit pin holds the count at one).
    */
  private def perDocTf(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol),
        explode(graft.functions.ArrayExprs.arrayHistogram(
          words(col(textCol)))).as("h"))
      .select(col(idCol), col("h.term").as("term"), col("h.tf").as("tf"))
      .where(col("term") =!= "")

  /** Unigram language-model negative log-likelihood per document — the
    * CCNet/C4 perplexity-filter technique (Wenzek et al. 2020 rank web
    * text by KenLM perplexity; the unigram-with-add-one-smoothing model
    * here is its simplest deterministic instance, trained on the corpus
    * itself): token w scores −ln((count(w) + 1)/(N + V)), a document
    * reports its token count and MEAN token NLL — high avg_nll = rare
    * vocabulary = boilerplate/garbage under the corpus distribution.
    * Composable with the mixture/budget/stratified operators as the
    * ranking signal.
    *
    * Shape at scale: per-doc tf is a row-local PROJECTION
    * ([[graft.functions.ArrayExprs.ArrayHistogram]] — one histogram pass
    * per document, exploded to one row per DISTINCT (doc, term)), so the
    * corpus-side `groupBy(doc, term)` Exchange the naive explode plan
    * pays is gone entirely; the unigram table aggregates map-side-
    * combined from the same stream (O(vocabulary), NOT broadcast — the
    * tfidf df-table rule) and joins back term-keyed. The scalar (N, V)
    * pair rides an in-plan broadcast. Only (id, term, tf) triples cross
    * exchanges; text never does.
    */
  def unigramNll(docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text")
      : org.apache.spark.sql.DataFrame =
    { val (r, release) = unigramNllReleasable(docs, idCol, textCol)
      graft.CacheHandles.register(release); r }

  /** [[unigramNll]] plus a release handle freeing the persisted tf
    * frame. The persist is the TOKENIZE-ONCE guarantee, not a cache
    * nicety: tf feeds three consumers (the unigram model, its (N, V)
    * scalars, the scoring join) whose column-pruned copies of the
    * tokenize subtree never canonicalize equal (see [[perDocTf]]), so
    * without it the corpus tokenizes three times per action. */
  def unigramNllReleasable(docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text")
      : (org.apache.spark.sql.DataFrame, () => Unit) = {
    val tf = perDocTf(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uni = tf.groupBy("term").agg(sum("tf").as("cnt"))
    val stats = uni.agg(sum(col("cnt")).cast("double").as("graft_n"),
      count(lit(1)).cast("double").as("graft_v"))
    val out = tf.join(uni, "term")
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tokens"),
        round(
          sum(col("tf") * -log((col("cnt") + lit(1.0)) /
            (col("graft_n") + col("graft_v")))) / sum(col("tf")),
          4).as("avg_nll"))
    (out, () => { tf.unpersist(blocking = false); () })
  }

  /** BM25 top-k retrieval (Robertson & Zaragoza 2009, the Lucene
    * `ln(1 + (N − df + 0.5)/(df + 0.5))` idf variant — always positive):
    * score every document against a small literal query batch and return
    * the k best per query, ranked on the ROUNDED score with a `doc_id`
    * tiebreak (the q67 libm-proof total order: `ln` may differ by an ulp
    * across engines, so ranking runs on the 4-decimal value both engines
    * agree on).
    *
    * Shape at scale: the corpus is scanned twice — once for the global
    * (N, Σdl) scalar pair (one agg, broadcast in-plan), once for
    * tokenization — and the query-term `isin` filter runs INSIDE the
    * explode stage, so only (doc, query-term) hits survive to the tf
    * shuffle; document text never rides an exchange. df and the query
    * table are O(|query terms|) — genuinely tiny, broadcast by
    * construction (unlike tfidf's full-vocabulary df, which must not
    * be). Per-query top-k is [[graft.functions.AggExprs.CollectTopK]]:
    * O(k) state per query with map-side combine — a window
    * `row_number()` would funnel every candidate row of a query to one
    * partition and sort it, the classic few-hot-groups skew.
    */
  def bm25TopK(docs: org.apache.spark.sql.DataFrame,
      queries: Seq[(Int, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text")
      : org.apache.spark.sql.DataFrame =
    { val (r, release) =
        bm25TopKReleasable(docs, queries, k, k1, b, idCol, textCol)
      graft.CacheHandles.register(release); r }

  /** [[bm25TopK]] plus a release handle freeing the persisted hits
    * frame — the tokenize-once guarantee ([[perDocTf]] scaladoc): the
    * (doc, query-term) hits feed both the df table and the scoring
    * join, and the persisted frame is O(hits), tiny by construction. */
  def bm25TopKReleasable(docs: org.apache.spark.sql.DataFrame,
      queries: Seq[(Int, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text")
      : (org.apache.spark.sql.DataFrame, () => Unit) = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "queries must be a non-empty batch of non-empty term lists")
    // the tokenizer lowercases ([[words]]), so an uppercase query term
    // would silently match NOTHING — normalize here instead of failing
    // the user
    val norm = queries.map { case (qid, ts) =>
      qid -> ts.map(_.toLowerCase) }
    val spark = docs.sparkSession
    import spark.implicits._
    val qTerms = norm.flatMap(_._2).distinct
    val q = broadcast(norm
      .flatMap { case (qid, ts) => ts.distinct.map(t => (qid, t)) }
      .toDF("query_id", "term"))
    val stats = docs.agg(
      count(lit(1)).cast("double").as("graft_n"),
      sum(tokenCount(col(textCol))).cast("double").as("graft_toks"))
    // the token array is materialized ONCE and the Generate explodes the
    // row-local histogram over the bare attribute (the q81 shape — the
    // plan audit rejects a tokenizer re-evaluated above its own
    // Generate); per-doc tf is the histogram projection, so NO corpus-
    // side groupBy exchange exists at all — the query-term isin filter
    // prunes the exploded (term, tf) stream to O(hits) rows. dl =
    // non-empty token count over the same array ≡ tokenCount(text) (a
    // trimmed split emits "" only for whitespace-only text, which
    // tokenCount defines as 0)
    val tf = docs
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("ws"))
      .select(col("doc_id"),
        size(filter(col("ws"), w => w =!= "")).as("dl"),
        explode(graft.functions.ArrayExprs.arrayHistogram(col("ws")))
          .as("h"))
      .select(col("doc_id"), col("dl"),
        col("h.term").as("term"), col("h.tf").as("tf"))
      .where(col("term").isin(qTerms: _*))
      // persisted (tokenize-once, [[perDocTf]] scaladoc): tf feeds the
      // df table and the scoring join; the cached frame holds only the
      // query-term HITS, while the alternative is a second full corpus
      // tokenize per consumer
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // every float literal below is the SAME Scala-computed double the
    // oracle interpolates (shortest round-trip repr), so both engines
    // evaluate an identical IEEE expression tree term-by-term; only the
    // cross-term SUM order and ln's last ulp differ — absorbed by the
    // 4-decimal round
    val avgdl = col("graft_toks") / col("graft_n")
    val idf = log(lit(1.0) +
      (col("graft_n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    val perDoc = tf.join(broadcast(dfT), "term")
      .join(q, "term")
      .crossJoin(broadcast(stats))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(contrib), 4).as("score"))
    val out = perDoc.groupBy("query_id")
      .agg(graft.functions.AggExprs.collectTopK(
        struct(col("score"), (-col("doc_id")).as("nd"), col("doc_id")),
        k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("rk", "t")))
      .select(col("query_id"), (col("rk") + 1).cast("int").as("rank"),
        col("t.doc_id").as("doc_id"), col("t.score").as("score"))
    (out, () => { tf.unpersist(blocking = false); () })
  }
}
