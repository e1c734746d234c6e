package graft

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.textops.{Dedup, Similarity, TextStats}

/** Scale-validation harness: multiplies the documents/embeddings corpora
  * Nx with deterministic perturbations and drives the dedup/similarity/
  * text-stats family through the result, printing rows and wall-clock per
  * operator. This is the empirical check behind the 100 TB posture claims:
  * the multiplied corpus is intentionally ADVERSARIAL for bucketed
  * operators — every document gains N-1 near-duplicates, so LSH buckets,
  * shingle posting lists and SimHash chunks all grow N-fold, exercising
  * the `maxBucket` caps and the id-only shuffle paths under real volume.
  *
  * Usage: SPARK_GRAFT_SCALE=20 runMain graft.ScaleSmoke
  * (20x sf0.1 = 100k documents / 100k embeddings; all operators must
  * complete without OOM and roughly linearly vs the 1x timings.)
  */
object ScaleSmoke {

  def scaledDocs(spark: SparkSession, sfDir: String, mult: Int): DataFrame = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val copies = spark.range(mult.toLong).toDF("copy")
    // copy 0 is the original; others append a small deterministic suffix →
    // near-duplicates (high but not perfect Jaccard), the worst case for
    // candidate-pair fan-out
    base.crossJoin(broadcast(copies))
      .select(
        (col("doc_id") * mult + col("copy")).as("doc_id"),
        when(col("copy") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" v"), col("copy"))).as("text"))
  }

  def scaledEmbeddings(spark: SparkSession, sfDir: String,
      mult: Int): DataFrame = {
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>")
        .as("embedding"))
    val copies = spark.range(mult.toLong).toDF("copy")
    // jitter one dimension per copy → tight clusters of near-identical
    // vectors (the ANN bucket stress shape)
    base.crossJoin(broadcast(copies))
      .select(
        (col("vec_id") * mult + col("copy")).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + when(i === pmod(col("copy"), lit(64)),
            col("copy").cast("double") / 1000.0).otherwise(0.0))
          .as("embedding"))
  }

  private def time(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    val n = df.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[scale] $name%-28s $n%10d rows  $sec%8.2f s")
  }

  /** Like [[time]] but also prints the operator's posting-list drop stats
    * (CollectMetrics): a nonzero `dropped_groups` means the cap fired and
    * recall is bounded, not silent.
    */
  private def timeObserved(name: String, obs: Observation)(
      df: => DataFrame): Unit = {
    time(name)(df)
    val m = obs.get
    if (m.isEmpty)
      // CollectMetrics that execute inside a broadcast-exchange subtree
      // (AQE may broadcast an empty candidate side) don't reach the
      // Observation listener — absence of metrics, not absence of caps
      println(s"[scale]   ${name}_caps: metrics unavailable " +
        "(observed node ran inside a broadcast subtree)")
    else
      println(s"[scale]   ${name}_caps: " +
        s"dropped_groups=${m("dropped_groups")} " +
        s"max_group=${m("max_group")} n_groups=${m("n_groups")}")
  }

  def main(args: Array[String]): Unit = {
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE", "20").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-smoke")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // repartition: the scaled corpus inherits ONE split from the single
    // testdata parquet file, which would serialize every non-shuffle stage
    // (e.g. a verification join against the cached corpus) onto one core —
    // a real 100 TB corpus arrives in thousands of splits, so simulate that
    val docs = scaledDocs(spark, sfDir, mult).repartition(cpus.toInt).persist()
    val embs = scaledEmbeddings(spark, sfDir, mult)
      .repartition(cpus.toInt).persist()
    println(s"[scale] corpus: ${docs.count()} docs, " +
      s"${embs.count()} embeddings (${mult}x $sfDir)")

    time("exact_dedup")(Dedup.exact(docs))
    time("minhash_lsh_pairs")(
      Dedup.minhashLshPairs(docs, estThreshold = 0.8))
    time("simhash_pairs")(Dedup.simhashPairs(docs, maxDist = 3))
    val prefixObs = Observation("jaccard_prefix_caps")
    timeObserved("jaccard_prefix_pairs", prefixObs)(
      Dedup.ngramJaccardPairsPrefix(docs, threshold = 0.9,
        dropStats = Some(prefixObs)))
    // posting-list variant with a deliberately tight cap: on this corpus
    // every shingle group holds ~mult near-identical members, so a cap of
    // mult/2 fires on most groups — values must stay exact regardless
    val cappedObs = Observation("jaccard_capped_caps")
    timeObserved("jaccard_pairs_capped", cappedObs)(
      Dedup.ngramJaccardPairs(docs, threshold = 0.9,
        maxPostingList = math.max(2, mult / 2), dropStats = Some(cappedObs)))
    time("ann_lsh_topk")(Similarity.annLshTopK(
      embs, embs.filter(col("vec_id") < 64), k = 5))
    // jittered copies are ~identical vectors (cos ≈ 0.9999) → they collide
    // even in wide bands. Geometry is the n-aware DEFAULT (autoBandBits:
    // 100k vectors → 9-bit bands → 512 buckets/band, expected density
    // ~256) — the "grow r with log n" rule as code, exercised for real;
    // corpusCount is passed the way a fleet pipeline would (table size is
    // known), skipping the extra count job
    val nEmb = embs.count()
    val lshPairObs = Observation("lsh_near_dup_caps")
    timeObserved("lsh_near_dup_pairs", lshPairObs)(
      Similarity.cosineNearDupPairsLsh(embs, threshold = 0.98,
        bands = 4, corpusCount = Some(nEmb), dropStats = Some(lshPairObs)))
    time("ivf_topk")(Similarity.ivfTopK(
      embs, embs.filter(col("vec_id") < 64), k = 5, trainMod = mult))
    time("langid_quality")(docs.select(
      TextStats.langId(col("text")).as("lang"),
      TextStats.qualityScore(col("text")).as("q"))
      .groupBy("lang").agg(avg("q").as("avg_q")))
    // per-doc rolling-hash fingerprinting is a pure projection — must
    // scale linearly with the corpus, no caps involved
    time("winnowing_fp")(docs.select(col("doc_id"),
      explode(TextStats.winnowingFingerprint(col("text"))).as("fp")))

    spark.stop()
  }
}
