package graft.textops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Cross-corpus passage-overlap detection ("decontamination"): find
  * (docA, docB) pairs sharing at least `minShared` winnowing fingerprints
  * — the standard check that a training corpus does not contain an eval
  * set's passages (n-gram-overlap decontamination à la GPT-3/The Pile,
  * with the SIGMOD'03 winnowing guarantee that any shared run of
  * ≥ w+k−1 characters selects ≥1 common fingerprint, so long verbatim
  * passages CANNOT be missed while the index stays ~|text|/w per doc).
  *
  * Scale posture: fingerprints are one O(len) projection per side
  * ([[TextStats.winnowingFingerprint]] — rolling hash, no shuffle); the
  * only shuffles are keyed on the 64-bit fingerprint (id+fp pairs, never
  * text) and on the (idA, idB) pair key for the count. Ubiquitous
  * fingerprints (license boilerplate in half the corpus) are the hot-key
  * hazard: each side's per-fingerprint posting list is capped through
  * [[Dedup.cappedGroups]] (bounded buffers, observable drops) — a
  * boilerplate fingerprint is not contamination evidence, so dropping it
  * trades bounded recall on exactly the matches that carry no signal,
  * same posture as every banded dedup operator here.
  */
object Overlap {

  /** Pairs (idA from `a`, idB from `b`) with `n_shared` ≥ `minShared`
    * common winnowing fingerprints. Fingerprints are distinct per doc, so
    * `n_shared` = |shared fingerprint set|. `dropStatsA`/`dropStatsB`
    * observe each side's posting-list cap (WARN-logged otherwise).
    */
  def fingerprintOverlap(a: DataFrame, b: DataFrame, minShared: Int = 2,
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 8, w: Int = 8, maxPostingList: Int = 1 << 14,
      dropStatsA: Option[Observation] = None,
      dropStatsB: Option[Observation] = None): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    def posting(df: DataFrame, out: String,
        obs: Option[Observation]): DataFrame =
      Dedup.cappedGroups(
        df.select(col(idCol).as(out),
          explode(TextStats.winnowingFingerprint(col(textCol), k, w))
            .as("fp")),
        Seq("fp"), col(out), maxPostingList, obs, minSize = 1)
    // join the two capped per-fingerprint group frames, then explode both
    // member lists: within-fingerprint A×B candidate pairs, bounded by
    // cap² per fingerprint
    posting(a, "id_a", dropStatsA)
      .join(posting(b, "id_b", dropStatsB)
        .withColumnRenamed("members", "members_b"), "fp")
      .select(explode(col("members")).as("id_a"), col("members_b"))
      .select(col("id_a"), explode(col("members_b")).as("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** EXACT n-gram decontamination — the GPT-3/PaLM family rule as
    * published: a training document is contaminated iff it shares at
    * least one EXACT word-n-gram (canonically n=13) with the benchmark
    * corpus. Complements [[fingerprintOverlap]]: winnowing SAMPLES
    * fingerprints (guaranteed only for runs ≥ w+k−1 chars, pair-level
    * evidence), while this is the exhaustive membership test against
    * every benchmark n-gram — no sampling, no cap, no misses.
    *
    * The 100 TB shape is the asymmetry: benchmark suites are tiny
    * (thousands of documents), so their distinct n-gram set builds in one
    * small aggregation and BROADCASTS; the training corpus is scanned
    * once, each doc's distinct n-grams probed against the broadcast hash
    * relation — the train side never shuffles at all (the per-doc
    * match count partial-aggregates against the scan, one tiny grouped
    * exchange of (doc_id, n) rows; the spec pins the broadcast plan). No
    * posting lists, no hot-key hazard: a boilerplate n-gram costs one
    * broadcast-set entry, not a posting-list explosion.
    *
    * Returns one row per CONTAMINATED training doc: (idCol,
    * n_matched_grams, n_grams) — n_matched distinct n-grams of the doc
    * found in the benchmark set, out of its n_grams distinct total.
    * Shingle semantics are [[TextStats.shingles]]' (a doc shorter than n
    * words contributes its whole text as one gram), mirrored exactly by
    * the oracle.
    */
  def exactNgramContamination(train: DataFrame, benchmark: DataFrame,
      n: Int = 13, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val benchGrams = benchmark
      .select(explode(array_distinct(TextStats.shingles(col(textCol), n)))
        .as("graft_g"))
      .distinct()
    // Compute the shingle array ONCE per row, below the Generate. Putting
    // size(array_distinct(shingles(...))) in the same select as the
    // explode makes Spark re-evaluate the whole words→shingles→distinct
    // chain for every exploded gram (~n_grams× per doc) — measured 5× on
    // the full query. The withColumn projection pins the array under the
    // Generate so both outputs read the materialized value.
    train
      .withColumn("graft_garr",
        array_distinct(TextStats.shingles(col(textCol), n)))
      .select(col(idCol),
        explode(col("graft_garr")).as("graft_g"),
        size(col("graft_garr")).as("graft_total"))
      .join(broadcast(benchGrams), "graft_g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matched_grams"),
        first(col("graft_total")).as("n_grams"))
  }
}
