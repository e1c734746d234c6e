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
}
