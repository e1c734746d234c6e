package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator: replicates a TESTDATA.md sf
  * directory `factor`× with FK-CONSISTENT key offsets, producing the
  * next scale factor for the bench lane (sf0.1 × 10 → an sf1 lane)
  * without touching the read-only driver testdata.
  *
  * Replication discipline, per table:
  *   - every surrogate key shifts by copy·UNIT (units far above the
  *     source key ranges), applied consistently on both sides of every
  *     FK — joins land exactly as in the source, 10× over;
  *   - dimension attributes, measures and timestamps copy through
  *     unchanged, so value distributions (and timestamp density — 10×
  *     events in the same window) scale the way a larger tenant's data
  *     would;
  *   - `documents.text` Caesar-shifts its LETTERS by the copy index
  *     (length-, case-, whitespace- and ASCII-preserving): within-copy
  *     duplicate/near-duplicate structure is byte-identical to the
  *     source corpus, while cross-copy token sets are disjoint — the
  *     dedup/similarity workload grows 10× WITHOUT manufacturing
  *     cross-copy near-duplicate cliques that would blow the pair joins
  *     into an unrepresentative quadratic regime;
  *   - `embeddings.embedding` rotates its components by the copy index
  *     (norm- and within-copy-geometry-preserving, cross-copy distinct).
  *
  * Disjointness bound: both transforms are cyclic (Caesar mod 26,
  * rotation mod dim), so `factor` is capped at min(26, embedding dim) —
  * beyond that, copies would repeat byte-identically and manufacture
  * the cross-copy near-duplicate cliques this design exists to avoid.
  *
  * Output is ONE parquet file per table named `<table>.parquet` — the
  * exact layout the driver testdata uses, so `graft.Bench`,
  * `graft.Verify` and the DuckDB oracle tooling all point at the new
  * directory unchanged. Deterministic end to end: no RNG, no
  * timestamps; re-running reproduces the bytes.
  */
object GenScaled {

  private val lower = "abcdefghijklmnopqrstuvwxyz"
  private val upper = lower.toUpperCase

  /** Length-preserving Caesar shift of letters only (k mod 26). */
  private def caesar(c: org.apache.spark.sql.Column, k: Int)
      : org.apache.spark.sql.Column = {
    val s = k % 26
    if (s == 0) c
    else translate(c, lower + upper,
      lower.drop(s) + lower.take(s) + upper.drop(s) + upper.take(s))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: GenScaled <srcSfDir> <dstSfDir> [factor=10]")
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    // 26 is a hard cross-copy-disjointness bound, not a convenience cap:
    // the text transform is a Caesar shift (mod 26) and the embedding
    // transform a component rotation (mod dim), so copy k and copy k+26
    // (or k+dim) would be byte-identical — re-introducing exactly the
    // cross-copy near-duplicate cliques the scaladoc promises to avoid.
    require(factor >= 1 && factor <= 26, s"factor out of range: $factor" +
      " (max 26 — Caesar shift cycles at 26, see scaladoc)")
    new java.io.File(dst).mkdirs()

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("graft-gen-scaled")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // key-offset units, far above every source key range at sf ≤ 10
    val KO = 1000000000L // order keys
    val KC = 100000000L  // customer keys
    val KP = 100000000L  // part keys
    val KS = 10000000L   // supplier keys
    val KE = 1000000000L // event ids
    val KU = 100000000L  // user ids
    val KD = 100000000L  // doc/vec ids

    def t(name: String) = spark.read.parquet(s"$src/$name.parquet")

    def copies(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(k => f(df, k)).reduce(_ unionAll _)

    def write(name: String, df: DataFrame): Unit = {
      val tmp = s"$dst/_tmp_$name"
      // 16 MB row groups, NOT the 128 MB default: parquet's row group is
      // the scan-split unit, and the driver-style one-file-per-table
      // layout with a single giant row group caps every Spark scan at
      // ONE task no matter how many cores exist (measured r16: the
      // sf1 full-scan floor queries were single-threaded at the source).
      // Real ingest never produces a 6M-row single-group file; 16 MB
      // groups are the realistic shape and give both engines the same
      // bytes — DuckDB parallelizes within OR across groups either way.
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", (16 * 1024 * 1024).toString)
        .parquet(tmp)
      val dir = new java.io.File(tmp)
      val part = dir.listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      val target = new java.io.File(s"$dst/$name.parquet")
      if (target.exists()) target.delete()
      java.nio.file.Files.move(part.toPath, target.toPath)
      dir.listFiles().foreach(_.delete())
      dir.delete()
      println(s"[gen-scaled] $name: ${spark.read.parquet(
        target.toString).count()} rows")
    }

    write("region", t("region"))
    write("nation", t("nation"))
    write("customer", copies(t("customer")) { (d, k) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(k * KC)) })
    write("supplier", copies(t("supplier")) { (d, k) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(k * KS)) })
    write("part", copies(t("part")) { (d, k) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(k * KP)) })
    write("orders", copies(t("orders")) { (d, k) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(k * KO))
        .withColumn("o_custkey", col("o_custkey") + lit(k * KC)) })
    write("lineitem", copies(t("lineitem")) { (d, k) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(k * KO))
        .withColumn("l_partkey", col("l_partkey") + lit(k * KP))
        .withColumn("l_suppkey", col("l_suppkey") + lit(k * KS)) })
    write("events", copies(t("events")) { (d, k) =>
      d.withColumn("event_id", col("event_id") + lit(k * KE))
        .withColumn("user_id", col("user_id") + lit(k * KU)) })
    write("documents", copies(t("documents")) { (d, k) =>
      d.withColumn("doc_id", col("doc_id") + lit(k * KD))
        .withColumn("text", caesar(col("text"), k)) })
    // rotation cycles at the vector length — the disjointness bound for
    // embeddings is min(26, dim), so verify dim covers the factor
    val embDim = t("embeddings").select(size(col("embedding")))
      .head().getInt(0)
    require(factor <= embDim,
      s"factor $factor exceeds embedding dim $embDim: component rotation" +
      " would cycle and copies would collide")
    write("embeddings", copies(t("embeddings")) { (d, k) =>
      val rot = k.toInt
      d.withColumn("vec_id", col("vec_id") + lit(k * KD))
        .withColumn("embedding",
          if (rot == 0) col("embedding")
          else concat(
            slice(col("embedding"), rot + 1, Int.MaxValue),
            slice(col("embedding"), 1, rot))) })

    spark.stop()
  }
}
