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

    // Row groups sized PER TABLE so every table yields ~24-36 groups:
    // parquet's row group is the finest scan-split unit, and a fixed
    // 16 MB block left every table whose UNCOMPRESSED footprint is
    // ≤16 MB (documents 15.6 MB, events, embeddings) as a SINGLE group —
    // which serializes any expensive first map stage (the q43 media
    // encode, tokenization) onto one core no matter how many exist
    // (measured r16: documents-family first stages were single-task).
    // Real ingest produces many files; many groups per file is the
    // local-lane equivalent, and both engines read the same bytes —
    // DuckDB parallelizes within OR across groups either way.
    def write(name: String, df: DataFrame,
        blockBytes: Long = 16L * 1024 * 1024): Unit = {
      val tmp = s"$dst/_tmp_$name"
      df.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", blockBytes.toString)
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
    write("customer", blockBytes = 1L * 1024 * 1024,
      df = copies(t("customer")) { (d, k) =>
        d.withColumn("c_custkey", col("c_custkey") + lit(k * KC)) })
    write("supplier", blockBytes = 1L * 1024 * 1024,
      df = copies(t("supplier")) { (d, k) =>
        d.withColumn("s_suppkey", col("s_suppkey") + lit(k * KS)) })
    write("part", blockBytes = 1L * 1024 * 1024,
      df = copies(t("part")) { (d, k) =>
        d.withColumn("p_partkey", col("p_partkey") + lit(k * KP)) })
    write("orders", blockBytes = 1L * 1024 * 1024, df = copies(t("orders")) { (d, k) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(k * KO))
        .withColumn("o_custkey", col("o_custkey") + lit(k * KC)) })
    write("lineitem", blockBytes = 4L * 1024 * 1024,
      df = copies(t("lineitem")) { (d, k) =>
        d.withColumn("l_orderkey", col("l_orderkey") + lit(k * KO))
          .withColumn("l_partkey", col("l_partkey") + lit(k * KP))
          .withColumn("l_suppkey", col("l_suppkey") + lit(k * KS)) })
    write("events", blockBytes = 1L * 1024 * 1024,
      df = copies(t("events")) { (d, k) =>
        d.withColumn("event_id", col("event_id") + lit(k * KE))
          .withColumn("user_id", col("user_id") + lit(k * KU)) })
    write("documents", blockBytes = 512L * 1024,
      df = copies(t("documents")) { (d, k) =>
        d.withColumn("doc_id", col("doc_id") + lit(k * KD))
          .withColumn("text", caesar(col("text"), k)) })
    // rotation cycles at the vector length — the disjointness bound for
    // embeddings is min(26, dim), so verify dim covers the factor
    val embDim = t("embeddings").select(size(col("embedding")))
      .head().getInt(0)
    require(factor <= embDim,
      s"factor $factor exceeds embedding dim $embDim: component rotation" +
      " would cycle and copies would collide")
    write("embeddings", blockBytes = 256L * 1024,
      df = copies(t("embeddings")) { (d, k) =>
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
