package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.textops.Similarity

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  private lazy val media = syntheticMedia(spark, 30, bytesPer = 1024)

  test("synthetic media is deterministic across evaluations") {
    val a = media.filter(_.media_id == 7L).head().payload.toSeq
    val b = syntheticMedia(spark, 30, bytesPer = 1024)
      .filter(_.media_id == 7L).head().payload.toSeq
    assert(a === b)
  }

  test("batched image decode: one feature row per asset, stable stats") {
    val feats = decodeImages(media.filter(col("kind") === "image"),
      batchSize = 4).collect()
    assert(feats.length === 10)
    feats.foreach { f =>
      assert(f.n_bytes === 1024L)
      assert(f.mean_intensity > 96 && f.mean_intensity < 160)  // ~uniform bytes
      assert(f.embedding.length === 16)
      assert(math.abs(f.embedding.sum - 1.0f) < 1e-3)  // histogram normalized
    }
    // determinism: same asset → same features on re-run
    val again = decodeImages(media.filter(col("kind") === "image")).collect()
    assert(feats.sortBy(_.media_id).map(_.mean_intensity).toSeq ===
      again.sortBy(_.media_id).map(_.mean_intensity).toSeq)
  }

  test("audio decode: windowed RMS with correct window count") {
    val feats = decodeAudioBatched(media.filter(col("kind") === "audio"),
      windowSize = 256).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.n_windows === 4)  // 1024 bytes / 256
      assert(f.rms_energy.length === 4)
      assert(f.rms_energy.forall(e => e > 0 && e < 256))
    }
  }

  test("frame sampling: every stride-th frame, frame-sized byte slices") {
    val frames = sampleFrames(media.filter(col("kind") === "video"), stride = 4)
      .collect()
    val byId = frames.groupBy(_.media_id)
    byId.values.foreach { fs =>
      assert(fs.map(_.frame_idx).sorted.toSeq === Seq(0, 4, 8, 12))
      fs.foreach(f => assert(f.frame_bytes.length === 1024 / 16))
    }
  }

  test("thumbnails: decimated payload + consistent metadata") {
    val th = thumbnails(media, factor = 4).collect()
    th.foreach { t =>
      assert(t.payload.length === 256)
      assert(t.width === 16 && t.height === 16)
    }
  }

  test("decoded embeddings flow into the similarity operators unchanged") {
    val emb = imageEmbeddings(media.filter(col("kind") === "image"))
      .withColumn("embedding", transform(col("embedding"), _.cast("double")))
    val topk = Similarity.cosineTopK(emb, emb.filter(col("vec_id") <= 6), k = 2)
      .collect()
    val byQuery = topk.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet === Set(0L, 3L, 6L))
    byQuery.values.foreach(rows => assert(rows.length === 2))
  }
}
