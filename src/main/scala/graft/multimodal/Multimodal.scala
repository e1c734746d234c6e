package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed by BATCHED partition transforms — the
  * Scala analogue of `mapInPandas` (iterator-of-batches in, iterator-of-
  * batches out), which is the shape that scales: per-batch amortized
  * decoder setup, bounded memory, no row-at-a-time overhead.
  *
  * The DECODERS are deliberately stubbed with deterministic fakes (this
  * container has no image/audio codecs); everything Spark-side — schemas,
  * typed Datasets, batch iteration, partitioning, frame explosion — is real
  * and spec-tested. Swapping `StubCodecs` for a JNI/ffmpeg decoder changes
  * no plumbing.
  *
  * Scale posture: payloads repartition by media_id before decode so one
  * skewed file can't serialize a partition; decode emits features, never
  * re-materializes payloads; frame sampling explodes AFTER the per-frame
  * byte slice so shuffled rows are thumbnails, not videos.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int, n_frames: Int,
      format: String)

  case class ImageFeatures(
      media_id: Long, width: Int, height: Int, n_bytes: Long,
      mean_intensity: Double, embedding: Array[Float])

  case class AudioFeatures(
      media_id: Long, sample_rate: Int, n_windows: Int,
      rms_energy: Array[Double])

  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Deterministic fake codecs. Each is a pure function of the payload
    * bytes — a stand-in with the same signature a real decoder would have.
    */
  object StubCodecs {
    /** "Decode" an image: intensity stats + a 16-dim embedding derived
      * from byte histograms (deterministic; no RNG).
      */
    def decodeImage(r: MediaRow): ImageFeatures = {
      val bytes = r.payload
      val mean = if (bytes.isEmpty) 0.0
        else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
      val hist = new Array[Float](16)
      bytes.foreach(b => hist((b & 0xff) >> 4) += 1f)
      val n = math.max(1, bytes.length).toFloat
      ImageFeatures(r.media_id, r.width, r.height, bytes.length.toLong,
        mean, hist.map(_ / n))
    }

    /** "Decode" audio: RMS energy per fixed-size sample window. */
    def decodeAudio(r: MediaRow, windowSize: Int): AudioFeatures = {
      val ws = r.payload.grouped(windowSize).map { w =>
        math.sqrt(w.map(b => { val v = (b & 0xff) - 128.0; v * v }).sum /
          math.max(1, w.length))
      }.toArray
      AudioFeatures(r.media_id, r.sample_rate, ws.length, ws)
    }
  }

  /** Batched image decode — the mapInPandas shape: group the partition
    * iterator into batches of `batchSize`, decode each batch as a unit
    * (amortizing per-batch decoder setup), emit features.
    */
  def decodeImages(media: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // real codecs initialize once per batch here
        batch.iterator.map(StubCodecs.decodeImage)
      }
    }
  }

  def decodeAudioBatched(media: Dataset[MediaRow], windowSize: Int = 256,
      batchSize: Int = 64): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(
      _.iterator.map(StubCodecs.decodeAudio(_, windowSize))))
  }

  /** Sample every `stride`-th frame of a "video" payload: slice the
    * per-frame byte range FIRST (frame = payload chunk of n_bytes/n_frames),
    * then explode — downstream shuffles move frames, not whole videos.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      if (r.n_frames <= 0) Iterator.empty
      else {
        val frameLen = math.max(1, r.payload.length / r.n_frames)
        (0 until r.n_frames by stride).iterator.map { i =>
          val from = i * frameLen
          val until = math.min(r.payload.length, from + frameLen)
          Frame(r.media_id, i,
            if (from >= r.payload.length) Array.emptyByteArray
            else r.payload.slice(from, until))
        }
      }
    }
  }

  /** "Resize": deterministic byte-decimation thumbnail (every k-th byte),
    * metadata scaled to match — the plumbing (binary in, smaller binary +
    * consistent meta out) is what a real resampler needs.
    */
  def thumbnails(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val small = r.payload.zipWithIndex.collect {
        case (b, i) if i % factor == 0 => b }
      r.copy(payload = small, width = math.max(1, r.width / factor),
        height = math.max(1, r.height / factor))
    }
  }

  /** Deterministic synthetic media corpus for specs/benches: payload bytes
    * are a pure function of (media_id, position) — splitmix64, no RNG state.
    */
  def syntheticMedia(spark: SparkSession, n: Int,
      bytesPer: Int = 4096): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val bytes = Array.tabulate(bytesPer) { i =>
        var z = (id * 1048573L + i.toLong + 1L) * 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        (z ^ (z >>> 27)).toByte
      }
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video" }
      MediaRow(id, kind, bytes, width = 64, height = 64,
        sample_rate = 16000, n_frames = 16, format = "fake")
    }.repartition(col("media_id"))  // balanced decode, skew-safe
  }

  /** Multimodal → embedding bridge: decoded image embeddings as the
    * (vec_id, embedding) layout graft.textops.Similarity consumes — ANN
    * over media features reuses the text-side operators unchanged.
    */
  def imageEmbeddings(media: Dataset[MediaRow]): DataFrame =
    decodeImages(media).toDF()
      .select(col("media_id").as("vec_id"), col("embedding"))
}
