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

  test("batched image decode (stub codec swap-in): one feature row per " +
      "asset, stable stats — the adversarial non-image-bytes path") {
    val feats = decodeImages(media.filter(col("kind") === "image"),
      batchSize = 4, codec = StubCodecs.decodeImage).collect()
    assert(feats.length === 10)
    feats.foreach { f =>
      assert(f.n_bytes === 1024L)
      assert(f.mean_intensity > 96 && f.mean_intensity < 160)  // ~uniform bytes
      assert(f.embedding.length === 16)
      assert(math.abs(f.embedding.sum - 1.0f) < 1e-3)  // histogram normalized
    }
    // determinism: same asset → same features on re-run
    val again = decodeImages(media.filter(col("kind") === "image"),
      codec = StubCodecs.decodeImage).collect()
    assert(feats.sortBy(_.media_id).map(_.mean_intensity).toSeq ===
      again.sortBy(_.media_id).map(_.mean_intensity).toSeq)
  }

  test("audio decode (stub codec swap-in): windowed RMS with correct " +
      "window count") {
    val feats = decodeAudioBatched(media.filter(col("kind") === "audio"),
      windowSize = 256, codec = StubCodecs.decodeAudio).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.n_windows === 4)  // 1024 bytes / 256
      assert(f.rms_energy.length === 4)
      assert(f.rms_energy.forall(e => e > 0 && e < 256))
    }
  }

  // ------------------------------------------------------- real codecs

  test("real PNG codec: encode∘decode is the identity on pixels — " +
      "dimensions from the decoder, exact mean and histogram") {
    val w = 7; val h = 5 // deliberately non-square, non-power-of-two
    val px = Array.tabulate(w * h)(i => ((i * 37 + 11) % 256).toByte)
    val png = RealCodecs.encodePngGray(px, w, h)
    // PNG magic — a real container, not a pass-through
    assert((png.take(4).map(_ & 0xff).toSeq) === Seq(0x89, 0x50, 0x4e, 0x47))
    val feat = RealCodecs.decodeImage(
      MediaRow(1L, "image", png, 0, 0, 0, 0, "png"))
    assert(feat.width === w && feat.height === h)
    assert(feat.n_bytes === png.length.toLong)
    val expMean = px.map(b => (b & 0xff).toDouble).sum / (w * h)
    assert(feat.mean_intensity === expMean)
    val expHist = new Array[Float](16)
    px.foreach(b => expHist((b & 0xff) >> 4) += 1f / (w * h))
    assert(feat.embedding.toSeq === expHist.toSeq)
  }

  test("direct gray8 PNG reader agrees with ImageIO on adversarial " +
      "PNGs — ImageIO's own writer picks adaptive per-row filters, so " +
      "this drives all five unfilter paths") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 24) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(40)
      val px = new Array[Byte](w * h)
      trial % 4 match {
        case 0 => rnd.nextBytes(px) // noise → None/Sub typical
        case 1 => // horizontal ramp → Sub-friendly
          for (i <- px.indices)
            px(i) = ((i % w) * 255 / math.max(1, w - 1)).toByte
        case 2 => // vertical ramp → Up-friendly
          for (i <- px.indices)
            px(i) = ((i / w) * 255 / math.max(1, h - 1)).toByte
        case _ => // diagonal ramp → Average/Paeth-friendly
          for (i <- px.indices)
            px(i) = (((i % w) + (i / w)) * 7).toByte
      }
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h, px)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      val direct = RealCodecs.decodePngGray8(bos.toByteArray)
      assert(direct != null, s"direct reader rejected ImageIO PNG ($trial)")
      assert(direct.width === w && direct.height === h)
      assert(direct.pixels.toSeq === px.toSeq, s"pixel mismatch trial $trial")
    }
  }

  test("direct gray8 PNG reader fails loudly on a corrupted stream " +
      "(CRC catches a single flipped IDAT byte)") {
    val px = Array.tabulate(64)(i => (i * 5).toByte)
    val png = RealCodecs.encodePngGray(px, 8, 8)
    // IHDR occupies bytes 8..32; 45 lands inside the IDAT chunk's data
    png(45) = (png(45) ^ 0x55).toByte
    intercept[IllegalArgumentException] {
      RealCodecs.decodeImage(MediaRow(3L, "image", png, 0, 0, 0, 0, "png"))
    }
  }

  test("16-bit grayscale PNG (outside the direct subset) falls back to " +
      "ImageIO and normalizes samples into the 8-bit histogram range") {
    val w = 9; val h = 4
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, x * 65535 / (w - 1))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val feat = RealCodecs.decodeImage(
      MediaRow(4L, "image", bos.toByteArray, 0, 0, 0, 0, "png"))
    assert(feat.width === w && feat.height === h)
    assert(feat.mean_intensity >= 0 && feat.mean_intensity <= 255)
    assert(math.abs(feat.embedding.sum - 1.0f) < 1e-3)
    // the full-bright column must land in the TOP bin, not out of bounds
    assert(feat.embedding(15) > 0f)
  }

  test("real image decode fails loudly on undecodable bytes") {
    val junk = Array.tabulate(64)(i => (i * 13).toByte)
    intercept[IllegalArgumentException] {
      RealCodecs.decodeImage(MediaRow(9L, "image", junk, 0, 0, 0, 0, "?"))
    }
  }

  test("real WAV codec: canonical header round-trips; the RIFF walk " +
      "survives extra chunks before data and parses 16-bit PCM") {
    val samples = Array.tabulate(300)(i => ((i * 7) % 256).toByte)
    val wavBytes = RealCodecs.encodeWavPcm8(samples, 16000)
    assert(wavBytes.length === 44 + 300)
    val wav = RealCodecs.parseWav(wavBytes)
    assert(wav === RealCodecs.Wav(1, 16000, 8, 44, 300))
    val feats = RealCodecs.decodeAudio(
      MediaRow(2L, "audio", wavBytes, 0, 0, 16000, 0, "wav"), 256)
    assert(feats.sample_rate === 16000)
    assert(feats.n_windows === 2) // 256 + partial 44
    val exp = samples.map(b => (b & 0xff) - 128.0).grouped(256).map(w =>
      math.sqrt(w.map(v => v * v).sum / w.length)).toSeq
    assert(feats.rms_energy.toSeq === exp)

    // non-canonical chunk order: a LIST chunk between fmt and data
    val bb = java.nio.ByteBuffer.allocate(44 + 12 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(44 + 12 + 4 - 8)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(2.toShort) // stereo
      .putInt(8000).putInt(8000 * 2 * 2).putShort(4.toShort)
      .putShort(16.toShort)
      .put("LIST".getBytes("US-ASCII")).putInt(4)
      .put("INFO".getBytes("US-ASCII"))
      .put("data".getBytes("US-ASCII")).putInt(4)
      .put(Array[Byte](0x34, 0x12, 0x00, 0x7f)) // 2 samples × 2 ch? no: 1 frame
    val wav2 = RealCodecs.parseWav(bb.array())
    assert(wav2.nChannels === 2 && wav2.sampleRate === 8000 &&
      wav2.bitsPerSample === 16 && wav2.dataLength === 4)
    intercept[Exception] {
      RealCodecs.parseWav("not a wav at all".getBytes("US-ASCII"))
    }
  }

  test("GFV1 frame container: offset table round-trips ragged frames " +
      "and indexed sampling slices exactly the sampled frames' bytes") {
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](), // empty frame
      Array.tabulate(17)(_.toByte), Array[Byte](9),
      Array[Byte](5, 6), Array[Byte](7, 7, 7, 7))
    val payload = RealCodecs.encodeFrameContainer(frames)
    val offs = RealCodecs.frameOffsets(payload)
    assert(offs.length === 7)
    frames.indices.foreach { i =>
      assert(payload.slice(offs(i), offs(i + 1)).toSeq === frames(i).toSeq)
    }
    val ds = Seq(MediaRow(4L, "video", payload, 0, 0, 0, frames.length,
      "gfv1")).toDS()
    val sampled = sampleFramesIndexed(ds, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toSeq === Seq(0, 2, 4))
    assert(sampled.map(_.frame_bytes.toSeq).toSeq ===
      Seq(frames(0).toSeq, frames(2).toSeq, frames(4).toSeq))
  }

  test("real end-to-end: PNG frames in a GFV1 container through " +
      "sampleFramesIndexed + ImageIO decode recover the source pixels") {
    val pxA = Array.tabulate(16)(i => (i * 16).toByte)
    val pxB = Array.tabulate(16)(i => (255 - i * 16).toByte)
    val payload = RealCodecs.encodeFrameContainer(Seq(
      RealCodecs.encodePngGray(pxA, 4, 4), RealCodecs.encodePngGray(pxB, 4, 4)))
    val ds = Seq(MediaRow(5L, "video", payload, 4, 4, 0, 2, "gfv1")).toDS()
    val feats = sampleFramesIndexed(ds, stride = 1).map { f =>
      val d = RealCodecs.decodeImage(
        MediaRow(f.media_id, "image", f.frame_bytes, 0, 0, 0, 0, "png"))
      (f.frame_idx, d.width, d.height, d.mean_intensity)
    }.collect().sortBy(_._1)
    def mean(px: Array[Byte]) = px.map(b => (b & 0xff).toDouble).sum / 16
    assert(feats.toSeq === Seq((0, 4, 4, mean(pxA)), (1, 4, 4, mean(pxB))))
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

  test("boxDownscaleGray: exact block-mean floor, loud on non-divisible " +
      "dims; resizeImagesReal round-trips through real PNGs") {
    // deterministic 12x8 raster, values spanning the byte range incl.
    // the signed-byte wrap region
    val w = 12; val h = 8
    val px = Array.tabulate(w * h)(i => ((i * 37 + 11) % 256).toByte)
    val out = boxDownscaleGray(px, w, h, factor = 4)
    assert(out.length === (w / 4) * (h / 4))
    for (yy <- 0 until h / 4; xx <- 0 until w / 4) {
      val block = for (dy <- 0 until 4; dx <- 0 until 4)
        yield px((yy * 4 + dy) * w + xx * 4 + dx) & 0xff
      assert((out(yy * (w / 4) + xx) & 0xff) === block.sum / 16,
        s"block ($yy,$xx)")
    }
    // factor 1 is the identity
    assert(boxDownscaleGray(px, w, h, 1).toSeq === px.toSeq)
    intercept[IllegalArgumentException] {
      boxDownscaleGray(px, w, h, factor = 5)
    }

    // Dataset op: encode -> resize -> the RESIZED payload decodes (direct
    // reader) to exactly the kernel's pixels, metadata scaled
    val rows = Seq(
      MediaRow(1L, "image", RealCodecs.encodePngGray(px, w, h),
        w, h, 0, 0, "png"),
      MediaRow(2L, "image",
        RealCodecs.encodePngGray(Array.fill(w * h)(200.toByte), w, h),
        w, h, 0, 0, "png")).toDS()
    val small = resizeImagesReal(rows, factor = 4).collect()
      .map(r => r.media_id -> r).toMap
    assert(small(1L).width === 3 && small(1L).height === 2)
    val dec = RealCodecs.decodePngGray8(small(1L).payload)
    assert(dec.width === 3 && dec.height === 2)
    assert(dec.pixels.toSeq === out.toSeq)
    assert(RealCodecs.decodePngGray8(small(2L).payload)
      .pixels.forall(p => (p & 0xff) === 200))
  }

  test("decoded embeddings flow into the similarity operators unchanged") {
    val emb = imageEmbeddings(media.filter(col("kind") === "image"),
        codec = StubCodecs.decodeImage)
      .withColumn("embedding", transform(col("embedding"), _.cast("double")))
    val topk = Similarity.cosineTopK(emb, emb.filter(col("vec_id") <= 6), k = 2)
      .collect()
    val byQuery = topk.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet === Set(0L, 3L, 6L))
    byQuery.values.foreach(rows => assert(rows.length === 2))
  }
}
