package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(spark, 30)

  test("media fixture conforms to the binary+meta schema") {
    assert(media.schema == Multimodal.mediaSchema)
    assert(media.count() == 30)
  }

  test("feature extraction is deterministic, typed, and full-coverage") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    assert(f1.length == 30)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
    f1.foreach { f =>
      assert(f.features.length == 16)
      assert(f.n_bytes > 0)
    }
  }

  test("metadata filters never touch the payload column (parquet ReadSchema prunes)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media-prune").toString + "/t"
    media.write.parquet(dir)
    val pruned = Multimodal.filterByMeta(spark.read.parquet(dir), minWidth = 800)
    assert(!pruned.columns.contains("payload"))
    // the parquet scan itself must not read the blob column
    val scan = pruned.queryExecution.executedPlan.toString
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("payload"), s"payload in scan: $readSchema")
    assert(pruned.count() > 0)
  }

  test("frame sampling fans out bounded rows per video") {
    val frames = Multimodal.sampleFrames(media, everyK = 10, cap = 5)
    val perVideo = frames.groupBy("media_id").count().collect()
    assert(perVideo.nonEmpty)
    perVideo.foreach(r => assert(r.getAs[Long]("count") <= 5L))
  }

  test("PNG encode -> ImageIO decode recovers the generator formula exactly") {
    val imgs = Multimodal.syntheticImages(spark, 12)
      .select("media_id", "payload").collect()
    assert(imgs.length == 12)
    imgs.foreach { r =>
      val i = r.getLong(0).toInt
      val decoded = Multimodal.decodeImage(r.getAs[Array[Byte]](1))
      assert(decoded.isDefined, s"image $i did not decode")
      val img = decoded.get
      assert(img.getWidth == 8 + i % 5 && img.getHeight == 6 + i % 4)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val p = img.getRGB(x, y)
        assert(((p >> 16) & 0xff) == (x * 3 + y * 5 + i * 7) % 256, s"r at ($x,$y) img $i")
        assert(((p >> 8) & 0xff) == (x * 11 + y * 13 + i * 17) % 256, s"g at ($x,$y) img $i")
        assert((p & 0xff) == (x * 19 + y * 23 + i * 29) % 256, s"b at ($x,$y) img $i")
      }
    }
  }

  test("imageStats decodes real PNGs distributed and matches the formula means") {
    val stats = Multimodal.imageStats(Multimodal.syntheticImages(spark, 20))
      .collect().sortBy(_.media_id)
    assert(stats.length == 20)
    stats.foreach { s =>
      val i = s.media_id.toInt
      val w = 8 + i % 5; val h = 6 + i % 4
      assert(s.width == w && s.height == h)
      val pix = for (y <- 0 until h; x <- 0 until w)
        yield ((x * 3 + y * 5 + i * 7) % 256, (x * 11 + y * 13 + i * 17) % 256,
          (x * 19 + y * 23 + i * 29) % 256)
      assert(s.mean_r == pix.map(_._1).sum.toDouble / (w * h))
      assert(s.mean_g == pix.map(_._2).sum.toDouble / (w * h))
      assert(s.mean_b == pix.map(_._3).sum.toDouble / (w * h))
      assert(s.n_bytes > 0)
    }
  }

  test("extractFeatures uses REAL pixel histograms for decodable images, stub otherwise") {
    val real = Multimodal.extractFeatures(Multimodal.syntheticImages(spark, 6), dim = 16)
      .collect().sortBy(_.media_id)
    real.foreach { f =>
      val i = f.media_id.toInt
      val w = 8 + i % 5; val h = 6 + i % 4
      val expected = new Array[Float](16)
      for (y <- 0 until h; x <- 0 until w) {
        val r = (x * 3 + y * 5 + i * 7) % 256
        val g = (x * 11 + y * 13 + i * 17) % 256
        val b = (x * 19 + y * 23 + i * 29) % 256
        expected((r * 299 + g * 587 + b * 114) / 1000 * 16 / 256) += 1.0f
      }
      (0 until 16).foreach(j => expected(j) /= (w * h))
      assert(f.features.toSeq == expected.toSeq, s"histogram mismatch for image $i")
    }
    // syntheticMedia image payloads are not a real codec stream: every
    // row must fall back to the deterministic stub (pins the fallback)
    val stub = Multimodal.extractFeatures(media, dim = 16).collect()
    stub.filter(_.kind == "image").foreach { f =>
      assert(f.features.toSeq.map(_.toDouble).sum > 0)
    }
  }

  test("WAV encode -> AudioSystem decode recovers the generator formula exactly") {
    val wavs = Multimodal.syntheticWavs(spark, 10)
      .select("media_id", "payload").collect()
    assert(wavs.length == 10)
    wavs.foreach { r =>
      val i = r.getLong(0).toInt
      val decoded = Multimodal.decodeAudio(r.getAs[Array[Byte]](1))
      assert(decoded.isDefined, s"clip $i did not decode")
      val (fmt, samples) = decoded.get
      assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1)
      assert(samples.length == 800 + i % 5 * 160)
      samples.zipWithIndex.foreach { case (s, t) =>
        assert(s == ((t * 31 + i * 97) * 509) % 65536 - 32768, s"sample $t clip $i")
      }
    }
  }

  test("audioStats decodes real WAVs distributed and matches the formula") {
    val stats = Multimodal.audioStats(Multimodal.syntheticWavs(spark, 15))
      .collect().sortBy(_.media_id)
    assert(stats.length == 15)
    stats.foreach { s =>
      val i = s.media_id.toInt
      val smp = (0 until 800 + i % 5 * 160).map(t => ((t * 31 + i * 97) * 509) % 65536 - 32768)
      assert(s.sample_rate == 8000 && s.channels == 1)
      assert(s.n_frames == smp.length.toLong)
      assert(s.peak_abs == smp.map(v => math.abs(v).toLong).max)
      assert(s.sumsq == smp.map(v => v.toLong * v).sum)
      assert(s.rms == math.sqrt(s.sumsq.toDouble / smp.length))
    }
  }

  test("extractFeatures uses REAL amplitude histograms for decodable audio") {
    val real = Multimodal.extractFeatures(Multimodal.syntheticWavs(spark, 6), dim = 16)
      .collect().sortBy(_.media_id)
    real.foreach { f =>
      val i = f.media_id.toInt
      val expected = new Array[Float](16)
      val n = 800 + i % 5 * 160
      (0 until n).foreach { t =>
        val s = ((t * 31 + i * 97) * 509) % 65536 - 32768
        expected((s + 32768) * 16 / 65536) += 1.0f
      }
      (0 until 16).foreach(j => expected(j) /= n)
      assert(f.features.toSeq == expected.toSeq, s"histogram mismatch for clip $i")
    }
  }

  test("round trip through parquet preserves binary payloads") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString + "/t"
    media.write.parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 30)
    val a = media.select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    back.select("media_id", "payload").collect().foreach { r =>
      assert(r.getAs[Array[Byte]](1).toSeq == a(r.getLong(0)))
    }
  }

  test("imagePHash is invariant to uniform brightness shift") {
    // two images, same gradient structure, one uniformly brighter:
    // pooled dHash compares adjacent cell MEANS, so the hash must match
    def img(bright: Int) = {
      val im = new java.awt.image.BufferedImage(
        16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 16) {
        val v = math.min(255, x * 10 + bright)
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    val rows = Seq((1L, "image", img(0)), (2L, "image", img(40)))
    val df = spark.createDataFrame(rows).toDF("media_id", "kind", "payload")
    val hashes = Multimodal.imagePHash(df)
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("phash")).toMap
    assert(hashes(1L) == hashes(2L),
      "gradient-sign hash must survive a uniform brightness shift")
    // a monotone left-to-right ramp: every horizontal comparison is 1
    assert(hashes(1L) == (1L << 16) - 1)
  }

  test("imageNearDupPairs finds perturbed twins via chunk blocking, no cross join") {
    val base = Multimodal.syntheticImages(spark, 40)
    val pert = Multimodal.syntheticImagesPerturbed(spark, 10, 1000L, 8)
    val q = Multimodal.imageNearDupPairs(base.unionByName(pert), maxHamming = 2)
    assert(!q.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val pairs = q.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("hamming")))
    // every planted twin (i, 1000+i) must surface: the one-pixel blue
    // delta moves one cell sum by at most 1 lum unit → hamming ≤ 1
    (0L until 10L).foreach { i =>
      val hit = pairs.find(p => p._1 == i && p._2 == 1000L + i)
      assert(hit.isDefined, s"planted twin ($i, ${1000 + i}) missing")
      assert(hit.get._3 <= 1L, s"twin hamming must be ≤ 1, got ${hit.get._3}")
    }
    // and the result equals the full-quadratic ground truth
    val hashes = Multimodal.imagePHash(base.unionByName(pert))
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("phash"))
    val want = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 2
    } yield (ia, ib, d.toLong)).toSet
    assert(pairs.toSet == want, "blocked join must equal ground truth")
  }

  test("audio near-dup recovers every planted twin, never cross-joins") {
    val media = Multimodal.syntheticWavs(spark, 40)
      .unionByName(Multimodal.syntheticWavsPerturbed(spark, 8, 2000L))
    val q = Multimodal.audioNearDupPairs(media, maxHamming = 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    val pairs = q.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val planted = pairs.filter { case (a, b, _) => b == a + 2000L }
    assert(planted.length == 8, s"planted recall: ${planted.length}/8")
    assert(planted.forall(_._3 <= 2))
    // fingerprints are real bits, not degenerate constants
    val fps = Multimodal.audioEnergyFingerprint(media).collect().map(_.afp)
    assert(fps.distinct.length > 10, "envelope bits must discriminate")
  }

  test("skew guard: a degenerate identical-image cluster stays linear") {
    // 200 byte-identical images: every chunk bucket of their shared
    // pHash holds 200+ entries — uncapped, that is 19900 quadratic
    // pairs inside each of the 3 buckets. With the over-cap anti-join
    // the cluster drops out observably (exact-dedup-by-fingerprint
    // territory), while planted small-bucket twins still surface —
    // the DedupSpec simhash discipline, on media.
    import org.apache.spark.sql.Row
    val base = Multimodal.syntheticImages(spark, 40)
    val pert = Multimodal.syntheticImagesPerturbed(spark, 10, 1000L, 8)
    // cluster payload = generator index 45, OUTSIDE the base 0..39
    // range (a payload identical to a base image would legitimately
    // pull that image into the over-cap bucket too)
    val onePayload = Multimodal.syntheticImages(spark, 46)
      .where(org.apache.spark.sql.functions.col("media_id") === 45L)
      .select("payload").head.getAs[Array[Byte]](0)
    val clusterRows = (5000L until 5200L).map(i =>
      Row(i, "image", Row(8, 6, null, "png"), onePayload))
    val cluster = spark.createDataFrame(
      spark.sparkContext.parallelize(clusterRows, 4), Multimodal.mediaSchema)
    val q = Multimodal.imageNearDupPairs(
      base.unionByName(pert).unionByName(cluster),
      maxHamming = 2, bucketCap = 50)
    val pairs = q.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(!pairs.exists(p => p._1 >= 5000L || p._2 >= 5000L),
      "over-cap cluster buckets must be dropped, not joined quadratically")
    (0L until 10L).foreach { i =>
      assert(pairs.contains((i, 1000L + i)),
        s"planted twin ($i, ${1000 + i}) must survive the cap")
    }
    // 250 media: the uncapped cluster alone is 19900 pairs; the ~68
    // surviving pairs are the legitimate 50-image ground truth
    assert(pairs.size <= 150, s"candidate volume must stay linear, got ${pairs.size}")
    // the truncation is observable, never silent
    val metrics = q.queryExecution.observedMetrics.collect {
      case (name, row) if name.startsWith(
        graft.operators.Dedup.skewGuardMetricPrefix + "image_phash") => row
    }
    assert(metrics.nonEmpty, "the bucket cap must emit an observe() metric")
    assert(metrics.head.getAs[Long]("dropped_rows") >= 200L)
  }

  test("skew guard: a degenerate identical-audio cluster stays linear") {
    val base = Multimodal.syntheticWavs(spark, 40)
    val pert = Multimodal.syntheticWavsPerturbed(spark, 8, 2000L)
    import org.apache.spark.sql.Row
    val onePayload = Multimodal.syntheticWavs(spark, 46)
      .where(org.apache.spark.sql.functions.col("media_id") === 45L)
      .select("payload").head.getAs[Array[Byte]](0)
    val clusterRows = (5000L until 5200L).map(i =>
      Row(i, "audio", Row(null, null, 100, "wav"), onePayload))
    val cluster = spark.createDataFrame(
      spark.sparkContext.parallelize(clusterRows, 4), Multimodal.mediaSchema)
    val pairs = Multimodal.audioNearDupPairs(
      base.unionByName(pert).unionByName(cluster),
      maxHamming = 2, bucketCap = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.exists(p => p._1 >= 5000L || p._2 >= 5000L),
      "over-cap cluster buckets must be dropped")
    val planted = pairs.count { case (a, b) => b == a + 2000L }
    assert(planted == 8, s"planted recall under the cap: $planted/8")
    assert(pairs.size <= 40, s"candidate volume must stay linear, got ${pairs.size}")
  }

  test("fingerprint sizing grows chunk entropy with log2(n) and stays in one long") {
    // the sizedBandBits law on media hashes: 10^4 images keep the
    // default-ish grid, 10^9 saturate the 60-bit cap; bits/chunk must
    // be monotone in n and every grid's fingerprint fits a long
    val (gx4, gy4) = Multimodal.sizedImageGrid(10000L)
    val (gx9, gy9) = Multimodal.sizedImageGrid(1000000000L)
    assert((gx4 - 1) * gy4 >= 16 && (gx4 - 1) * gy4 <= 60)
    assert((gx9 - 1) * gy9 == 60, "a billion images saturate the one-long cap")
    assert((gx9 - 1) * gy9 > (gx4 - 1) * gy4, "entropy must grow with n")
    val w4 = Multimodal.sizedAudioWindows(10000L)
    val w9 = Multimodal.sizedAudioWindows(1000000000L)
    assert(w9 == 61 && w9 > w4 && w4 >= 17)
    // auto variants: sized params still recover planted twins
    val media = Multimodal.syntheticWavs(spark, 30)
      .unionByName(Multimodal.syntheticWavsPerturbed(spark, 5, 2000L))
    val auto = Multimodal.audioNearDupPairsAuto(media, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0L until 5L).forall(i => auto.contains((i, 2000L + i))),
      "auto-sized windows must keep planted recall")
  }

  test("audioEnergyFingerprint: loudness scaling preserves comparison bits") {
    // the envelope hash compares energies, so scaling every sample
    // (a constant factor on every window energy) must not change a
    // single bit — build a quiet and a loud WAV with the same shape
    def wav(scale: Int): Array[Byte] = {
      val n = 660
      val data = new Array[Byte](n * 2)
      (0 until n).foreach { t =>
        val s = ((t % 97) - 48) * scale
        data(2 * t) = (s & 0xff).toByte
        data(2 * t + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    import org.apache.spark.sql.Row
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "audio", null, wav(1)), Row(2L, "audio", null, wav(4))), 2),
      Multimodal.mediaSchema)
    val fps = Multimodal.audioEnergyFingerprint(media)
      .collect().map(f => f.media_id -> f.afp).toMap
    assert(fps(1L) == fps(2L), "scaled loudness must hash identically")
  }
}
