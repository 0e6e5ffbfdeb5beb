package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Dev probe (r10 verdict ask #2): measure the media near-dup paths at
  * REAL scale. The contract fixtures pin 120 rows — enough for oracle
  * parity, but the log₂(n)-sized `*Auto` entry points had never fired
  * above fixture n, and SCALE.md's r7 lesson says only cross-scale
  * OUTPUT checks prove an index is still an index.
  *
  * ScaleReplica-style generator: corpus i is REAL PNG/WAV bytes with
  * per-pixel / per-sample splitmix64 content (pseudorandom pixels, so
  * pooled means vary across cells AND images — a gradient+offset
  * construction would cancel in every dHash comparison and give the
  * whole corpus one fingerprint), plus one planted TWIN per base item
  * differing in exactly one pixel / one sample. A one-element change
  * touches one pooled cell / one envelope window, which bounds the
  * planted pair's Hamming distance inside the default budget (≤ 1
  * image bit, ≤ 2 audio bits) AT EVERY GRID SIZE — so the planted
  * recall of `imageNearDupPairsAuto` / `audioNearDupPairsAuto` must be
  * 100% at any scale unless the sizing law or the cap guard breaks it.
  *
  * Usage: runMain graft.tools.MediaScaleProbe [nBase ...]
  * (default scales 600 and 1560 = 10× and 26× of the 60-base fixture)
  */
object MediaScaleProbe {

  private def mix(v: Long): Long = {
    var z = v + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** n REAL 32×16 PNGs with splitmix pixels; ids idOffset..idOffset+n−1.
    * `twinOf` ≥ 0 makes image i a twin of content seed i (same pixels)
    * with pixel (0,0) forced to a different color. */
  private def images(
      spark: SparkSession, n: Int, idOffset: Long, twin: Boolean): DataFrame = {
    javax.imageio.ImageIO.setUseCache(false)
    val rows = (0 until n).map { i =>
      val (w, h) = (32, 16)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = (mix(i.toLong * 1000003L + y * 1009L + x) & 0xffffff).toInt
          img.setRGB(x, y, rgb)
          x += 1
        }
        y += 1
      }
      if (twin) img.setRGB(0, 0, ~img.getRGB(0, 0) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      Row(idOffset + i, "image", Row(w, h, null, "png"), bos.toByteArray)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 32), Multimodal.mediaSchema)
  }

  /** n REAL mono 16-bit 8 kHz WAVs of 1600 splitmix samples; the twin
    * variant forces ONE content-determined sample to 12345. */
  private def wavs(
      spark: SparkSession, n: Int, idOffset: Long, twin: Boolean): DataFrame = {
    val rows = (0 until n).map { i =>
      val nSamples = 1600
      val t0 = ((mix(i.toLong) % nSamples).toInt + nSamples) % nSamples
      val data = new Array[Byte](nSamples * 2)
      var t = 0
      while (t < nSamples) {
        val s =
          if (twin && t == t0) 12345
          else (mix(i.toLong * 131071L + t) & 0xffff).toInt - 32768
        data(2 * t) = (s & 0xff).toByte
        data(2 * t + 1) = ((s >> 8) & 0xff).toByte
        t += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      Row(idOffset + i, "audio", Row(null, null, nSamples * 1000 / 8000, "wav"),
        bos.toByteArray)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 32), Multimodal.mediaSchema)
  }

  private def plantedRecall(
      pairs: Array[(Long, Long)], nBase: Int): (Int, Int) = {
    val found = pairs.count { case (a, b) => b == a + nBase && a < nBase }
    (found, pairs.length)
  }

  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(600, 1560)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scales.foreach { nBase =>
      val media = images(spark, nBase, 0, twin = false)
        .union(images(spark, nBase, nBase, twin = true))
        .union(wavs(spark, nBase, 0, twin = false))
        .union(wavs(spark, nBase, nBase, twin = true))
        .cache()
      media.count() // materialize: generation cost stays out of the walls

      val (gx, gy) = Multimodal.sizedImageGrid(2L * nBase)
      val t0 = System.nanoTime()
      val imgPairs = Multimodal.imageNearDupPairsAuto(media)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      val imgWall = (System.nanoTime() - t0) / 1e9
      val (imgFound, imgTotal) = plantedRecall(imgPairs, nBase)
      println(f"[media-probe] n=${2 * nBase} images: sized grid ${gx}x$gy " +
        f"(default 5x4, ${(gx - 1) * gy} bits) FIRED; planted recall " +
        f"$imgFound/$nBase, total pairs $imgTotal, wall $imgWall%.2f s")

      val win = Multimodal.sizedAudioWindows(2L * nBase)
      val t1 = System.nanoTime()
      val audPairs = Multimodal.audioNearDupPairsAuto(media)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      val audWall = (System.nanoTime() - t1) / 1e9
      val (audFound, audTotal) = plantedRecall(audPairs, nBase)
      println(f"[media-probe] n=${2 * nBase} audio: sized windows $win " +
        f"(default 33) FIRED; planted recall $audFound/$nBase, " +
        f"total pairs $audTotal, wall $audWall%.2f s")
      assert(imgFound == nBase,
        s"image planted recall broken: $imgFound/$nBase")
      assert(audFound == nBase,
        s"audio planted recall broken: $audFound/$nBase")
      media.unpersist()
    }
    spark.stop()
  }
}
