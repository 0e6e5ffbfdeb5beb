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
}
