package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PipelinesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("curateDedupPack: lang screen, quality screen, near-dup keeper " +
      "and packing offsets compose end-to-end") {
    val enA = "the cat sat on the mat and it is a good day " +
      "for all of us here now" // 18 tokens, en, quality >= 0.5
    val enB = enA + " ok" // near-dup of A (jaccard ~0.96): must be dropped
    val de = "der hund und die katze ist das und der die das und ist"
    val junk = "the is a !!!!!!!!!!!!!!!!!!!!!!!!!!!!!!" // en but low quality
    val enE = "a dog runs in the park and the sun is warm of course " +
      "we like it very much indeed" // 19 tokens, same shard as A (8 % 8 = 0)
    val docs = Seq(
      (0L, enA), (1L, enB), (2L, de), (3L, junk), (8L, enE))
      .toDF("doc_id", "text")
    val got = Pipelines.curateDedupPack(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // survivors: 0 (keeper of {0,1}) and 8; 1 deduped, 2 lang, 3 quality
    assert(got.map(_._1) == Seq(0L, 8L))
    val a = got(0); val e = got(1)
    assert(a._2 == 0L && e._2 == 0L) // both land in shard 0
    assert(a._3 == 18L && a._4 == 0L) // doc 0: 18 tokens at offset 0
    assert(e._3 == 19L && e._4 == 18L) // doc 8 packs right after doc 0
    assert(a._5 == 0L && a._6 == 0L && a._7 == 1L) // both fit chunk 0
    assert(e._5 == 0L && e._6 == 0L && e._7 == 1L)
  }
}
