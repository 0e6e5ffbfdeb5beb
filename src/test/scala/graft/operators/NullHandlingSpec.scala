package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Degenerate-input behavior of the round-5 operators: NULL text/vec
  * rows and empty inputs must degrade predictably (drop out or carry
  * nulls), never throw — a 100 TB crawl always contains garbage rows. */
class NullHandlingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val dirtyDocs = Seq(
    (1L, "alpha beta gamma"),
    (2L, null.asInstanceOf[String]),
    (3L, ""),
    (4L, "alpha beta gamma")).toDF("doc_id", "text")

  test("unigramLogProb: null/empty docs drop out, clean docs score") {
    val got = TfIdf.unigramLogProb(dirtyDocs, col("doc_id"), col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 4L)) // null → explode skips; "" → zero tokens
  }

  test("buildVocab ignores null/empty docs") {
    val v = TfIdf.buildVocab(dirtyDocs, col("text"), minCount = 2L, maxSize = 10)
      .as[(String, Long, Long)].collect()
    assert(v.map(_._1).toSet == Set("alpha", "beta", "gamma"))
  }

  test("booleanSearch: null docs can't match") {
    val got = TextPipeline.booleanSearch(
      dirtyDocs, col("doc_id"), col("text"), Seq("alpha", "beta"))
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 4L))
  }

  test("tokenScrub carries nulls through without throwing") {
    val got = TextPipeline.tokenScrub(
      dirtyDocs, col("doc_id"), col("text"), Seq("beta"), minLen = 3)
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got(1L) == false && got(2L) == true && got(3L) == false)
  }

  test("incremental: null-text batch rows collapse to one sentinel group, idempotently") {
    val corpus = Seq((1L, "seen")).toDF("doc_id", "text")
    val batch = Seq((10L, null.asInstanceOf[String]),
      (11L, null.asInstanceOf[String]), (12L, "fresh")).toDF("doc_id", "text")
    val got = Dedup.incremental(batch, corpus, col("text"), col("doc_id"), col("text"))
      .select("keep_id", "n_batch_copies").as[(Long, Long)].collect().toSet
    // null digests coalesce to the sentinel: one group (min id 10)
    assert(got == Set((10L, 2L), (12L, 1L)))
    // idempotency INCLUDING the null group: admit the output, re-run the
    // same batch — nothing is re-admitted (a raw null digest would never
    // equi-match in the anti-join and rows 10/11 would bounce forever)
    val corpus2 = corpus.unionByName(
      Seq((10L, null.asInstanceOf[String]), (12L, "fresh")).toDF("doc_id", "text"))
    val again = Dedup.incremental(batch, corpus2, col("text"), col("doc_id"), col("text"))
    assert(again.count() == 0L)
  }

  test("kmeans skips null vectors; semDedup ignores them in pairs") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, null.asInstanceOf[Array[Float]]),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(1.0f, 0.01f))).toDF("vec_id", "embedding")
    val m = Clustering.kmeans(vecs, col("vec_id"), col("embedding"), k = 2, maxIters = 5)
    assert(m.centroids.length == 2)
    val pairs = Clustering.semDedupPairs(
      vecs, col("vec_id"), col("embedding"), k = 2, maxIters = 3, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 4L))) // the null row never appears
  }

  test("scalarQuantize: null vectors yield null codes, ranges unaffected") {
    val vecs = Seq(
      (1L, Array(0.0f, 10.0f)),
      (2L, null.asInstanceOf[Array[Float]]),
      (3L, Array(5.0f, 20.0f))).toDF("vec_id", "embedding")
    val (q, ranges) = Similarity.scalarQuantize(vecs, col("embedding"))
    assert(ranges.toSeq == Seq((0.0, 5.0), (10.0, 20.0)))
    val rows = q.select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(rows(1L) == false && rows(2L) == true && rows(3L) == false)
  }

  test("resampleFill on an empty event set returns empty, not an error") {
    val empty = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("user_id", "ts", "value")
    assert(Events.resampleFill(empty, 3600L).count() == 0)
  }
}
