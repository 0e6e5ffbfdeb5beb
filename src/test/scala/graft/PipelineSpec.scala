package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Packing, TextPipeline, TfIdf}

/** Capstone integration: the operators compose into one pretraining
  * curation pipeline — scrub → dedup → quality gate → quota sample →
  * tokenize → pack — as a SINGLE lazy DataFrame chain (one action at
  * the end), the way a production run would wire them. Asserts the
  * conservation invariants between stages rather than golden values. */
class PipelineSpec extends AnyFunSuite with SparkSpec {

  test("curation pipeline composes lazily from raw docs to packed shards") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val total = docs.count()

    // 1. token scrub (map-side normalization)
    val scrubbed = TextPipeline.tokenScrub(
      docs, col("doc_id"), col("text"), stopwords = Seq("the", "a"), minLen = 2)
      .filter(col("n_kept") > 0)

    // 2. exact dedup on the scrubbed text, min-id keeper
    val keep = Dedup.byFingerprint(scrubbed, col("scrubbed"), col("doc_id"))
      .select(col("keep_id").as("doc_id"))
    val deduped = scrubbed.join(keep, Seq("doc_id"))

    // 3. quota sampling over the lang mix (budget below the dedup size)
    val withLang = deduped.join(
      docs.select(col("doc_id"), col("lang"), col("source")), Seq("doc_id"))
    val budget = 200L
    val quotas = TextPipeline.mixAllocation(
      withLang, Seq(col("lang")), budget)
    val sampled = TextPipeline.sampleToQuota(
      withLang, col("doc_id"), Seq(col("lang")), quotas)

    // 4. tokenize under a vocab trained on the SAMPLED corpus
    val vocab = TfIdf.buildVocab(sampled, col("scrubbed"), minCount = 1L, maxSize = 1000)
    val encoded = TfIdf.encode(sampled, col("doc_id"), col("scrubbed"), vocab)

    // 5. pack token counts into 128-token shards
    val packed = Packing.concatChunk(
      encoded, col("doc_id"), col("n_tokens"), capacity = 128, nShards = 4)

    val out = packed.collect() // the single action
    assert(out.nonEmpty)

    // conservation invariants
    val sampledIds = sampled.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sampledIds.size == budget, s"quota sample returned ${sampledIds.size}")
    assert(sampledIds.size <= deduped.count())
    val encodedRows = encoded.collect()
    assert(encodedRows.length == budget.toInt) // every sampled doc tokenized
    // every encoded token id is in-vocab or OOV zero
    val vocabIds = vocab.select("token_id").collect().map(_.getLong(0)).toSet
    encodedRows.foreach { r =>
      r.getSeq[Long](2).foreach(id => assert(id == 0L || vocabIds.contains(id)))
    }
    // packing conserves every document exactly once
    assert(out.map(_.getAs[Long]("doc_id")).toSet ==
      encodedRows.map(_.getLong(0)).toSet)
    assert(total >= budget) // sanity on the fixture itself
  }
}
