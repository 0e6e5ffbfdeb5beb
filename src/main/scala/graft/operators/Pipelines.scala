package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** [EXT r16] Composed end-to-end curation pipelines — the daily shape
  * of a pretraining-data run chained THROUGH its stages rather than
  * proven operator-by-operator. Every stage is an already-oracled
  * primitive; what this object pins is the SEAMS: schema carried
  * between stages, determinism of keeper selection feeding packing,
  * and the LSH recall contract surviving an upstream filter.
  */
object Pipelines {

  /** Quality screen → minhash near-dup dedup → concat-and-chunk
    * sequence packing, as one composed dataflow:
    *
    *  1. screen: keep docs with [[TextFunctions.langId]] == "en" AND
    *     [[TextFunctions.qualityScore]] >= `minQuality` (computed
    *     map-side in the scan, no shuffle);
    *  2. dedup: [[Dedup.minhashNearDupPairs]] (banded LSH candidates,
    *     exact-jaccard verify at `threshold`) → [[Dedup.clusters]]
    *     (min-label components) → keep each cluster's MIN doc id;
    *  3. pack: [[Packing.concatChunk]] of the survivors (per-shard
    *     offset windows, integer chunk math).
    *
    * 100 TB shape: inherits each stage's (screen is a map-side
    * filter before any shuffle, so the expensive LSH/cluster stages
    * see only survivors; packing windows are per-shard). No stage
    * adds a shuffle beyond its own published shape.
    *
    * RECALL-CERTIFICATE SEMANTICS (read before editing the oracle or
    * the fixture): the oracle replays stage 2 as the EXACT quadratic
    * jaccard ground truth while the engine mines banded-LSH
    * candidates, so a green hash is a certificate that LSH missed no
    * true pair on this corpus — deliberately stronger than replaying
    * the bands. The certificate is only deterministic because of the
    * corpus's similarity profile: with r = numHashes/bands = 8 rows ×
    * b = 8 bands, P(candidate | jaccard j) = 1 − (1 − j^8)^8, i.e.
    * ≈ 3.1% at j = 0.50, 12.7% at 0.60, 37.8% at 0.70, 77% at 0.80,
    * 98.9% at 0.90. The contract fixture's true pairs are all
    * high-jaccard near-clones (j ≥ ~0.9 — PipelinesSpec pins this),
    * so expected misses ≈ 0; a new data slice seeded with
    * threshold-adjacent pairs (j in [0.5, 0.8)) WOULD redden the gate
    * with no code regression. That is the certificate working as
    * designed — raise numHashes/bands for such a corpus, don't weaken
    * the oracle. Analysis recorded in bench/ADJUDICATION_r17.md.
    *
    * Output: the [[Packing.concatChunk]] schema (doc_id, shard,
    * n_tokens, start_off, first_chunk, last_chunk, n_chunks) over the
    * screened, deduplicated corpus, ordered by doc_id. */
  def curateDedupPack(
      docs: DataFrame, id: Column, text: Column,
      minQuality: Double = 0.5,
      shingleN: Int = 5, numHashes: Int = 64, bands: Int = 8,
      threshold: Double = 0.5,
      capacity: Int = 512, nShards: Int = 8): DataFrame = {
    val screened = docs
      .filter(TextFunctions.langId(text) === "en" &&
        TextFunctions.qualityScore(text) >= minQuality)
      .select(id.as("doc_id"), text.as("text"))
    // Text rehydration joins (the LSH verify stage, the keeper join)
    // key on ids that are ALREADY screened, so they hydrate from the
    // raw table: same rows, minus a langId+qualityScore recompute per
    // rehydration pass (guide §2.3 — the screen runs once per scan
    // that actually needs it, not once per join).
    val raw = docs.select(id.as("doc_id"), text.as("text"))
    val pairs = Dedup.minhashNearDupPairs(
      screened, col("doc_id"), col("text"),
      shingleN = shingleN, numHashes = numHashes, bands = bands,
      threshold = threshold, rehydrateFrom = Some(raw))
      .select(col("id_a"), col("id_b"))
    val keepers = Dedup.clusters(
        screened, pairs, col("doc_id"), col("id_a"), col("id_b"),
        nodesDistinct = true) // doc_id is the table key
      .filter(col("id") === col("cluster_id"))
      .select(col("id").as("doc_id"))
      .join(raw, Seq("doc_id"))
    Packing.concatChunk(keepers, col("doc_id"),
      TextFunctions.tokenCount(col("text")),
      capacity = capacity, nShards = nShards)
      .orderBy("doc_id")
  }
}
