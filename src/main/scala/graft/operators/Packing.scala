package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: laying variable-length documents into fixed-size
  * training context windows — the step between curation and batching in
  * every LLM pretraining pipeline. [EXT] beyond the reference surface.
  *
  * Two formulations, both sharded so no global order exists anywhere:
  *
  *  - [[concatChunk]]: GPT-style concat-and-chunk. Documents are laid
  *    back-to-back in id order within a shard and the token stream is cut
  *    every `capacity` tokens (documents may straddle chunk boundaries).
  *    Pure window arithmetic — fully DuckDB-oracle-able.
  *  - [[greedy]]: first-fit sequential bin packing. A document never
  *    splits; a new pack opens when the current one cannot fit the next
  *    document. Inherently a sequential fold, so it runs as a
  *    constant-memory streaming pass per shard (sortWithinPartitions +
  *    mapPartitions), not a window.
  *
  * Scale shape: ONE shuffle on the shard key for either form. Shards are
  * the parallelism unit — at 100 TB you size `nShards` to O(cluster
  * cores), each shard's documents sort locally (Spark external sort,
  * spills fine), and the per-shard scan state is O(1). Only (doc_id,
  * n_tokens) ever shuffles — never text bodies; join token counts back
  * by id downstream if payloads are needed.
  */
object Packing {

  /** One document's packing input after sharding. */
  case class PackDoc(shard: Long, doc_id: Long, n_tokens: Long)

  /** Greedy assignment: `pack_id` is dense per shard, `pack_pos` is the
    * document's position within its pack, `pack_fill` the pack's token
    * total after this document. */
  case class PackAssign(
      shard: Long, doc_id: Long, n_tokens: Long,
      pack_id: Long, pack_pos: Long, pack_fill: Long)

  /** Concat-and-chunk packing: within each shard (pmod(id, nShards)),
    * documents concatenate in doc_id order and the token stream is
    * chunked at `capacity`. Emits per document the token offset where it
    * starts and the first/last chunk it touches.
    *
    * The cumulative offset is an UNBOUNDED PRECEDING window per shard —
    * bounded by shard size, never a global sort. Chunk indices use
    * integer `div` (exact on longs; floor(double) would wobble past
    * 2^53 tokens — real at 100 TB). */
  def concatChunk(
      docs: DataFrame, id: Column, nTokens: Column,
      capacity: Int, nShards: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(id.as("doc_id"), nTokens.as("n_tokens"))
      .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)))
      .withColumn("start_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("first_chunk", expr(s"start_off div ${capacity.toLong}"))
      // an (impossible-for-real-text) zero-token doc still lands IN the
      // chunk at its offset rather than producing last < first
      .withColumn("last_chunk",
        expr(s"(start_off + greatest(n_tokens, 1L) - 1) div ${capacity.toLong}"))
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1L)
      .select("doc_id", "shard", "n_tokens", "start_off",
        "first_chunk", "last_chunk", "n_chunks")
  }

  /** First-fit sequential packing: documents in doc_id order within a
    * shard; a doc longer than `capacity` is clipped to one full pack of
    * its own (the truncate-don't-split convention). Runs as ONE
    * repartition on shard + per-partition sorted streaming fold —
    * constant memory, no per-group materialization (a flatMapGroups
    * would buffer the whole shard).
    *
    * Deterministic: shard assignment, order, and fold are all pure
    * functions of (doc_id, n_tokens). */
  def greedy(
      docs: DataFrame, id: Column, nTokens: Column,
      capacity: Int, nShards: Int): Dataset[PackAssign] = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        pmod(id, lit(nShards.toLong)).as("shard"),
        id.as("doc_id"),
        nTokens.as("n_tokens"))
      .as[PackDoc]
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .mapPartitions { it =>
        // several shards may share a partition (hash collision): the
        // fold resets whenever the shard key changes — input is sorted
        // by (shard, doc_id) so each shard is a contiguous run
        var shard = Long.MinValue
        var pack = 0L; var pos = 0L; var fill = 0L
        it.map { d =>
          if (d.shard != shard) { shard = d.shard; pack = 0L; pos = 0L; fill = 0L }
          val tk = math.min(math.max(d.n_tokens, 1L), capacity.toLong)
          if (fill + tk > capacity && fill > 0L) { pack += 1L; pos = 0L; fill = 0L }
          fill += tk; pos += 1L
          PackAssign(d.shard, d.doc_id, d.n_tokens, pack, pos - 1L, fill)
        }
      }
  }

  /** Pack-level utilization summary of [[greedy]] output: tokens per
    * pack vs capacity — the padding-waste number a packing run is judged
    * by. */
  def packStats(assign: Dataset[PackAssign], capacity: Int): DataFrame =
    assign.toDF()
      .groupBy("shard", "pack_id")
      .agg(max(col("pack_fill")).as("tokens"), count(lit(1)).as("n_docs"))
      .agg(
        count(lit(1)).as("n_packs"),
        sum(col("tokens")).as("total_tokens"),
        (sum(col("tokens")).cast("double") /
          (count(lit(1)) * lit(capacity.toLong)).cast("double")).as("utilization"))

  /** Length-bucketed micro-batching: the padding-minimizing batch
    * assignment used when examples are PADDED to the longest row of
    * their batch rather than packed (inference serving, SFT with
    * per-example loss masks). Documents bucket by token count
    * (`bucketWidth` tokens per bucket), sort longest-first inside the
    * bucket, and chunk into batches of `batchSize`; every batch then
    * pads each member to the batch max, and `pad` is the per-document
    * waste. Longest-first ordering makes each batch's spread at most
    * the bucket width, so worst-case waste per document is bounded by
    * `bucketWidth − 1` tokens.
    *
    * Returns (doc_id, shard, bucket, batch_idx, n_tokens, batch_max,
    * pad), deterministic: shard = md5-prefix of the id (the
    * shuffleShards convention — seed-free, engine-portable), order
    * inside a bucket = (n_tokens desc, doc_id).
    *
    * Scale shape: ONE shuffle, on (shard, bucket). Bucket count alone
    * (max_len/bucketWidth buckets) would be a hot-partition disaster —
    * most of a real corpus lands in a few length buckets — so the
    * md5 shard key fans every bucket over 16^`hexDigits` partitions
    * first (batches are shard-local, which any batch assignment is
    * free to be). Only (doc_id, n_tokens) shuffles; bodies never move.
    * The two windows share one partitioning — Spark plans a single
    * Exchange for both. */
  def lengthBatches(
      docs: DataFrame, id: Column, nTokens: Column,
      bucketWidth: Int = 32, batchSize: Int = 8,
      hexDigits: Int = 1): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(hexDigits >= 1 && hexDigits <= 8,
      s"hexDigits must be in [1, 8], got $hexDigits")
    val wRank = Window.partitionBy(col("shard"), col("bucket"))
      .orderBy(col("n_tokens").desc, col("doc_id"))
    val wBatch = Window.partitionBy(col("shard"), col("bucket"), col("batch_idx"))
    docs
      .select(id.as("doc_id"), nTokens.cast("long").as("n_tokens"))
      .withColumn("shard", substring(md5(col("doc_id").cast("string")), 1, hexDigits))
      .withColumn("bucket",
        expr(s"CAST((greatest(n_tokens, 1L) - 1L) DIV ${bucketWidth}L AS BIGINT)"))
      .withColumn("rn", row_number().over(wRank))
      .withColumn("batch_idx", expr(s"CAST((rn - 1) DIV $batchSize AS BIGINT)"))
      .withColumn("batch_max", max(col("n_tokens")).over(wBatch))
      .withColumn("pad", col("batch_max") - col("n_tokens"))
      .select("doc_id", "shard", "bucket", "batch_idx",
        "n_tokens", "batch_max", "pad")
  }
}
