package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PackingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // (doc_id, n_tokens) fixture spanning several shards, with an
  // oversize doc (900 > capacity) and a zero-token doc
  private val fixture = Seq(
    (0L, 100L), (1L, 200L), (2L, 900L), (3L, 0L), (4L, 300L),
    (5L, 250L), (6L, 256L), (7L, 256L), (8L, 512L), (9L, 1L),
    (10L, 300L), (11L, 300L), (12L, 300L), (13L, 10L), (14L, 499L))

  private def df = fixture.toDF("doc_id", "n_tokens")

  /** Serial reference fold — the ground truth greedy() must match. */
  private def serialGreedy(
      capacity: Int, nShards: Int): Seq[Packing.PackAssign] =
    fixture.groupBy { case (id, _) => id % nShards }.toSeq.flatMap {
      case (shard, docs) =>
        var pack = 0L; var pos = 0L; var fill = 0L
        docs.sortBy(_._1).map { case (id, n) =>
          val tk = math.min(math.max(n, 1L), capacity.toLong)
          if (fill + tk > capacity && fill > 0L) { pack += 1; pos = 0; fill = 0 }
          fill += tk; pos += 1
          Packing.PackAssign(shard, id, n, pack, pos - 1, fill)
        }
    }

  test("greedy matches the serial reference fold exactly") {
    for ((capacity, nShards) <- Seq((512, 4), (512, 1), (300, 3))) {
      val got = Packing.greedy(df, col("doc_id"), col("n_tokens"),
        capacity, nShards).collect().sortBy(a => (a.shard, a.doc_id))
      val want = serialGreedy(capacity, nShards)
        .sortBy(a => (a.shard, a.doc_id))
      assert(got.toSeq == want, s"capacity=$capacity nShards=$nShards")
    }
  }

  test("greedy never overfills a pack and keeps doc order within packs") {
    val got = Packing.greedy(df, col("doc_id"), col("n_tokens"), 512, 4)
    val byPack = got.collect().groupBy(a => (a.shard, a.pack_id))
    byPack.values.foreach { docs =>
      val sorted = docs.sortBy(_.pack_pos)
      assert(sorted.last.pack_fill <= 512)
      assert(sorted.map(_.pack_pos).toSeq == sorted.indices.map(_.toLong))
      // doc order within a pack follows doc_id order
      assert(sorted.map(_.doc_id).toSeq == sorted.map(_.doc_id).sorted.toSeq)
    }
    // every doc assigned exactly once
    assert(got.count() == fixture.size)
  }

  test("packStats reports utilization = total_tokens / (n_packs * capacity)") {
    val assign = Packing.greedy(df, col("doc_id"), col("n_tokens"), 512, 2)
    val stats = Packing.packStats(assign, 512).collect().head
    val nPacks = stats.getAs[Long]("n_packs")
    val total = stats.getAs[Long]("total_tokens")
    assert(nPacks > 0)
    assert(math.abs(
      stats.getAs[Double]("utilization") - total.toDouble / (nPacks * 512L)) < 1e-12)
  }

  test("concatChunk offsets are contiguous per shard and chunks cover them") {
    val got = Packing.concatChunk(df, col("doc_id"), col("n_tokens"), 512, 4)
      .collect()
    got.groupBy(_.getAs[Long]("shard")).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      // each doc starts where the previous one ended
      sorted.foldLeft(0L) { (expect, r) =>
        assert(r.getAs[Long]("start_off") == expect)
        expect + r.getAs[Long]("n_tokens")
      }
      sorted.foreach { r =>
        val first = r.getAs[Long]("first_chunk")
        val last = r.getAs[Long]("last_chunk")
        assert(first == r.getAs[Long]("start_off") / 512)
        assert(last >= first)
        assert(r.getAs[Long]("n_chunks") == last - first + 1)
      }
    }
  }

  test("upsert: delta replaces, inserts add, untouched rows carry through") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val delta = Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("k", "s", "v")
    val got = Relational.upsert(base, delta, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq(
      (1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("upsert: a delta row with NULLs replaces its base row outright") {
    val base = Seq((1L, Some("a"), Some(10.0))).toDF("k", "s", "v")
    val delta = Seq((1L, None: Option[String], None: Option[Double]))
      .toDF("k", "s", "v")
    val got = Relational.upsert(base, delta, Seq("k")).collect().head
    assert(got.isNullAt(1) && got.isNullAt(2))
  }

  test("mixAllocation quotas sum exactly to the budget") {
    val docs = (1 to 997).map { i =>
      (i.toLong, if (i % 7 == 0) "de" else "en",
        if (i % 3 == 0) "web" else if (i % 5 == 0) "book" else "code")
    }.toDF("doc_id", "lang", "source")
    val got = TextPipeline.mixAllocation(
      docs, Seq(col("lang"), col("source")), 10000L).collect()
    assert(got.map(_.getAs[Long]("quota")).sum == 10000L)
    // every cell gets at least floor(weight * total)
    got.foreach { r =>
      val w = r.getAs[Double]("weight")
      val q = r.getAs[Long]("quota")
      assert(q == math.floor(w * 10000.0).toLong ||
        q == math.floor(w * 10000.0).toLong + 1)
    }
  }

  test("lengthBatches: full coverage, bounded batches, pad < bucketWidth") {
    val bucketW = 16
    val batchB = 4
    // lengths spread over several buckets, with a heavy mode in one
    val docs = (1L to 200L).map(i => (i, (i * 37 % 90 + 1).toInt))
      .toDF("doc_id", "n_tokens")
    val got = Packing.lengthBatches(docs, col("doc_id"), col("n_tokens"),
      bucketWidth = bucketW, batchSize = batchB).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // every doc assigned exactly once
    assert(got.map(_._1).sorted.toSeq == (1L to 200L))
    got.foreach { case (_, _, bucket, _, n, bmax, pad) =>
      // bucket honors the width; padding never exceeds the bucket spread
      assert(bucket == (n - 1) / bucketW)
      assert(bmax >= n && pad == bmax - n && pad < bucketW)
    }
    // batch sizes: ≤ B always, == B for all but the last batch per cell
    val byBatch = got.groupBy(t => (t._2, t._3, t._4))
    byBatch.foreach { case (_, rows) => assert(rows.length <= batchB) }
    byBatch.groupBy { case ((sh, bk, _), _) => (sh, bk) }.foreach {
      case (_, batches) =>
        val short = batches.count { case (_, rows) => rows.length < batchB }
        assert(short <= 1, "only the last batch of a cell may run short")
    }
    // batch_max is the true max of the batch
    byBatch.foreach { case (_, rows) =>
      assert(rows.map(_._6).distinct.length == 1)
      assert(rows.head._6 == rows.map(_._5).max)
    }
    // deterministic across runs
    val again = Packing.lengthBatches(docs, col("doc_id"), col("n_tokens"),
      bucketWidth = bucketW, batchSize = batchB).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }
}
