package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Seeded fuzz for the round-8 operators whose boundary arithmetic is
  * easiest to get subtly wrong: chunk coverage at exact size/stride
  * multiples, grid-sampling off-by-ones at cumulative boundaries, and
  * batch assignment at bucket edges. Random inputs, driver-side serial
  * references, fixed seeds. */
class TextPipelineFuzzSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("chunkWithOverlap fuzz: exact cover + reassembly for random sizes") {
    val rnd = new scala.util.Random(8421L)
    (1 to 5).foreach { trial =>
      val size = 1 + rnd.nextInt(50)
      val stride = 1 + rnd.nextInt(size) // 1 ≤ stride ≤ size
      val docs = (1L to 40L).map { i =>
        // lengths straddle 0, < size, == size, == k·stride, and large
        val len = rnd.nextInt(4) match {
          case 0 => rnd.nextInt(3)
          case 1 => size + rnd.nextInt(3) - 1
          case 2 => stride * (1 + rnd.nextInt(4))
          case _ => rnd.nextInt(300)
        }
        (i, rnd.alphanumeric.take(len).mkString)
      }
      val got = TextPipeline.chunkWithOverlap(
        docs.toDF("doc_id", "text"), col("doc_id"), col("text"), size, stride)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(5)))
        .groupBy(_._1)
      docs.foreach { case (id, text) =>
        val chunks = got(id).sortBy(_._2)
        // serial reference: starts 0, stride, … while start ≤ max(len−1, 0)
        val starts = 0 to math.max(text.length - 1, 0) by stride
        assert(chunks.length == starts.length, s"trial $trial doc $id")
        chunks.zip(starts).foreach { case ((_, idx, start1, chunk), s0) =>
          assert(start1 == s0 + 1 && idx == s0 / stride)
          assert(chunk == text.slice(s0, s0 + size))
        }
        // reassembly: first chunk + overlap-stripped tails == text
        val rebuilt = chunks.head._4 + chunks.tail.map(_._4.drop(size - stride)).mkString
        assert(rebuilt == text, s"trial $trial doc $id")
      }
    }
  }

  test("weightedSystematicSample fuzz: serial grid parity on random weights") {
    val rnd = new scala.util.Random(90125L)
    (1 to 4).foreach { trial =>
      val quota = 1L + rnd.nextInt(60)
      // weights include zeros (never selectable) and occasional heavies
      val docs = (1L to 200L).map { i =>
        (i, if (rnd.nextInt(10) == 0) 0L
            else if (rnd.nextInt(20) == 0) 500L + rnd.nextInt(500)
            else 1L + rnd.nextInt(30))
      }
      val total = docs.map(_._2).sum
      var cum = 0L
      val expected = docs.sortBy { case (i, _) => (md5hex(i.toString), i) }
        .flatMap { case (i, w) =>
          val prev = cum; cum += w
          if (cum * quota / total > prev * quota / total) Some(i) else None
        }.sorted
      val got = TextPipeline.weightedSystematicSample(
        docs.toDF("doc_id", "wt"), col("doc_id"), col("wt"), quota,
        hexDigits = 1 + rnd.nextInt(3))
        .collect().map(_.getLong(0)).toSeq
      assert(got == expected, s"trial $trial quota $quota")
      assert(got.length <= quota)
      // zero-weight docs can never be picked
      val zeros = docs.filter(_._2 == 0L).map(_._1).toSet
      assert(got.forall(!zeros.contains(_)))
    }
  }

  test("lengthBatches fuzz: assignment matches a serial bucket-sort fold") {
    val rnd = new scala.util.Random(777L)
    (1 to 4).foreach { trial =>
      val bucketW = 1 + rnd.nextInt(20)
      val batchB = 1 + rnd.nextInt(6)
      val docs = (1L to 150L).map(i => (i, 1L + rnd.nextInt(100)))
      val got = Packing.lengthBatches(
        docs.toDF("doc_id", "n_tokens"), col("doc_id"), col("n_tokens"),
        bucketW, batchB, hexDigits = 1)
        .collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(5), r.getLong(6)))
        .toMap
      // serial reference: group by (shard, bucket), sort (n desc, id),
      // chunk into batches of B, pad to batch max
      docs.groupBy { case (i, n) =>
        (md5hex(i.toString).take(1), (n - 1) / bucketW)
      }.foreach { case ((shard, bucket), cell) =>
        cell.sortBy { case (i, n) => (-n, i) }
          .grouped(batchB).zipWithIndex.foreach { case (batch, bi) =>
            val bmax = batch.map(_._2).max
            batch.foreach { case (i, n) =>
              assert(got(i) == ((shard, bucket, bi.toLong, bmax, bmax - n)),
                s"trial $trial doc $i")
            }
          }
      }
    }
  }
}
