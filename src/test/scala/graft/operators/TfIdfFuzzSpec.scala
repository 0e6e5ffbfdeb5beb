package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Seeded fuzz for the round-9 TF-IDF-family operators against plain-
  * Scala serial references that replicate the engine's exact arithmetic
  * (same DECIMAL(18,6) quantization, same smoothing, same tie-breaks).
  * Small alphabets force heavy term overlap, which is where the df
  * windows, norm windows, and pair joins can go subtly wrong. */
class TfIdfFuzzSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def q6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  test("bigramLogProb fuzz: equals the serial reference on random corpora") {
    val words = Array("a", "b", "c", "dd", "e")
    val rnd = new scala.util.Random(9917L)
    (1 to 4).foreach { trial =>
      val docs = (1L to 30L).map { i =>
        val len = rnd.nextInt(8) // includes 0- and 1-token docs
        (i, Seq.fill(len)(words(rnd.nextInt(words.length))).mkString(" "))
      }
      // serial model
      val bigrams = docs.flatMap { case (id, text) =>
        val toks = text.split("[^a-z]+").filter(_.nonEmpty)
        toks.sliding(2).withFilter(_.length == 2).map(p => (id, p(0), p(1)))
      }
      val c12 = bigrams.groupBy(b => (b._2, b._3)).view.mapValues(_.size.toLong).toMap
      val c1 = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val v = c12.keySet.flatMap(p => Seq(p._1, p._2)).size
      val want = bigrams.groupBy(_._1).map { case (id, bs) =>
        val s = bs.map { case (_, w1, w2) =>
          q6(-math.log((c12((w1, w2)) + 0.5) / (c1(w1) + 0.5 * v)))
        }.sum
        id -> (bs.size.toLong, (s / bs.size).toDouble)
      }
      val got = TfIdf.bigramLogProb(docs.toDF("doc_id", "text"),
          col("doc_id"), col("text"))
        .as[(Long, Long, Double)].collect()
        .map(t => t._1 -> (t._2, t._3)).toMap
      assert(got.keySet == want.keySet, s"trial $trial doc set")
      want.foreach { case (id, (n, nll)) =>
        assert(got(id)._1 == n, s"trial $trial doc $id count")
        assert(math.abs(got(id)._2 - nll) < 1e-9, s"trial $trial doc $id nll")
      }
    }
  }

  test("allPairsCosine fuzz: equals a serial TF-IDF cosine at threshold 0") {
    val words = Array("alp", "bra", "cha", "del", "ech", "fox")
    val rnd = new scala.util.Random(4451L)
    (1 to 4).foreach { trial =>
      val docs = (1L to 15L).map { i =>
        val len = 1 + rnd.nextInt(6)
        (i, Seq.fill(len)(words(rnd.nextInt(words.length))).mkString(" "))
      }
      val dfCap = 1L + rnd.nextInt(15)
      // serial reference with the engine's decimal discipline
      val tf = docs.flatMap { case (id, text) =>
        text.split("[^a-z]+").filter(_.nonEmpty).groupBy(identity)
          .map { case (t, xs) => (id, t, xs.length.toLong) }
      }
      val dfCount = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val n = docs.size.toDouble
      val post = tf.collect { case (id, t, f) if dfCount(t) <= dfCap =>
        (id, t, q6(f.toDouble * math.log((n + 1.0) / (dfCount(t) + 1.0))))
      }
      val norms = post.groupBy(_._1).view
        .mapValues(ps => math.sqrt(ps.map(p => p._3 * p._3).sum.toDouble)).toMap
      val byTerm = post.groupBy(_._2)
      val dots = scala.collection.mutable.Map.empty[(Long, Long), BigDecimal]
        .withDefaultValue(BigDecimal(0))
      for ((_, ps) <- byTerm; a <- ps; b <- ps if a._1 < b._1)
        dots((a._1, b._1)) += a._3 * b._3
      val want = dots.toMap.map { case ((ia, ib), d) =>
        (ia, ib) -> BigDecimal(d.toDouble / (norms(ia) * norms(ib)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.filter(_._2 >= 0.0)
      val got = TfIdf.allPairsCosine(docs.toDF("doc_id", "text"),
          col("doc_id"), col("text"), dfCap = dfCap, threshold = 0.0)
        .collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
          r.getAs[Double]("cosine")).toMap
      assert(got.keySet == want.keySet, s"trial $trial (dfCap=$dfCap) pair set")
      want.foreach { case (k, c) =>
        assert(math.abs(got(k) - c) < 1e-9, s"trial $trial pair $k")
      }
    }
  }
}
