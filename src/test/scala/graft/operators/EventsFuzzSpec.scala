package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Seeded fuzz for the two event operators whose boundary arithmetic is
  * easiest to get subtly wrong: sessionization (exact-gap inclusivity)
  * and the as-of join (at-or-before inclusivity, duplicate timestamps,
  * genuinely-NULL right values). Random streams, driver-side serial
  * references, fixed seeds. */
class EventsFuzzSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("sessionize fuzz: session counts match a serial gap fold") {
    val rnd = new scala.util.Random(42042L)
    val gapMs = 60000L
    (1 to 3).foreach { trial =>
      // timestamps on a coarse grid so exact-gap ties actually occur
      val events = (1 to 150).map { i =>
        (i.toLong,
          new Timestamp(1700000000000L + rnd.nextInt(40) * 30000L),
          rnd.nextInt(6).toLong)
      }
      val df = events.toDF("event_id", "ts", "user_id")
      val got = Events.sessionStats(df, gapMs)
        .select("user_id", "n_sessions", "longest_session", "n_events")
        .as[(Long, Long, Long, Long)].collect()
        .map(t => t._1 -> (t._2, t._3, t._4)).toMap
      events.groupBy(_._3).foreach { case (uid, evs) =>
        // serial reference: sort by (ms, event_id), split on gap > gapMs
        val sorted = evs.map(e => (e._2.getTime, e._1)).sorted
        val sizes = scala.collection.mutable.ArrayBuffer(0L)
        sorted.zipWithIndex.foreach { case ((ms, _), i) =>
          if (i > 0 && ms - sorted(i - 1)._1 > gapMs) sizes += 0L
          sizes(sizes.length - 1) += 1
        }
        assert(got(uid) == ((sizes.length.toLong, sizes.max, sizes.sum)),
          s"trial $trial user $uid")
      }
    }
  }

  test("asof fuzz: carried values match a serial at-or-before scan") {
    val rnd = new scala.util.Random(43043L)
    (1 to 3).foreach { trial =>
      val keys = 4
      // right side: unique per (key, ms) as the contract requires
      val right = (for {
        k <- 0 until keys
        m <- 0 until 25 if rnd.nextBoolean()
      } yield (k.toLong, 1700000000000L + m * 1000L,
        if (rnd.nextInt(10) == 0) null.asInstanceOf[java.lang.Double]
        else java.lang.Double.valueOf(rnd.nextInt(100).toDouble))).toSeq
      val left = (1 to 80).map { i =>
        (i.toLong, rnd.nextInt(keys).toLong,
          1700000000000L + rnd.nextInt(26) * 1000L - rnd.nextInt(2) * 500L)
      }
      val got = Events.asofJoin(
        left.toDF("lid", "k", "ms"),
        right.toDF("k", "ms", "v"),
        "lid", "k", "ms", "v")
        .select("lid", "v").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      left.foreach { case (lid, k, ms) =>
        val prior = right.filter(r => r._1 == k && r._2 <= ms)
        val want =
          if (prior.isEmpty) None
          else Option(prior.maxBy(_._2)._3).map(_.doubleValue)
        val gotV = got(lid).map(_.asInstanceOf[Double])
        assert(gotV == want, s"trial $trial left $lid key $k ms $ms")
      }
    }
  }
}
