package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class FuzzyJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def brute(
      l: Seq[(Long, String)], r: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    (for {
      (il, kl) <- l; (ir, kr) <- r
      dist = lev(kl, kr) if dist <= d
    } yield (il, ir, dist.toLong)).toSet
  }

  private val leftRows = Seq(
    (1L, "chocolate lace spring"),
    (2L, "goldenrod lavender mist"),
    (3L, "plum turquoise navy"),
    (4L, "ab"), // SHORT-block resident
    (5L, "chocolate lace sprung")) // 2 edits from id 1's key
  private val rightRows = Seq(
    (10L, "chocolate lace sprint"), // 2 edits from 1, 2 from 5
    (11L, "hocolate lace spring"),  // 1 deletion from 1
    (12L, "goldenrod lavender mist"), // identical to 2
    (13L, "ac"), // 1 sub from "ab"
    (14L, "completely different words"))

  test("editDistanceJoin recalls exactly the brute-force pair set (d=1)") {
    val got = FuzzyJoin.editDistanceJoin(
      leftRows.toDF("id", "key"), rightRows.toDF("id", "key"), maxDist = 1)
      .select("id_l", "id_r", "edit_dist").as[(Long, Long, Long)].collect().toSet
    assert(got == brute(leftRows, rightRows, 1))
    assert(got.contains((1L, 11L, 1L))) // deletion recovered via blocking
    assert(got.contains((2L, 12L, 0L))) // exact match
    assert(got.contains((4L, 13L, 1L))) // SHORT block pair
  }

  test("editDistanceJoin exact recall at d=2 (wider signatures)") {
    val got = FuzzyJoin.editDistanceJoin(
      leftRows.toDF("id", "key"), rightRows.toDF("id", "key"), maxDist = 2)
      .select("id_l", "id_r", "edit_dist").as[(Long, Long, Long)].collect().toSet
    assert(got == brute(leftRows, rightRows, 2))
    assert(got.contains((5L, 10L, 2L)))
  }

  test("blocking never cross-joins the long keys") {
    val q = FuzzyJoin.editDistanceJoin(
      leftRows.toDF("id", "key"), rightRows.toDF("id", "key"), maxDist = 1)
    val plan = q.queryExecution.executedPlan.toString
    // the only permissible product is the SHORT-block one, which Spark
    // plans as BroadcastNestedLoopJoin over the tiny short sets
    assert(!plan.contains("CartesianProduct"))
  }

  test("degenerate short-key corpus fails fast, never quadratic silently") {
    // 40 distinct 2-char keys per side — all SHORT for q=3 — with a cap
    // of 10: the join must REFUSE loudly (an observe() metric would be
    // eliminated with the emptied branch by AQE — measured), naming the
    // remedy, instead of running a 40×40 all-pairs join or silently
    // dropping every short pair
    val shorts = (0 until 40).map(i => (i.toLong, f"$i%02d"))
    val err = intercept[IllegalArgumentException] {
      FuzzyJoin.editDistanceJoin(
        shorts.toDF("id", "key"), shorts.toDF("id", "key"),
        maxDist = 1, shortKeyCap = 10)
    }
    assert(err.getMessage.contains("short keys") &&
      err.getMessage.contains("shortKeyCap"))
    // under the cap the same corpus keeps exact recall through the block
    val ok = FuzzyJoin.editDistanceJoin(
      shorts.toDF("id", "key"), shorts.toDF("id", "key"),
      maxDist = 1, shortKeyCap = 100)
      .select("id_l", "id_r", "edit_dist").as[(Long, Long, Long)].collect().toSet
    assert(ok == brute(shorts, shorts, 1))
  }
}
