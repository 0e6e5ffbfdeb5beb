package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Seeded fuzz harness for the prefix-filter recall guarantee — the one
  * claim in FuzzyJoin that a hand-picked fixture can't fully earn:
  * random corpora, random edits, exact-recall cross-check against a
  * driver-side quadratic reference on every trial. The seed is fixed,
  * so a failure reproduces exactly. */
class FuzzyJoinFuzzSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
        m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    m(a.length)(b.length)
  }

  // small alphabet → heavy gram sharing across unrelated strings, the
  // hard regime for prefix filtering (many candidates, rarity order
  // carries little signal)
  private val alpha = "abcdefghij"

  private def randomString(rnd: scala.util.Random, len: Int): String =
    Array.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString

  private def randomEdit(s: String, rnd: scala.util.Random): String =
    if (s.isEmpty) randomString(rnd, 1)
    else rnd.nextInt(3) match {
      case 0 => s.updated(rnd.nextInt(s.length), alpha(rnd.nextInt(alpha.length)))
      case 1 => { val i = rnd.nextInt(s.length); s.substring(0, i) + s.substring(i + 1) }
      case _ => { val i = rnd.nextInt(s.length + 1)
        s.substring(0, i) + alpha(rnd.nextInt(alpha.length)) + s.substring(i) }
    }

  test("fuzz: exact recall vs a quadratic reference across random corpora") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 5).foreach { trial =>
      val maxDist = 1 + rnd.nextInt(2) // 1 or 2
      // lengths 2..25 deliberately span the SHORT-block boundary
      val left = (1 to 14).map(i => (i.toLong, randomString(rnd, 2 + rnd.nextInt(24))))
      val right = left.take(7).zipWithIndex.map { case ((_, k), j) =>
        var s = k
        (0 until (1 + rnd.nextInt(maxDist))).foreach(_ => s = randomEdit(s, rnd))
        (100L + j, s) // planted near matches (≤ maxDist edits)
      } ++ (8 to 14).map(j => (100L + j, randomString(rnd, 2 + rnd.nextInt(24))))
      val want = (for {
        (il, kl) <- left; (ir, kr) <- right
        d = lev(kl, kr) if d <= maxDist
      } yield (il, ir, d.toLong)).toSet
      val got = FuzzyJoin.editDistanceJoin(
        left.toDF("id", "key"), right.toDF("id", "key"), maxDist)
        .select("id_l", "id_r", "edit_dist")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want,
        s"trial $trial (maxDist=$maxDist): engine=${got.size} reference=${want.size}\n" +
          s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }
}
