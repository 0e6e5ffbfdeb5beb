package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class LinkageSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def w2(m: Double, u: Double): (Double, Double) =
    (math.log(m / u) / math.log(2.0),
      math.log((1.0 - m) / (1.0 - u)) / math.log(2.0))
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("linkScore: weights, fold order, thresholds, null-as-no-evidence") {
    // pairs: full agree / one disagree / all disagree / null field
    val cand = Seq(
      (1L, 11L, Some(true), true), // full agreement
      (2L, 12L, Some(false), true), // name disagrees
      (3L, 13L, Some(false), false), // all disagree
      (4L, 14L, None, true) // name unknown -> zero weight
    ).toDF("id_l", "id_r", "name_ok", "seg_ok")
    val fields = Seq(
      Linkage.Field("name", col("name_ok"), 0.95, 0.01),
      Linkage.Field("segment", col("seg_ok"), 0.9, 0.25))
    val got = Linkage.linkScore(cand, col("id_l"), col("id_r"), fields,
      upper = 6.0, lower = 0.0)
      .as[(Long, Long, Long, Double, String)].collect()
      .map(r => r._1 -> r).toMap
    val (nA, nD) = w2(0.95, 0.01)
    val (sA, sD) = w2(0.9, 0.25)
    assert(got(1L) == ((1L, 11L, 2L, r6(nA + sA), "link")))
    assert(got(2L)._4 == r6(nD + sA))
    assert(got(2L)._5 == (if (nD + sA >= 0.0) "possible" else "non_link"))
    assert(got(3L) == ((3L, 13L, 0L, r6(nD + sD), "non_link")))
    assert(got(4L)._4 == r6(0.0 + sA), "null agreement must contribute zero")
    assert(got(4L)._3 == 1L)
  }

  test("linkScore is pure map-side: no shuffle over the candidate table") {
    val cand = (1L to 100L).map(i => (i, i + 1000L, i % 2 == 0, i % 3 == 0))
      .toDF("id_l", "id_r", "a", "b")
    val df = Linkage.linkScore(cand, col("id_l"), col("id_r"),
      Seq(Linkage.Field("a", col("a"), 0.9, 0.1),
        Linkage.Field("b", col("b"), 0.8, 0.2)), 2.0, 0.0)
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "scoring must not shuffle")
  }

  test("Field validation rejects non-evidence probabilities") {
    intercept[IllegalArgumentException] {
      Linkage.Field("x", lit(true), m = 0.2, u = 0.5) // u > m
    }
    intercept[IllegalArgumentException] {
      Linkage.Field("x", lit(true), m = 1.0, u = 0.5)
    }
  }
}
