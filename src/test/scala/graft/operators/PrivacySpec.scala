package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PrivacySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("kAnonymity: occupancy per combination, at_risk below k, NULLs are a combination") {
    val rows = Seq.fill(5)(("10001", Some("1980"))) ++
      Seq.fill(2)(("10001", Some("1990"))) ++
      Seq(("94305", None))
    val got = Privacy.kAnonymity(rows.toDF("zip", "yob"),
        Seq("zip" -> col("zip"), "yob" -> col("yob")), k = 3)
      .orderBy("zip", "yob")
      .as[(String, Option[String], Long, Boolean)].collect()
    assert(got.toSeq == Seq(
      ("10001", Some("1980"), 5L, false),
      ("10001", Some("1990"), 2L, true),
      ("94305", None, 1L, true)))
    // k = 1 flags nothing and is a caller bug
    intercept[IllegalArgumentException] {
      Privacy.kAnonymity(rows.toDF("zip", "yob"),
        Seq("zip" -> col("zip")), k = 1)
    }
  }

  test("dpLaplaceCounts: deterministic release, seed-keyed noise, NULL key counted") {
    val rows = (Seq.fill(100)(Some("a")) ++ Seq.fill(50)(Some("b")) ++
      Seq.fill(10)(Option.empty[String])).toDF("g")
    def release(seed: Long) =
      Privacy.dpLaplaceCounts(rows, col("g"), epsilon = 1.0, seed = seed)
        .orderBy("group_key")
        .as[(String, Double, Double)].collect().toSeq
    val r1 = release(42L)
    // re-running MUST NOT refresh the noise (the averaging-attack rule)
    assert(r1 == release(42L))
    assert(r1.map(_._1) == Seq("__null__", "a", "b"))
    assert(r1.forall(_._3 == 1.0))
    // Laplace(1) noise: |noise| < 40 with overwhelming margin; and the
    // release is NOT the exact count (noise actually applied)
    val trueN = Map("__null__" -> 10.0, "a" -> 100.0, "b" -> 50.0)
    assert(r1.forall(r => math.abs(r._2 - trueN(r._1)) < 40.0), s"got $r1")
    assert(r1.exists(r => r._2 != trueN(r._1)))
    // a different seed is a different release
    assert(release(7L) != r1)
    // tighter epsilon → strictly larger noise scale on the same uniforms
    val loose = release(42L).map(r => math.abs(r._2 - trueN(r._1)))
    val tight = Privacy.dpLaplaceCounts(rows, col("g"), epsilon = 0.1, seed = 42L)
      .orderBy("group_key").as[(String, Double, Double)].collect()
      .map(r => math.abs(r._2 - trueN(r._1))).toSeq
    assert(tight.zip(loose).forall { case (t, l) => t >= l },
      s"eps 0.1 must not shrink any noise vs eps 1.0: $tight vs $loose")
  }
}
