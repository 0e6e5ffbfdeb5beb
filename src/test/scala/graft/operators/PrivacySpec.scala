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

  // ── lDiversity ─────────────────────────────────────────────────────

  /** The operator's exact entropy chain: 6dp-quantized p·ln p terms,
    * exact sum, exp, 4dp. */
  private def entropyL(counts: Seq[Long]): Double = {
    val n = counts.sum.toDouble
    val h = counts.map { c =>
      BigDecimal(c / n * math.log(c / n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    BigDecimal(math.exp(-h.toDouble))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("lDiversity: a big-but-homogeneous group flags where kAnonymity passes") {
    val rows =
      Seq.fill(9)(("g1", Some("flu"))) :+ (("g1", Some("hiv"))) // 9:1 skew
    val got = Privacy.lDiversity(rows.toDF("zip", "dx"),
      Seq("zip" -> col("zip")), col("dx"), l = 3)
      .collect().head
    assert(got.getAs[Long]("n") == 10L)
    assert(got.getAs[Long]("l_distinct") == 2L)
    assert(got.getAs[Boolean]("at_risk")) // 2 < 3: k=10 would pass, ℓ flags
    // entropy-ℓ ≈ 1.38 "effective values", far from the 2 distinct
    assert(got.getAs[Double]("entropy_l") == entropyL(Seq(9L, 1L)))
  }

  test("lDiversity: NULL sensitive is its own class; uniform group is safe") {
    val rows = Seq(
      ("a", Option.empty[String]), ("a", None), // all-NULL: homogeneous
      ("b", Some("x")), ("b", Some("y")), ("b", Some("z")))
      .toDF("zip", "dx")
    val got = Privacy.lDiversity(rows, Seq("zip" -> col("zip")),
      col("dx"), l = 3)
      .collect().map(r => r.getAs[String]("zip") -> r).toMap
    assert(got("a").getAs[Long]("l_distinct") == 1L)
    assert(got("a").getAs[Double]("entropy_l") == 1.0) // exp(0): one class
    assert(got("a").getAs[Boolean]("at_risk"))
    assert(got("b").getAs[Long]("l_distinct") == 3L)
    assert(!got("b").getAs[Boolean]("at_risk"))
    assert(got("b").getAs[Double]("entropy_l") == entropyL(Seq(1L, 1L, 1L)))
  }

  test("tCloseness: planted EMDs — skewed groups flag, global-mirroring group reads 0") {
    // global bands: 0 -> 3 rows, 1 -> 3 rows (q = .5/.5, k = 2).
    // a = (0,0): cum diff .5 -> EMD .5; b = (1,1): EMD .5;
    // c = (0,1): mirrors global -> EMD 0. Null band and null quasi
    // rows are screened (neither enters the global counts: 3/3 holds).
    val rows = Seq(
      ("a", Some(0L)), ("a", Some(0L)),
      ("b", Some(1L)), ("b", Some(1L)),
      ("c", Some(0L)), ("c", Some(1L)),
      ("a", None)) ++ Seq((null.asInstanceOf[String], Some(0L)))
    val got = Privacy.tCloseness(rows.toDF("g", "s"),
        Seq("g" -> col("g")), col("s"), t = 0.2)
      .as[(String, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      ("a", 2L, 0.5, true),
      ("b", 2L, 0.5, true),
      ("c", 2L, 0.0, false)))
  }

  test("tCloseness: single global band degenerates to EMD 0, never 0/0") {
    val got = Privacy.tCloseness(
        Seq(("a", 1L), ("b", 1L)).toDF("g", "s"),
        Seq("g" -> col("g")), col("s"), t = 0.2)
      .as[(String, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(("a", 1L, 0.0, false), ("b", 1L, 0.0, false)))
  }
}
