package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DriftSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("psi: identical snapshots score exactly zero in every bucket") {
    val vals = (1 to 200).map(i => (i % 30) * 1.0)
    val df = vals.toDF("v")
    val got = Drift.psi(df, df, col("v"), splits = Seq(5.0, 10.0, 20.0))
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(got.length == 4)
    assert(got.forall(r => r._6 == 0.0), "same distribution -> zero PSI terms")
    assert(got.forall(r => r._2 == r._3))
  }

  test("psi: a planted shift produces positive total PSI; empty buckets eps-smooth") {
    val base = (1 to 100).map(_ => 1.0) ++ (1 to 100).map(_ => 15.0)
    val cur = (1 to 180).map(_ => 1.0) ++ (1 to 20).map(_ => 15.0)
    val got = Drift.psi(base.toDF("v"), cur.toDF("v"), col("v"),
      splits = Seq(5.0, 10.0, 20.0))
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val total = got.values.map(_._6).sum
    assert(total > 0.25, s"a 50/50 -> 90/10 shift is a major drift, got $total")
    // bucket 3 (>= 20) is empty on BOTH sides -> absent from the report
    assert(!got.contains(3L))
    // each individual term is nonneg (p-q and ln share sign)
    assert(got.values.forall(_._6 >= 0.0))
  }

  test("psi: one-sided empty bucket smooths to eps instead of ln(0)") {
    val base = (1 to 100).map(_ => 1.0) ++ (1 to 50).map(_ => 15.0)
    val cur = (1 to 100).map(_ => 1.0) // nothing >= 10 in current
    val got = Drift.psi(base.toDF("v"), cur.toDF("v"), col("v"),
      splits = Seq(10.0))
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val b1 = got(1L)
    assert(b1._3 == 0L && b1._5 == 1e-6, "empty current bucket -> eps proportion")
    assert(b1._6.isFinite && b1._6 > 0.0)
    // nulls carry no distribution position: dropped, not a bucket
    val withNull = (Seq(Some(1.0), None) ++ (1 to 9).map(x => Some(1.0))).toDF("v")
    val n = Drift.psi(withNull, withNull, col("v"), Seq(10.0))
      .agg(sum("n_base")).as[Long].collect().head
    assert(n == 10L)
  }

  test("ksTest: hand-computed D on a planted shift; identical samples give 0") {
    // a = {1,1,2,3}, b = {2,3,3,4}: ECDFs step at 1,2,3,4 →
    // gaps |2/4−0|=.5, |3/4−1/4|=.5, |1−3/4|=.25, |1−1|=0; D=0.5 at v=1
    val a = Seq(1.0, 1.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 3.0, 3.0, 4.0).toDF("v")
    val r = Drift.ksTest(a, b, col("v"))
      .as[(Long, Long, Double, Double, Boolean)].collect().head
    assert(r._1 == 4 && r._2 == 4)
    assert(r._3 == 0.5, s"D must be 0.5, got ${r._3}")
    assert(r._4 == 1.0, "argmax ties break to the SMALLEST value")
    assert(!r._5, "0.5 < 1.358*sqrt(8/16) ~ 0.96: no rejection")
    val same = Drift.ksTest(a, a, col("v"))
      .as[(Long, Long, Double, Double, Boolean)].collect().head
    assert(same._3 == 0.0 && !same._5)
  }

  test("ksTest cardinality contract: quantize pre-rounds, guard fails loud") {
    // 3000 distinct raw doubles per side (continuous scores) — the
    // shape the enforced maxDistinct bound exists for (r11 ask #4)
    val a = (1 to 3000).map(i => i / 3000.0 + 1e-9 * i).toDF("v")
    val b = (1 to 3000).map(i => i / 3000.0 + 0.2 + 1e-9 * i).toDF("v")
    val q = Drift.ksTest(a, b, col("v"), quantize = Some(2))
      .as[(Long, Long, Double, Double, Boolean)].collect().head
    val pre = Drift.ksTest(
      a.select(round(col("v"), 2).as("v")),
      b.select(round(col("v"), 2).as("v")), col("v"))
      .as[(Long, Long, Double, Double, Boolean)].collect().head
    assert(q == pre, "quantize=Some(2) == caller pre-rounding to 2dp")
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val e = intercept[Throwable] {
      Drift.ksTest(a, b, col("v"), maxDistinct = 100).collect()
    }
    assert(chain(e).contains("maxDistinct"), chain(e))
  }

  test("ksTest: a gross shift rejects at the 5% bar") {
    val a = (1 to 200).map(_ % 10 * 1.0).toDF("v")
    val b = (1 to 200).map(i => i % 10 + 100.0).toDF("v")
    val r = Drift.ksTest(a, b, col("v"))
      .as[(Long, Long, Double, Double, Boolean)].collect().head
    assert(r._3 == 1.0, "disjoint supports -> D = 1")
    assert(r._5, "D=1 at n=200/200 must reject")
  }

  test("mutualInformation: perfect association = ln 2, independence = 0") {
    // two symbols, perfectly coupled: MI = H_a = H_b = ln 2 (as the sum
    // of two 9dp-quantized halves), NMI exactly 1 within an ulp
    val coupled = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("s", "l")
    val c = Drift.mutualInformation(coupled, col("s"), col("l"))
      .as[(Long, Long, Double, Double, Double, Option[Double])]
      .collect().head
    val ln2q = 2 * BigDecimal(-0.5 * math.log(0.5))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(c._1 == 4L && c._2 == 2L)
    assert(c._3 == ln2q && c._4 == ln2q && c._5 == ln2q, s"got $c")
    assert(c._6.exists(v => math.abs(v - 1.0) < 1e-12))
    // independent 2x2: every cell term ln(1) = 0
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("s", "l")
    val i = Drift.mutualInformation(indep, col("s"), col("l"))
      .as[(Long, Long, Double, Double, Double, Option[Double])]
      .collect().head
    assert(i._5 == 0.0 && i._6.contains(0.0))
    // constant column: its entropy is 0 → NMI null, MI 0
    val const = Seq(("a", "x"), ("b", "x")).toDF("s", "l")
    val k = Drift.mutualInformation(const, col("s"), col("l"))
      .as[(Long, Long, Double, Double, Double, Option[Double])]
      .collect().head
    assert(k._5 == 0.0 && k._6.isEmpty)
    assert(Drift.mutualInformation(
      const.filter(lit(false)), col("s"), col("l")).count() == 0L)
  }

  test("cramersV: perfect 2x2 association = 1, independence = 0, 1-level null") {
    val coupled = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("s", "l")
    val c = Drift.cramersV(coupled, col("s"), col("l"))
      .as[(Long, Long, Long, Double, Option[Double])].collect().head
    // chi2 = (2−1)²/1 ·2 + (0−1)²/1 ·2 = 4; V = sqrt(4/(4·1)) = 1
    assert(c == ((4L, 2L, 2L, 4.0, Some(1.0))), s"got $c")
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("s", "l")
    val i = Drift.cramersV(indep, col("s"), col("l"))
      .as[(Long, Long, Long, Double, Option[Double])].collect().head
    assert(i._4 == 0.0 && i._5.contains(0.0))
    val const = Seq(("a", "x"), ("b", "x")).toDF("s", "l")
    assert(Drift.cramersV(const, col("s"), col("l"))
      .as[(Long, Long, Long, Double, Option[Double])].collect().head._5.isEmpty)
    assert(Drift.cramersV(
      const.filter(lit(false)), col("s"), col("l")).count() == 0L)
  }

  test("jsDivergence: identical = 0, disjoint = ln 2, one-sided empty = null") {
    val a = Seq("x", "x", "y").toDF("k")
    assert(Drift.jsDivergence(a, a, col("k"))
      .as[(Long, Long, Long, Option[Double])].collect().head ==
      ((2L, 3L, 3L, Some(0.0))))
    // disjoint supports: jsd = the quantized ln 2 bound
    val b = Seq("z").toDF("k")
    val d = Drift.jsDivergence(a.limit(0).union(Seq("x").toDF("k")), b, col("k"))
      .as[(Long, Long, Long, Option[Double])].collect().head
    val ln2q = BigDecimal(math.log(2.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(d == ((2L, 1L, 1L, Some(ln2q))), s"got $d")
    // one sample empty → keys exist but the divergence is undefined
    val e = Drift.jsDivergence(a, a.filter(lit(false)), col("k"))
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(e._2 == 3L && e._3 == 0L && e._4.isEmpty)
    // both empty → zero rows
    assert(Drift.jsDivergence(a.filter(lit(false)), a.filter(lit(false)),
      col("k")).count() == 0L)
  }

  test("giniConcentration: hand-computed skew; even shares score zero") {
    // counts a:1 b:1 c:2 sorted (1,1,2) -> G = (2*9 - 4*4)/(3*4) = 1/6
    val skew = Seq("a", "b", "c", "c").toDF("src")
    val r = Drift.giniConcentration(skew, col("src"))
      .as[(Long, Long, Double)].collect().head
    assert(r._1 == 3 && r._2 == 4)
    assert(r._3 == (2.0 * 9 - 4 * 4) / (3 * 4))
    val even = Seq("a", "a", "b", "b").toDF("src")
    assert(Drift.giniConcentration(even, col("src"))
      .as[(Long, Long, Double)].collect().head._3 == 0.0)
  }

  test("chi2Homogeneity: 2x2 with a structural zero cell kept") {
    // s1: en 10 / de 0 (zero cell!), s2: en 5 / de 5 -> terms
    // (10-7.5)^2/7.5 = .833333333, (0-2.5)^2/2.5 = 2.5 (x2), X2 = 6.66…
    val rows = Seq.fill(10)(("s1", "en")) ++
      Seq.fill(5)(("s2", "en")) ++ Seq.fill(5)(("s2", "de"))
    val got = Drift.chi2Homogeneity(rows.toDF("src", "lang"),
      col("src"), col("lang"))
      .as[(String, String, Long, Double, Double)].collect()
    assert(got.length == 4, "margin spine keeps the (s1, de) zero cell")
    val byCell = got.map(r => (r._1, r._2) -> r).toMap
    assert(byCell(("s1", "de"))._3 == 0L)
    assert(byCell(("s1", "de"))._4 == 2.5)
    assert(byCell(("s1", "de"))._5 == 2.5)
    assert(byCell(("s1", "en"))._5 == 0.833333333) // round(2.5^2/7.5, 9)
    val chi2 = got.map(_._5).sum
    assert(math.abs(chi2 - 20.0 / 3) < 1e-8)
  }

  test("qqShift: exact elements per decile, constant shift detected exactly") {
    // cur = ref + 100 pointwise: every decile must shift by exactly 100,
    // and every quantile must be an ACTUAL element (rank ceil(p·n))
    val ref = (1 to 10).map(_.toDouble).toDF("v")
    val cur = (1 to 10).map(_ + 100.0).toDF("v")
    val got = Drift.qqShift(ref, cur, col("v"))
      .as[(Long, Double, Double, Double)].collect()
    assert(got.length == 9)
    assert(got.map(_._1).toSeq == (1 to 9).map(_ * 10L))
    // ceil(0.1·10)=1st element .. ceil(0.9·10)=9th element
    assert(got.head == ((10L, 1.0, 101.0, 100.0)), s"got ${got.head}")
    assert(got(4) == ((50L, 5.0, 105.0, 100.0)))
    assert(got(8) == ((90L, 9.0, 109.0, 100.0)))
    assert(got.forall(_._4 == 100.0), s"got ${got.toSeq}")
    // no drift → all shifts exactly 0 (same elements on both sides)
    val same = Drift.qqShift(ref, ref, col("v"))
      .as[(Long, Double, Double, Double)].collect()
    assert(same.forall(_._4 == 0.0))
  }

  // epoch day d at noon — di in the operators is exactly d
  private def dayTs(d: Long) =
    new java.sql.Timestamp(d * 86400000L + 43200000L)

  test("cusumChangepoint: a clean level shift peaks at the last pre-shift day") {
    // daily totals 0,0,0,10,10,10 → S_d = 6·P_d − d·30 peaks |−90| at
    // day 3 (the last low day); cusum = −90/6 = −15, mean 5
    val rows = (1L to 6L).map(d => (d, dayTs(d), if (d <= 3) 0.0 else 10.0))
      .toDF("g", "ts", "v").withColumn("g", lit("a"))
    val got = Drift.cusumChangepoint(rows, col("g"), col("ts"), col("v"))
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.toSeq == Seq(("a", 6L, 3L, -15.0, 5.0)))
  }

  test("cusumChangepoint: flat series → S ≡ 0, earliest-day tie-break; groups independent") {
    val flat = (1L to 4L).map(d => ("f", dayTs(d), 5.0))
    val shift = (1L to 4L).map(d => ("s", dayTs(d), if (d <= 2) 0.0 else 8.0))
    val got = Drift.cusumChangepoint((flat ++ shift).toDF("g", "ts", "v"),
        col("g"), col("ts"), col("v"))
      .orderBy("group_key")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got(0) == (("f", 4L, 1L, 0.0, 5.0)))
    // daily totals 0,0,8,8: T=16; S_d = 4·P_d − d·16: −16, −32, −16,
    // 0 → peak |−32| at day 2, cusum −32/4 = −8
    assert(got(1) == (("s", 4L, 2L, -8.0, 4.0)))
  }

  test("centroidDrift: identical halves cos 1, orthogonal 0, opposite -1; one-sided labels absent") {
    def emb(rows: Seq[(String, Seq[Float])]) =
      rows.toDF("label", "embedding")
    val a = emb(Seq(("same", Seq(1f, 0f)), ("orth", Seq(1f, 0f)),
      ("opp", Seq(0f, 2f)), ("only_a", Seq(1f, 1f))))
    val b = emb(Seq(("same", Seq(2f, 0f)), ("orth", Seq(0f, 3f)),
      ("opp", Seq(0f, -1f))))
    val got = Drift.centroidDrift(a, b, col("label"), col("embedding"))
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set("same", "orth", "opp"), s"got $got")
    assert(got("same")._4.contains(1.0)) // scaling is invisible
    assert(got("orth")._4.contains(0.0))
    assert(got("opp")._4.contains(-1.0))
    // a zero-sum side has no direction: NULL, not a divide error
    val z = Drift.centroidDrift(
      emb(Seq(("x", Seq(0f, 0f)))), emb(Seq(("x", Seq(1f, 0f)))),
      col("label"), col("embedding"))
      .as[(String, Long, Long, Option[Double])].collect()
    assert(z.head._4.isEmpty)
  }

  test("benfordDigits: string digit extraction, all 9 digits kept, sub-unit rows excluded") {
    // digits: 1 (from 1.5 and 19), 2 (250, 2.0), 3 (31), 9 (950);
    // 0.5 is below the v >= 1 contract line
    val df = Seq(1.5, 19.0, 250.0, 2.0, 31.0, 950.0, 0.5).toDF("v")
    val got = Drift.benfordDigits(df, col("v"))
      .as[(Long, Long, Option[Double], Double, Option[Double])].collect()
    assert(got.length == 9 && got.map(_._1).toSeq == (1L to 9L))
    val byD = got.map(r => r._1 -> r).toMap
    assert(byD(1L)._2 == 2L && byD(2L)._2 == 2L &&
      byD(3L)._2 == 1L && byD(9L)._2 == 1L)
    assert(byD(4L)._2 == 0L, "zero-count digits kept, not dropped")
    assert(byD(1L)._3.contains(0.333333)) // 2/6 — the 0.5 row is out
    assert(byD(1L)._4 == 0.30103, "expected share is log10(2) at 6dp")
    // chi2 term for digit 1: e = 6·log10(2); (2−e)²/e at 9dp
    val e1 = 6.0 * math.log10(2.0)
    val want = BigDecimal((2.0 - e1) * (2.0 - e1) / e1)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byD(1L)._5.contains(want), s"got ${byD(1L)._5}")
  }

  test("benfordDigits: empty input gives 9 rows with zero counts and NULL shares") {
    val got = Drift.benfordDigits(Seq.empty[Double].toDF("v"), col("v"))
      .as[(Long, Long, Option[Double], Double, Option[Double])].collect()
    assert(got.length == 9)
    assert(got.forall(r => r._2 == 0L && r._3.isEmpty && r._5.isEmpty))
  }

  test("weekdayAnomaly: slot-relative spike and dip flags, zero-filled days kept") {
    // 21 days [100, 120], one group; weekday slot = di % 7.
    // Slot 3 (days 101/108/115): counts 1,1,10 → 115 is a spike
    // (10·3 > 2·12); its slot-mates become dips (2·1·3 < 12) — the
    // slot mean is the baseline, by design. Slot 4 (days 102/109/116):
    // counts 9,9,0 → 116 (NO events at all — zero-filled) is a dip and
    // 102/109 stay normal. Empty slots (e.g. 5) flag nothing.
    val events =
      (Seq(101L -> 1, 108L -> 1, 115L -> 10, 102L -> 9, 109L -> 9) ++
        Seq(100L -> 1, 120L -> 1)) // range anchors: spine spans 100..120
        .flatMap { case (d, n) => Seq.fill(n)(("a", dayTs(d))) }
        .toDF("g", "ts")
    val got = Drift.weekdayAnomaly(events, col("g"), col("ts"))
      .orderBy("di")
      .as[(String, Long, Long, Long, Long, Double, Boolean, Boolean)]
      .collect()
    assert(got.length == 21) // every day in [100, 120] kept
    val byDi = got.map(r => r._2 -> r).toMap
    assert(byDi(115L)._4 == 10L && byDi(115L)._7, s"got ${byDi(115L)}")
    assert(byDi(116L)._4 == 0L && byDi(116L)._8, s"got ${byDi(116L)}")
    // dow is epoch-day mod 7, locale-free
    assert(got.forall(r => r._3 == r._2 % 7))
    // a busy-slot normal day: neither flag; slot mean readout is 6dp
    assert(!byDi(102L)._7 && !byDi(102L)._8 && byDi(102L)._6 == 6.0)
    // an all-empty slot day: zero vs zero-mean is NOT an anomaly
    assert(!byDi(103L)._7 && !byDi(103L)._8)
  }

  // ── seasonalDecompose ──────────────────────────────────────────────

  test("seasonalDecompose: pure period-7 series splits exactly, zero remainder") {
    // cnt(d) = 10 + (d mod 7) over 3 full weeks: trend = 13 on every
    // interior day, seasonal(dow) = dow − 3, remainder = 0 — all
    // arithmetic integer-exact in doubles
    val rows = for {
      d <- 0L until 21L
      k <- 0L until (10L + d % 7)
    } yield (k, dayTs(d), "g")
    val got = Drift.seasonalDecompose(
      rows.toDF("k", "ts", "g"), col("g"), col("ts"))
      .collect()
    assert(got.length == 21)
    got.foreach { r =>
      val di = r.getAs[Long]("di")
      val dow = r.getAs[Long]("dow")
      assert(r.getAs[Long]("cnt") == 10L + di % 7)
      assert(dow == di % 7)
      if (di >= 3 && di <= 17) { // interior: full centered-7 window
        assert(r.getAs[Double]("trend") == 13.0)
        assert(r.getAs[Double]("remainder") == 0.0)
      } else {
        assert(r.isNullAt(r.fieldIndex("trend")))
        assert(r.isNullAt(r.fieldIndex("remainder")))
      }
      assert(r.getAs[Double]("seasonal") == dow.toDouble - 3.0)
    }
  }

  test("seasonalDecompose: a missing day is a REAL zero of the series") {
    val rows = (0L until 8L).filterNot(_ == 3L)
      .flatMap(d => (0L until 5L).map(k => (k, dayTs(d), "g")))
    val got = Drift.seasonalDecompose(
      rows.toDF("k", "ts", "g"), col("g"), col("ts"))
      .collect().map(r => r.getAs[Long]("di") -> r.getAs[Long]("cnt")).toMap
    assert(got(3L) == 0L) // spine-filled, not absent
    assert(got.size == 8)
  }

  // ── theilDecomposition ──────────────────────────────────────────────

  test("theilDecomposition: pure within-group inequality, zero between") {
    // a: x=[1,3] (mu=2); b: x=[2,2] (mu=2). Group means equal ->
    // T_between = 0. T_a = (1*ln(.5) + 3*ln(1.5))/4 = .523248/4
    // with ln quantized 6dp: = 0.130812. T_b = 0.
    // T_total = .5*T_a = 0.065406. Zero/negative x rows drop.
    val df = Seq(
      ("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 2.0),
      ("b", 0.0), ("b", -1.0))
      .toDF("g", "x")
    val got = Drift.theilDecomposition(df, col("g"), col("x"))
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("__between__", 4L, 1.0, 0.0),
      ("__total__", 4L, 1.0, 0.065406),
      ("a", 2L, 0.5, 0.130812),
      ("b", 2L, 0.5, 0.0)))
  }

  // ── holtForecast ────────────────────────────────────────────────────

  test("holtForecast: hand-walked level/trend/SSE on a linear ramp") {
    // daily counts [2,4,6,8], alpha=.5, beta=.3:
    //   t2: err 2,   l 3,      b 0.3,     sse 4
    //   t3: err 2.7, l 4.65,   b 0.705,   sse 11.29
    //   t4: err 2.645, l 6.6775, b 1.10175, sse 18.286025
    val rows = Seq(0L -> 2, 1L -> 4, 2L -> 6, 3L -> 8).flatMap {
      case (d, k) => (0 until k).map(j => (d * 10 + j, dayTs(d), "g"))
    }
    val got = Drift.holtForecast(
      rows.toDF("event_id", "ts", "g"), col("g"), col("ts"),
      alpha = 0.5, beta = 0.3, horizon = 7).collect().head
    assert(got.getAs[Long]("n_days") == 4L)
    assert(got.getAs[Double]("level") == 6.6775)
    assert(got.getAs[Double]("trend") == 1.10175)
    assert(got.getAs[Double]("forecast_h") == 14.38975)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Double]("rmse") == r6(math.sqrt(18.286025 / 3.0)))
  }

  test("holtForecast: a missing day is a REAL zero that drags the level") {
    // days 0 and 2 with 3 events each, day 1 dark:
    //   t2 (x=0): err -3,  l 1.5,   b -0.45,   sse 9
    //   t3 (x=3): err 1.95, l 2.025, b -0.1575, sse 12.8025
    val rows = Seq(0L, 2L).flatMap(d =>
      (0 until 3).map(j => (d * 10 + j, dayTs(d), "g")))
    val got = Drift.holtForecast(
      rows.toDF("event_id", "ts", "g"), col("g"), col("ts"),
      alpha = 0.5, beta = 0.3, horizon = 7).collect().head
    assert(got.getAs[Long]("n_days") == 3L)
    assert(got.getAs[Double]("level") == 2.025)
    assert(got.getAs[Double]("trend") == -0.1575)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Double]("rmse") == r6(math.sqrt(12.8025 / 2.0)))
  }

  test("holtForecast: single-day group reads its count as level, NULL rmse") {
    val rows = (0 until 4).map(j => (j.toLong, dayTs(5L), "g"))
    val got = Drift.holtForecast(
      rows.toDF("event_id", "ts", "g"), col("g"), col("ts")).collect().head
    assert(got.getAs[Long]("n_days") == 1L)
    assert(got.getAs[Double]("level") == 4.0)
    assert(got.getAs[Double]("trend") == 0.0)
    assert(got.getAs[Double]("forecast_h") == 4.0)
    assert(got.isNullAt(got.fieldIndex("rmse")))
  }

  test("theilDecomposition: pure between-group inequality, zero within") {
    // a: x=[1]; b: x=[3]. Singleton groups -> x = mu_g -> T_g = 0.
    // shares .25/.75; T_between = .25*ln(.5) + .75*ln(1.5)
    // (6dp-quantized logs) = -0.17328675 + 0.30409875 = 0.130812.
    val df = Seq(("a", 1.0), ("b", 3.0)).toDF("g", "x")
    val got = Drift.theilDecomposition(df, col("g"), col("x"))
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("__between__", 2L, 1.0, 0.130812),
      ("__total__", 2L, 1.0, 0.130812),
      ("a", 1L, 0.25, 0.0),
      ("b", 1L, 0.75, 0.0)))
  }
}
