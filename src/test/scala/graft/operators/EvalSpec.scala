package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class EvalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // engine-mirroring reference: 9dp HALF_UP per term, summed, like the
  // round-then-cast DECIMAL(28,12) path
  private def q9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def dcgTerm(rel: Int, pos: Int): Double =
    q9((math.pow(2.0, rel) - 1.0) / (math.log(pos + 1.0) / math.log(2.0)))
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("retrievalMetrics: hand-computed recall/MRR/NDCG on a planted fixture") {
    // q1: gold {10:rel2, 20:rel1, 30:rel1}; top-5 = [10, 99, 20, 98, 97]
    val ranked = Seq(
      (1L, 10L, 1), (1L, 99L, 2), (1L, 20L, 3), (1L, 98L, 4), (1L, 97L, 5),
      (2L, 77L, 1), (2L, 78L, 2)).toDF("query_id", "doc_id", "rank")
    val gold = Seq(
      (1L, 10L, 2), (1L, 20L, 1), (1L, 30L, 1),
      (2L, 50L, 1), // q2: relevant doc never retrieved
      (3L, 60L, 0) // q3: no POSITIVE gold -> dropped
    ).toDF("query_id", "doc_id", "rel")
    val got = Eval.retrievalMetrics(ranked, gold, k = 5)
      .orderBy("query_id")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 2L), "q3 has no positive gold")
    val (_, nGold, nHits, recall, mrr, ndcg) = got(0)
    assert(nGold == 3 && nHits == 2)
    assert(recall == r6(2.0 / 3.0))
    assert(mrr == 1.0) // first relevant at rank 1
    val dcg = dcgTerm(2, 1) + dcgTerm(1, 3)
    val idcg = dcgTerm(2, 1) + dcgTerm(1, 2) + dcgTerm(1, 3)
    assert(ndcg == r6(dcg / idcg), s"ndcg $ndcg vs ${r6(dcg / idcg)}")
    assert(got(1) == ((2L, 1L, 0L, 0.0, 0.0, 0.0)), "no hits -> all-zero metrics")
  }

  test("retrievalMetrics: duplicate gold rows collapse to max rel, no double-count") {
    // ADVICE r10: a duplicated (query_id, doc_id) gold row used to fan
    // out the join and double-count n_hits/recall/DCG. The fixture
    // duplicates q1's doc 10 at rel 1 and rel 2 — metrics must equal
    // the clean run with the single max-rel row.
    val ranked = Seq(
      (1L, 10L, 1), (1L, 99L, 2), (1L, 20L, 3)).toDF("query_id", "doc_id", "rank")
    val dirtyGold = Seq(
      (1L, 10L, 1), (1L, 10L, 2), (1L, 10L, 2), // dup pair, mixed grades
      (1L, 20L, 1)).toDF("query_id", "doc_id", "rel")
    val cleanGold = Seq(
      (1L, 10L, 2), (1L, 20L, 1)).toDF("query_id", "doc_id", "rel")
    val got = Eval.retrievalMetrics(ranked, dirtyGold, k = 3)
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    val want = Eval.retrievalMetrics(ranked, cleanGold, k = 3)
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(got == want, s"dirty $got vs clean $want")
    assert(got._2 == 2 && got._3 == 2, "n_gold/n_hits count PAIRS, not rows")
  }

  test("retrievalMetrics: k cuts both the retrieved list and the ideal ranking") {
    // 3 gold rel=1; ranked hits at 1 and 3 with k=2 -> only rank 1 counts,
    // and IDCG uses positions 1..2 only
    val ranked = Seq(
      (1L, 10L, 1), (1L, 98L, 2), (1L, 20L, 3)).toDF("query_id", "doc_id", "rank")
    val gold = Seq((1L, 10L, 1), (1L, 20L, 1), (1L, 30L, 1))
      .toDF("query_id", "doc_id", "rel")
    val got = Eval.retrievalMetrics(ranked, gold, k = 2)
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(got._3 == 1 && got._4 == r6(1.0 / 3.0))
    val idcg2 = dcgTerm(1, 1) + dcgTerm(1, 2)
    assert(got._6 == r6(dcgTerm(1, 1) / idcg2))
  }

  test("retrievalMetrics plan: no cross join, aggregation keyed on query_id") {
    val ranked = (1L to 50L).flatMap(qid => (1 to 10).map(r => (qid, qid * 100 + r, r)))
      .toDF("query_id", "doc_id", "rank")
    val gold = (1L to 50L).flatMap(qid => Seq((qid, qid * 100 + 1, 1), (qid, 7L, 2)))
      .toDF("query_id", "doc_id", "rel")
    val df = Eval.retrievalMetrics(ranked, gold, k = 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    df.collect() // must run clean
  }

  private def q12(x: Double): Double =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rrfFuse: hand-computed fusion; doc in both lists beats doc in one") {
    // system A ranks: d1=1, d2=2; system B ranks: d2=1, d3=2
    val rankings = Seq(
      (1L, 1L, 1L), (1L, 2L, 2L), // dense
      (1L, 2L, 1L), (1L, 3L, 2L) // sparse
    ).toDF("query_id", "doc_id", "rank")
    val got = Eval.rrfFuse(rankings, k = 10)
      .select("doc_id", "rrf", "rank")
      .as[(Long, Double, Long)].collect().sortBy(_._3)
    // d2 appears in both: 1/61 + 1/62 > any single term; the engine sums
    // IN DECIMAL and casts once — mirror that, not double addition
    def d12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val want = Seq(
      (2L, (d12(1.0 / 61) + d12(1.0 / 62)).toDouble, 1L),
      (1L, q12(1.0 / 61), 2L),
      (3L, q12(1.0 / 62), 3L))
    assert(got.toSeq == want)
  }

  test("rrfFuse: equal-score ties break by doc_id; k truncates") {
    val rankings = Seq(
      (1L, 9L, 3L), (1L, 4L, 3L), (1L, 7L, 3L)).toDF("query_id", "doc_id", "rank")
    val got = Eval.rrfFuse(rankings, k = 2)
      .select("doc_id", "rank").as[(Long, Long)].collect().sortBy(_._2)
    assert(got.toSeq == Seq((4L, 1L), (7L, 2L)))
  }

  test("bm25ForQueries matches bm25 for a single-query term set") {
    val docs = Seq(
      (1L, "spark join fast spark"),
      (2L, "slow join"),
      (3L, "spark spark spark unrelated words here"),
      (4L, "nothing relevant at all")).toDF("doc_id", "text")
    val single = TextPipeline.bm25(docs, col("doc_id"), col("text"),
        Seq("spark", "join"), 10)
      .as[(Long, Double)].collect().toMap
    val q = Seq((7L, "spark"), (7L, "join")).toDF("query_id", "term")
    val multi = TextPipeline.bm25ForQueries(docs, col("doc_id"), col("text"), q, 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(multi == single)
  }

  test("bm25ForQueries: per-query isolation and rank contract") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha alpha"), (3L, "gamma")).toDF("doc_id", "text")
    val q = Seq((10L, "alpha"), (20L, "gamma")).toDF("query_id", "term")
    val got = TextPipeline.bm25ForQueries(docs, col("doc_id"), col("text"), q, 10)
      .select("query_id", "doc_id", "rank").as[(Long, Long, Long)].collect().toSet
    // query 10 sees only alpha docs (2 beats 1 on tf), query 20 only doc 3
    assert(got == Set((10L, 2L, 1L), (10L, 1L, 2L), (20L, 3L, 1L)))
  }

  test("calibration: hand-computed bins, rates, ECE on a planted scorer") {
    // bin 2 (scores .20/.25): 1 of 2 positive; bin 9 (.95, 1.0): both
    // positive — 1.0 must land IN bin 9, not a phantom bin 10
    val rows = Seq((0.20, false), (0.25, true), (0.95, true), (1.0, true))
      .toDF("score", "label")
    val got = Eval.calibration(rows, col("score"), col("label"))
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(2L, 9L))
    val (_, n2, pos2, conf2, rate2, gap2, ece2) = got(0)
    assert(n2 == 2 && pos2 == 1 && rate2 == 0.5)
    assert(conf2 == (0.20 + 0.25) / 2 && gap2 == math.abs(0.5 - conf2))
    assert(ece2 == BigDecimal(2.0 / 4.0 * gap2)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val (_, n9, pos9, conf9, rate9, _, _) = got(1)
    assert(n9 == 2 && pos9 == 2 && rate9 == 1.0 && conf9 == 0.975)
    // perfectly calibrated scorer: every gap 0, ECE 0
    val perfect = Seq((0.0, false), (1.0, true)).toDF("score", "label")
    val e = Eval.calibration(perfect, col("score"), col("label"))
      .agg(sum("ece_term")).as[Double].collect().head
    assert(e == 0.0)
    // ADVICE r11: scores outside [0,1] (and NaN/NULL) are DROPPED, not
    // folded into a negative bin / the top bin — the polluted fixture
    // must produce the SAME diagram as the clean one.
    val polluted = rows.union(Seq((-0.5, true), (1.5, true),
      (Double.NaN, true)).toDF("score", "label"))
    val clean = Eval.calibration(polluted, col("score"), col("label"))
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    assert(clean.toSeq == got.toSeq,
      "out-of-range scores must be dropped from the reliability diagram")
  }

  test("rank-statistic cardinality contract: quantize pre-rounds, guard fails loud") {
    // 4000 DISTINCT raw doubles — the continuous-score shape the
    // post-aggregate-window discipline bans (VERDICT r11 ask #4).
    val raw = (1 to 4000)
      .map(i => (i / 4000.0 + 1e-9 * i, i % 2 == 0))
      .toDF("score", "label")
    // quantize=Some(2) == caller pre-rounding to 2dp: identical result
    val q = Eval.rocAuc(raw, col("score"), col("label"), quantize = Some(2))
      .collect().toSeq
    val pre = Eval.rocAuc(
      raw.select(round(col("score"), 2).as("score"), col("label")),
      col("score"), col("label")).collect().toSeq
    assert(q == pre)
    // past maxDistinct the guard fails LOUDLY instead of single-tasking
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val e1 = intercept[Throwable] {
      Eval.rocAuc(raw, col("score"), col("label"), maxDistinct = 100)
        .collect()
    }
    assert(chain(e1).contains("maxDistinct"), chain(e1))
    // spearman: same contract on both rank columns
    val two = (1 to 4000).map(i => (i + 1e-9 * i, 4000.0 - i)).toDF("a", "b")
    val sQ = Eval.spearman(two, col("a"), col("b"), quantize = Some(3))
      .as[(Long, Option[Double])].collect().head
    assert(sQ._1 == 4000L && sQ._2.exists(r => math.abs(r + 1.0) < 1e-9),
      s"quantized monotone-decreasing input must give rho=-1, got $sQ")
    val e2 = intercept[Throwable] {
      Eval.spearman(two, col("a"), col("b"), maxDistinct = 100).collect()
    }
    assert(chain(e2).contains("maxDistinct"), chain(e2))
  }

  test("kendallTau: hand-computed τ-b with ties; monotone edges exact ±1") {
    // (1,1),(2,3),(3,2),(4,4): C=5, D=1, no ties → τ = 4/6 = 2/3
    val mixed = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 4.0))
      .toDF("a", "b")
    val m = Eval.kendallTau(mixed, col("a"), col("b"))
      .as[(Long, Option[Double])].collect().head
    assert(m._1 == 4L && m._2.contains(2.0 / 3.0), s"got $m")
    // tied cells: (1,1),(2,2),(3,3),(3,3) → C−D=5, 2n0−2n1=10 → τ=1
    val tied = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (3.0, 3.0))
      .toDF("a", "b")
    assert(Eval.kendallTau(tied, col("a"), col("b"))
      .as[(Long, Option[Double])].collect().head == ((4L, Some(1.0))))
    // perfect inversion → exactly −1
    val inv = Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0)).toDF("a", "b")
    assert(Eval.kendallTau(inv, col("a"), col("b"))
      .as[(Long, Option[Double])].collect().head == ((3L, Some(-1.0))))
    // a constant column → τ null (undefined, not 0)
    val const = Seq((1.0, 5.0), (2.0, 5.0)).toDF("a", "b")
    assert(Eval.kendallTau(const, col("a"), col("b"))
      .as[(Long, Option[Double])].collect().head == ((2L, None)))
    // empty input → zero rows (the spearman contract)
    assert(Eval.kendallTau(mixed.filter(lit(false)), col("a"), col("b"))
      .count() == 0L)
    // cell-cardinality guard fails loud (the kendall quadratic is over
    // CELLS, so its bound is tighter than the rank statistics')
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val many = (1 to 200).map(i => (i.toDouble, (i * 7 % 200).toDouble))
      .toDF("a", "b")
    val e = intercept[Throwable] {
      Eval.kendallTau(many, col("a"), col("b"), maxCells = 50).collect()
    }
    // ADVICE r12: the guard must name the CALLER'S parameter — kendallTau
    // bounds cells via maxCells; 'maxDistinct' doesn't exist on it
    assert(chain(e).contains("maxCells"), chain(e))
    assert(!chain(e).contains("maxDistinct"), chain(e))
  }

  test("htMean: Hajek reweighting recovers the stratum-biased mean; bad pi loud") {
    // population: stratum A (y=10, π=1.0) and B (y=1.0, π=0.25) — the
    // sample over-represents A relative to what 1-per-π expansion says;
    // Hájek mean = (1·10 + 4·1) / (1 + 4) = 2.8
    val s = Seq((10.0, 1.0), (1.0, 0.25)).toDF("y", "p")
    val got = Eval.htMean(s, col("y"), col("p")).collect().head
    assert(got.getAs[Long]("n_sampled") == 2L)
    assert(got.getAs[Double]("sum_weight") == 5.0)
    assert(got.getAs[Double]("ht_mean") == 2.8)
    // equal probabilities degrade to the plain mean
    val eq = Seq((2.0, 0.5), (4.0, 0.5)).toDF("y", "p")
    assert(Eval.htMean(eq, col("y"), col("p"))
      .collect().head.getAs[Double]("ht_mean") == 3.0)
    // π outside (0, 1] fails LOUDLY (silently dropping would bias)
    val bad = Seq((1.0, 0.0)).toDF("y", "p")
    val e = intercept[Throwable] {
      Eval.htMean(bad, col("y"), col("p")).collect()
    }
    def chain2(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain2(e).contains("inclusion probability"), chain2(e))
    // empty sample: n=0, NULL mean, not an error
    val none = Eval.htMean(s.filter(col("y") > 100), col("y"), col("p"))
      .collect().head
    assert(none.getAs[Long]("n_sampled") == 0L)
    assert(none.isNullAt(none.fieldIndex("ht_mean")))
  }

  test("conformalCoverage: hand qhat at ceil(0.9 n); coverage audited on eval") {
    // group g: calibration values 1..10 → pred 5.5, residuals
    // (4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,4.5) sorted → rank ceil(.9·10)=9
    // picks 4.5 ⇒ the interval is [1, 10]
    val cal = (1 to 10).map(v => ("g", v.toDouble)).toDF("grp", "v")
    val ev = Seq(("g", 0.9), ("g", 1.0), ("g", 10.0), ("g", 10.1))
      .toDF("grp", "v")
    val got = Eval.conformalCoverage(cal, ev, col("grp"), col("v"))
      .collect().head
    assert(got.getAs[Long]("n_cal") == 10L)
    assert(got.getAs[Long]("n_eval") == 4L)
    assert(got.getAs[Double]("pred") == 5.5)
    assert(got.getAs[Double]("qhat") == 4.5)
    // 1.0 and 10.0 land inside (|y−5.5| = 4.5 ≤ 4.5); 0.9 and 10.1 out
    assert(got.getAs[Double]("coverage") == 0.5)
    // a group with no eval rows keeps its calibration row, NULL coverage
    val got2 = Eval.conformalCoverage(
      cal.union(Seq(("h", 1.0), ("h", 2.0)).toDF("grp", "v")),
      ev, col("grp"), col("v")).collect()
    assert(got2.length == 2)
    val h = got2.find(_.getAs[String]("group_key") == "h").get
    assert(h.getAs[Long]("n_eval") == 0L)
    assert(h.isNullAt(h.fieldIndex("coverage")))
  }

  test("hardNegatives: gold anti-joined away, survivors re-ranked, extras pass through") {
    val ranked = Seq(
      (1L, 10L, 0.9, 1L), (1L, 11L, 0.8, 2L), (1L, 12L, 0.7, 3L),
      (1L, 13L, 0.6, 4L),
      (2L, 20L, 0.5, 1L), (2L, 21L, 0.4, 2L))
      .toDF("query_id", "doc_id", "sim", "rank")
    val gold = Seq((1L, 11L), (1L, 99L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "doc_id")
    val got = Eval.hardNegatives(ranked, gold, 2)
      .orderBy("query_id", "neg_rank")
      .as[(Long, Long, Double, Long, Long)].collect().toSeq
    // q1: 11 is gold → negatives 10, 12 (13 cut by k=2); q2: all gold
    assert(got == Seq((1L, 10L, 0.9, 1L, 1L), (1L, 12L, 0.7, 3L, 2L)))
  }

  test("rocAuc: hand-computed tie-corrected U; perfect and inverted edges") {
    // scores .1(neg) .2(pos) .2(neg) .3(pos):
    // U = 1*(1 + 1/2) + 1*2 = 3.5 -> AUC 3.5/4 = 0.875
    val mixed = Seq((0.1, false), (0.2, true), (0.2, false), (0.3, true))
      .toDF("score", "label")
    val r = Eval.rocAuc(mixed, col("score"), col("label"))
      .as[(Long, Long, Option[Double])].collect().head
    assert(r == ((2L, 2L, Some(0.875))))
    val perfect = Seq((0.1, false), (0.9, true)).toDF("score", "label")
    assert(Eval.rocAuc(perfect, col("score"), col("label"))
      .as[(Long, Long, Option[Double])].collect().head._3.contains(1.0))
    val inverted = Seq((0.9, false), (0.1, true)).toDF("score", "label")
    assert(Eval.rocAuc(inverted, col("score"), col("label"))
      .as[(Long, Long, Option[Double])].collect().head._3.contains(0.0))
    // one-class slice: AUC undefined -> null, not a silent number
    val oneClass = Seq((0.1, true), (0.9, true)).toDF("score", "label")
    assert(Eval.rocAuc(oneClass, col("score"), col("label"))
      .as[(Long, Long, Option[Double])].collect().head == ((2L, 0L, None)))
  }

  test("cohensKappa: textbook 2x2 table gives 0.4; constant raters null") {
    // cells: yes/yes 20, no/no 15, yes/no 5, no/yes 10 -> po=.7,
    // pe_num = 25*30 + 25*20 = 1250, kappa = (50*35-1250)/(2500-1250) = .4
    val rows =
      Seq.fill(20)(("yes", "yes")) ++ Seq.fill(15)(("no", "no")) ++
        Seq.fill(5)(("yes", "no")) ++ Seq.fill(10)(("no", "yes"))
    val r = Eval.cohensKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Option[Double])].collect().head
    assert(r == ((50L, 35L, Some(0.4))))
    // both raters constant: pe = 1, kappa undefined -> null
    val const = Seq.fill(5)(("x", "x")).toDF("a", "b")
    assert(Eval.cohensKappa(const, col("a"), col("b"))
      .as[(Long, Long, Option[Double])].collect().head == ((5L, 5L, None)))
    // null labels are unrated, not disagreement
    val withNulls = rows.toDF("a", "b")
      .union(Seq((null.asInstanceOf[String], "yes")).toDF("a", "b"))
    assert(Eval.cohensKappa(withNulls, col("a"), col("b"))
      .as[(Long, Long, Option[Double])].collect().head._1 == 50L)
  }

  test("fleissKappa: hand-computed 2-rater panel; drops partial panels") {
    // item1 both raters A (s2=4), item2 split A/B (s2=2):
    // P-bar = 1/2, T_A=3 T_B=1, P_e = 10/16 -> kappa = -1/3
    val ratings = Seq((1, "A"), (1, "A"), (2, "A"), (2, "B"))
      .toDF("item", "cat")
    val r = Eval.fleissKappa(ratings, col("item"), col("cat"), nRaters = 2)
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(r._1 == 2 && r._2 == 0 && r._3 == 2)
    assert(r._4.contains(-1.0 / 3.0))
    // a 3rd item with only ONE rating is dropped and counted, never
    // folded into the totals
    val partial = ratings.union(Seq((3, "A")).toDF("item", "cat"))
    val p = Eval.fleissKappa(partial, col("item"), col("cat"), nRaters = 2)
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(p == ((2L, 1L, 2L, Some(-1.0 / 3.0))))
    // every rating in one category: P_e = 1, kappa undefined -> null
    val const = Seq((1, "A"), (1, "A"), (2, "A"), (2, "A")).toDF("item", "cat")
    assert(Eval.fleissKappa(const, col("item"), col("cat"), nRaters = 2)
      .as[(Long, Long, Long, Option[Double])].collect().head._4.isEmpty)
  }

  test("fleissKappa: 3 raters, perfect agreement gives 1") {
    val ratings = Seq((1, "A"), (1, "A"), (1, "A"), (2, "B"), (2, "B"), (2, "B"))
      .toDF("item", "cat")
    val r = Eval.fleissKappa(ratings, col("item"), col("cat"), nRaters = 3)
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(r == ((2L, 0L, 2L, Some(1.0))))
  }

  test("spearman: exact average-rank ties; monotone edges; constant null") {
    // a=(1,2,2,3) b=(1,3,2,4): R2a=(2,5,5,8) R2b=(2,6,4,8), mean 5
    // rho = 18 / (sqrt(18)*sqrt(20))
    val tied = Seq((1.0, 1.0), (2.0, 3.0), (2.0, 2.0), (3.0, 4.0))
      .toDF("a", "b")
    val r = Eval.spearman(tied, col("a"), col("b"))
      .as[(Long, Option[Double])].collect().head
    assert(r._1 == 4)
    assert(r._2.contains(18.0 / math.sqrt(18.0 * 20.0)))
    val mono = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0)).toDF("a", "b")
    assert(Eval.spearman(mono, col("a"), col("b"))
      .as[(Long, Option[Double])].collect().head._2.contains(1.0))
    val anti = Seq((1.0, 30.0), (2.0, 20.0), (3.0, 10.0)).toDF("a", "b")
    assert(Eval.spearman(anti, col("a"), col("b"))
      .as[(Long, Option[Double])].collect().head._2.contains(-1.0))
    // constant column: zero variance -> null, not 0
    val const = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("a", "b")
    assert(Eval.spearman(const, col("a"), col("b"))
      .as[(Long, Option[Double])].collect().head._2.isEmpty)
    // all-null slice: zero rows, not a fabricated n=0 row
    val empty = Seq((Some(1.0), Option.empty[Double])).toDF("a", "b")
    assert(Eval.spearman(empty, col("a"), col("b")).count() == 0)
  }

  test("rboOverlap: identical lists ~ 1 - p^k, disjoint 0, top-weighted agreement") {
    import spark.implicits._
    def ranked(ids: Seq[Long]) =
      ids.zipWithIndex.map { case (i, r) => (i, (r + 1).toLong) }
        .toDF("vec_id", "rank")
    val a = ranked(1L to 10L)
    val same = Eval.rboOverlap(a, ranked(1L to 10L), col("vec_id"),
      col("rank"), k = 10)
      .as[(Long, Long, Double, Double)].collect().head
    assert(same._1 == 10 && same._2 == 10 && same._3 == 1.0)
    // full agreement: rbo = (1-p) * sum p^(d-1) = 1 - p^10 = 0.6513216
    assert(math.abs(same._4 - 0.6513216) < 1e-3, s"got ${same._4}")
    val disjoint = Eval.rboOverlap(a, ranked(101L to 110L), col("vec_id"),
      col("rank"), k = 10)
      .as[(Long, Long, Double, Double)].collect().head
    assert(disjoint._2 == 0 && disjoint._3 == 0.0 && disjoint._4 == 0.0)
    // agreement only at rank 1 must outweigh agreement only at rank 10
    val top = Eval.rboOverlap(a, ranked(Seq(1L) ++ (102L to 110L)),
      col("vec_id"), col("rank"), k = 10)
      .as[(Long, Long, Double, Double)].collect().head
    val bottom = Eval.rboOverlap(a, ranked((101L to 109L) :+ 10L),
      col("vec_id"), col("rank"), k = 10)
      .as[(Long, Long, Double, Double)].collect().head
    assert(top._2 == 1 && bottom._2 == 1)
    assert(top._4 > 3 * bottom._4,
      s"rank-1 agreement ${top._4} must dominate rank-10 ${bottom._4}")
  }

  test("prAuc: hand block AP, perfect separation = 1, ties form one block, no-positive NULL") {
    // scores 3,2,1 with labels 1,0,1: blocks desc → terms
    // (1/2)·(1/1) + 0 + (1/2)·(2/3) = 0.833333333
    val g = Seq((3.0, true), (2.0, false), (1.0, true)).toDF("s", "y")
    val r = Eval.prAuc(g, col("s"), col("y"))
      .as[(Long, Long, Option[Double])].collect().head
    assert(r == ((2L, 1L, Some(0.833333))), s"got $r")
    // perfect separation: every positive above every negative → AP 1
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
      .toDF("s", "y")
    assert(Eval.prAuc(perfect, col("s"), col("y"))
      .as[(Long, Long, Option[Double])].collect().head ==
      ((2L, 2L, Some(1.0))))
    // tied scores are ONE block: {1.0: pos, 1.0: neg} → P = 1/2 at R 1
    val tied = Seq((1.0, true), (1.0, false)).toDF("s", "y")
    assert(Eval.prAuc(tied, col("s"), col("y"))
      .as[(Long, Long, Option[Double])].collect().head ==
      ((1L, 1L, Some(0.5))))
    // no positives: AP undefined → NULL, not 0
    val neg = Seq((1.0, false), (0.5, false)).toDF("s", "y")
    assert(Eval.prAuc(neg, col("s"), col("y"))
      .as[(Long, Long, Option[Double])].collect().head ==
      ((0L, 2L, None)))
  }

  test("liftTable: hand deciles — top-loaded positives, exact capture and lift") {
    // scores 10..1, ids 1..10, positives on the top five, 5 buckets of 2
    val rows = (1 to 10).map(i => (i.toLong, 11.0 - i, i <= 5))
      .toDF("id", "s", "y")
    val got = Eval.liftTable(rows, col("s"), col("id"), col("y"), buckets = 5)
      .as[(Long, Long, Long, Double, Option[Double], Option[Double])]
      .collect()
    assert(got.map(_._1).toSeq == (1L to 5L))
    assert(got.forall(_._2 == 2L))
    // bucket 1: both positive → rate 1, capture 2/5, lift (2·10)/(2·5)=2
    assert(got(0) == ((1L, 2L, 2L, 1.0, Some(0.4), Some(2.0))), s"got ${got(0)}")
    // bucket 3 straddles the boundary: 1 of 2 positive, capture complete
    assert(got(2) == ((3L, 2L, 1L, 0.5, Some(1.0), Some(1.0))))
    assert(got(4) == ((5L, 2L, 0L, 0.0, Some(1.0), Some(0.0))))
    // no positives anywhere: rate 0, capture/lift NULL (not fake zeros)
    val none = Eval.liftTable(rows.withColumn("y", lit(false)),
        col("s"), col("id"), col("y"), buckets = 5)
      .as[(Long, Long, Long, Double, Option[Double], Option[Double])]
      .collect()
    assert(none.forall(r => r._5.isEmpty && r._6.isEmpty))
  }

  test("confusionMatrix: per-class P/R/F1 from hand cells; one-sided classes guarded") {
    val rows = Seq.fill(3)(("en", "en")) ++ Seq(("en", "de")) ++
      Seq.fill(2)(("de", "de")) ++ Seq(("es", "de")) ++ Seq(("en", "fr"))
    val got = Eval.confusionMatrix(rows.toDF("a", "p"), col("a"), col("p"))
      .as[(String, Long, Long, Long, Long, Long,
        Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    // en: actual 5, pred 3, tp 3 → P 1.0, R 0.6, F1 6/8
    assert(got("en") == (("en", 5L, 3L, 3L, 0L, 2L,
      Some(1.0), Some(0.6), Some(0.75))), s"got ${got("en")}")
    // de: actual 2, pred 4, tp 2 → P 0.5, R 1.0, F1 4/6
    assert(got("de") == (("de", 2L, 4L, 2L, 2L, 0L,
      Some(0.5), Some(1.0), Some(0.666667))))
    // es: never predicted → precision NULL, recall 0
    assert(got("es")._7.isEmpty && got("es")._8.contains(0.0))
    // fr: predicted only → recall NULL, precision 0
    assert(got("fr")._2 == 0L && got("fr")._8.isEmpty &&
      got("fr")._7.contains(0.0))
  }

  test("corrMatrix: exact ±1 on linear pairs, NULL on a constant column, hand value") {
    val df = Seq((1.0, 2.0, -1.0, 7.0, 1.0), (2.0, 4.0, -2.0, 7.0, 3.0),
      (3.0, 6.0, -3.0, 7.0, 2.0))
      .toDF("x", "y2x", "negx", "c", "w")
    val got = Eval.corrMatrix(df, Seq(
      "c" -> col("c"), "negx" -> col("negx"), "w" -> col("w"),
      "x" -> col("x"), "y2x" -> col("y2x")))
      .as[(String, String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(got.size == 10)
    assert(got(("x", "y2x")).contains(1.0))
    assert(got(("negx", "x")).contains(-1.0))
    // constant column: zero variance → NULL for every pair with it
    assert(got(("c", "x")).isEmpty && got(("c", "w")).isEmpty)
    // x=(1,2,3), w=(1,3,2): r = (3·13 − 36)/sqrt(6)·sqrt(6) = 0.5
    assert(got(("w", "x")).contains(0.5), s"got ${got(("w", "x"))}")
  }

  test("corrMatrix: listwise-complete n; pair order follows the caller") {
    val df = Seq((Some(1.0), Some(1.0), Some(1.0)),
      (Some(2.0), Some(3.0), None), // null in ANY column drops the row
      (Some(3.0), Some(2.0), Some(2.0)),
      (Some(4.0), Some(4.0), Some(3.0)))
      .toDF("a", "b", "c")
    val got = Eval.corrMatrix(df,
      Seq("a" -> col("a"), "b" -> col("b"), "c" -> col("c")))
      .as[(String, String, Long, Option[Double])].collect()
    assert(got.forall(_._3 == 3L), s"listwise n must be 3: ${got.toSeq}")
    assert(got.map(r => (r._1, r._2)).toSeq ==
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
  }

  // ── bestSplit ──────────────────────────────────────────────────────

  test("bestSplit: the CART stump lands on the planted boundary") {
    // scores 1..4, 10 rows each; 10% positive below 2.5, 90% above →
    // the boundary is between 2 and 3, i.e. threshold 2
    val rows = Seq(1, 2, 3, 4).flatMap { sVal =>
      (1 to 10).map(i => (sVal.toDouble,
        if (sVal <= 2) i <= 1 else i <= 9))
    }
    val got = Eval.bestSplit(rows.toDF("s", "y"), col("s"), col("y"))
      .collect().head
    assert(got.getAs[Double]("best_threshold") == 2.0)
    assert(got.getAs[Long]("n") == 40L && got.getAs[Long]("n_pos") == 20L)
    assert(got.getAs[Long]("left_n") == 20L &&
      got.getAs[Long]("left_pos") == 2L)
    assert(got.getAs[Long]("right_n") == 20L &&
      got.getAs[Long]("right_pos") == 18L)
    // both sides 0.1/0.9 → weighted gini 0.18; root 0.5; gain 0.32
    def g(p: Double) = 1.0 - p * p - (1.0 - p) * (1.0 - p)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Double]("gini_split") == r6(g(0.1)))
    assert(got.getAs[Double]("gini_root") == 0.5)
    assert(got.getAs[Double]("gain") == r6(0.5 - r6(g(0.1))))
  }

  test("bestSplit: unsplittable data keeps the root as its own answer") {
    // one score value only: the single candidate IS "no split" (empty
    // right side) and scores the root impurity
    val rows = (1 to 10).map(i => (3.0, i <= 4))
    val got = Eval.bestSplit(rows.toDF("s", "y"), col("s"), col("y"))
      .collect().head
    assert(got.getAs[Double]("best_threshold") == 3.0)
    assert(got.getAs[Double]("gini_split") ==
      got.getAs[Double]("gini_root"))
    assert(got.getAs[Double]("gain") == 0.0)
    assert(got.getAs[Long]("right_n") == 0L)
  }

  // ── mcnemar ────────────────────────────────────────────────────────

  test("mcnemar: hand-computed cells and continuity-corrected chi2") {
    // truth 't' everywhere; 4 both-right, 2 both-wrong, 3 A-only,
    // 1 B-only → χ² = (|3−1|−1)²/4 = 0.25
    val rows =
      Seq.fill(4)(("t", "t", "t")) ++ Seq.fill(2)(("f", "f", "t")) ++
        Seq.fill(3)(("t", "f", "t")) :+ (("f", "t", "t"))
    val got = Eval.mcnemar(rows.toDF("pa", "pb", "y"),
      col("pa"), col("pb"), col("y")).collect().head
    assert(got.getAs[Long]("n") == 10L)
    assert(got.getAs[Long]("n_both_right") == 4L &&
      got.getAs[Long]("n_both_wrong") == 2L)
    assert(got.getAs[Long]("n_a_only") == 3L &&
      got.getAs[Long]("n_b_only") == 1L)
    assert(got.getAs[Double]("chi2") == 0.25)
    assert(!got.getAs[Boolean]("significant"))
  }

  test("mcnemar: b = c lands chi2 0; zero discordant lands NULL, not 0/0") {
    val tied = Seq(("t", "f", "t"), ("f", "t", "t"),
      ("t", "f", "t"), ("f", "t", "t"))
    val g1 = Eval.mcnemar(tied.toDF("pa", "pb", "y"),
      col("pa"), col("pb"), col("y")).collect().head
    assert(g1.getAs[Double]("chi2") == 0.0) // max(|2−2|−1, 0)² = 0
    val agree = Seq(("t", "t", "t"), ("f", "f", "t"),
      (null, "t", "t")) // null prediction: pair dropped from n
    val g2 = Eval.mcnemar(agree.toDF("pa", "pb", "y"),
      col("pa"), col("pb"), col("y")).collect().head
    assert(g2.getAs[Long]("n") == 2L)
    assert(g2.isNullAt(g2.fieldIndex("chi2")))
    assert(g2.isNullAt(g2.fieldIndex("significant")))
  }

  // ── simpsonsSlope ────────────────────────────────────────────────

  test("simpsonsSlope: planted Yule-Simpson reversal flags both groups") {
    // within both groups y FALLS with x (slope -1); across groups the
    // high-x group has high y, so the pooled slope is +396/404 =
    // +0.980198 — the textbook reversal.
    val pts = Seq(
      ("a", 0.0, 2.0), ("a", 1.0, 1.0),
      ("b", 10.0, 12.0), ("b", 11.0, 11.0))
    val got = Eval.simpsonsSlope(pts.toDF("g", "x", "y"),
        col("g"), col("x"), col("y"))
      .as[(String, Long, Option[Double], Option[Double], Option[Boolean])]
      .collect().toSeq
    assert(got == Seq(
      ("a", 2L, Some(-1.0), Some(0.980198), Some(true)),
      ("b", 2L, Some(-1.0), Some(0.980198), Some(true))))
  }

  test("simpsonsSlope: constant-x group reads NULL slope and NULL flips") {
    val pts = Seq(
      ("a", 5.0, 1.0), ("a", 5.0, 9.0), // zero x-variance
      ("b", 0.0, 0.0), ("b", 1.0, 1.0))
    val got = Eval.simpsonsSlope(pts.toDF("g", "x", "y"),
        col("g"), col("x"), col("y"))
      .as[(String, Long, Option[Double], Option[Double], Option[Boolean])]
      .collect().toSeq
    val a = got.find(_._1 == "a").get
    assert(a._3.isEmpty && a._5.isEmpty)
    val b = got.find(_._1 == "b").get
    assert(b._3.contains(1.0) && b._5.contains(false))
  }

  // ── sprt ─────────────────────────────────────────────────────────

  private def sprtTs(n: Long) = new java.sql.Timestamp(1700000000000L + n * 1000L)

  test("sprt: H1 boundary crossing at the hand-computed step, final LLR after it") {
    // p0=.25, p1=.75: increments ±q6(ln 3) = ±1.098612; A = ln 19 =
    // 2.944439. s,s,s crosses at n=3 (3.295836); the trailing f,f pull
    // the FINAL llr back to 1.098612 but the decision stands at rn 3.
    val ev = Seq(true, true, true, false, false).zipWithIndex
      .map { case (x, i) => (i.toLong, sprtTs(i.toLong), x) }
      .toDF("id", "ts", "x")
    val got = Eval.sprt(ev, col("ts"), col("id"), col("x"),
      p0 = 0.25, p1 = 0.75).collect().head
    assert(got.getAs[Long]("n") == 5L)
    assert(got.getAs[Long]("n_success") == 3L)
    assert(got.getAs[Double]("llr_final") == 1.098612)
    assert(got.getAs[String]("decision") == "accept_h1")
    assert(got.getAs[Long]("n_at_decision") == 3L)
    assert(got.getAs[Double]("llr_at_decision") == 3.295836)
  }

  test("sprt: H0 crossing on an all-failure stream; undecided stream continues") {
    val lose = Seq(false, false, false).zipWithIndex
      .map { case (x, i) => (i.toLong, sprtTs(i.toLong), x) }
      .toDF("id", "ts", "x")
    val g1 = Eval.sprt(lose, col("ts"), col("id"), col("x"),
      p0 = 0.25, p1 = 0.75).collect().head
    assert(g1.getAs[String]("decision") == "accept_h0")
    assert(g1.getAs[Long]("n_at_decision") == 3L)
    assert(g1.getAs[Double]("llr_at_decision") == -3.295836)
    val mid = Seq(true, false).zipWithIndex
      .map { case (x, i) => (i.toLong, sprtTs(i.toLong), x) }
      .toDF("id", "ts", "x")
    val g2 = Eval.sprt(mid, col("ts"), col("id"), col("x"),
      p0 = 0.25, p1 = 0.75).collect().head
    assert(g2.getAs[String]("decision") == "continue")
    assert(g2.isNullAt(g2.fieldIndex("n_at_decision")))
    assert(g2.isNullAt(g2.fieldIndex("llr_at_decision")))
    assert(g2.getAs[Double]("llr_final") == 0.0)
  }

  test("sprt: day-stitched walk crossing calendar days keeps exact rn/llr") {
    // events every 10 hours span three calendar days; walk t,t,f,t,t
    // with ±q6(ln 3) increments first crosses A = ln 19 = 2.944439 at
    // rn 5 (1.098612, 2.197224, 1.098612, 2.197224, 3.295836) — the
    // per-day offsets must stitch to the same exact decimals
    val ev = Seq(true, true, false, true, true).zipWithIndex
      .map { case (x, i) =>
        (i.toLong,
          new java.sql.Timestamp(1700000000000L + i * 36000000L), x) }
      .toDF("id", "ts", "x")
    val got = Eval.sprt(ev, col("ts"), col("id"), col("x"),
      p0 = 0.25, p1 = 0.75).collect().head
    assert(got.getAs[Long]("n") == 5L)
    assert(got.getAs[Long]("n_success") == 4L)
    assert(got.getAs[String]("decision") == "accept_h1")
    assert(got.getAs[Long]("n_at_decision") == 5L)
    assert(got.getAs[Double]("llr_at_decision") == 3.295836)
    assert(got.getAs[Double]("llr_final") == 3.295836)
  }

  test("sprtByArm: arms walk and decide independently") {
    // interleaved timestamps: arm A all-success (accept_h1 at its rn
    // 3), arm B all-failure (accept_h0 at its rn 3)
    val rows = (0 until 6).map { i =>
      val a = i % 2 == 0
      (i.toLong, sprtTs(i.toLong), if (a) "A" else "B", a)
    }.toDF("id", "ts", "arm", "x")
    val got = Eval.sprtByArm(rows, col("arm"), col("ts"), col("id"),
      col("x"), p0 = 0.25, p1 = 0.75)
      .collect().map(r => r.getAs[String]("arm") -> r).toMap
    assert(got.keySet == Set("A", "B"))
    val a = got("A")
    assert(a.getAs[Long]("n") == 3L)
    assert(a.getAs[String]("decision") == "accept_h1")
    assert(a.getAs[Long]("n_at_decision") == 3L)
    assert(a.getAs[Double]("llr_at_decision") == 3.295836)
    val b = got("B")
    assert(b.getAs[String]("decision") == "accept_h0")
    assert(b.getAs[Long]("n_at_decision") == 3L)
    assert(b.getAs[Double]("llr_at_decision") == -3.295836)
  }

  test("sprt: degenerate design alpha + beta >= 1 is rejected") {
    val ev = Seq((1L, sprtTs(1L), true)).toDF("id", "ts", "x")
    intercept[IllegalArgumentException] {
      Eval.sprt(ev, col("ts"), col("id"), col("x"),
        p0 = 0.25, p1 = 0.75, alpha = 0.6, beta = 0.5)
    }
  }
}
