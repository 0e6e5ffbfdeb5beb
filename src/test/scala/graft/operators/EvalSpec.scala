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
}
