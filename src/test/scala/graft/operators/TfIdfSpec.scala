package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TfIdfSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // 3 docs: "spark" in all (df=3), "fast" in two (df=2), the rest unique
  private lazy val docs = Seq(
    (1L, "spark is fast fast fast"),
    (2L, "spark is nice"),
    (3L, "spark fast engine")).toDF("doc_id", "text")

  test("topTerms ranks by tf desc then df asc then term") {
    val got = TfIdf.topTerms(docs, col("doc_id"), col("text"), 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"),
        r.getAs[String]("term"), r.getAs[Long]("tf"), r.getAs[Long]("df")))
    // doc 1: fast tf=3 wins; then tf=1 ties broken by df asc → "is" (df 2)
    assert(got.filter(_._1 == 1L).toSeq ==
      Seq((1L, 1L, "fast", 3L, 2L), (1L, 2L, "is", 1L, 2L)))
    // doc 3: all tf=1 → df asc then term asc: engine (df 1), fast (df 2)
    assert(got.filter(_._1 == 3L).toSeq ==
      Seq((3L, 1L, "engine", 1L, 1L), (3L, 2L, "fast", 1L, 2L)))
  }

  test("score is tf * N / df and N is broadcast, not shuffled") {
    val q = TfIdf.topTerms(docs, col("doc_id"), col("text"), 3)
    val fast = q.filter(col("doc_id") === 1L && col("term") === "fast")
      .collect().head
    assert(fast.getAs[Double]("score") == 3.0 * 3 / 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("Broadcast"),
      "the single-row corpus count must arrive via broadcast")
  }
}
