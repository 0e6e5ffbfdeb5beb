package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class QualityModelSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // linearly separable planted data: label = 1 iff x0 + x1 > 1
  private def planted(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val x0 = rnd.nextDouble() * 2 - 0.5
      val x1 = rnd.nextDouble() * 2 - 0.5
      val y = if (x0 + x1 > 1.0) 1.0 else 0.0
      (x0, x1, y)
    }
  }

  test("trainLogReg separates planted data and loss decreases") {
    val df = planted(400, 3).toDF("x0", "x1", "y")
    val m = QualityModel.trainLogReg(
      df, Seq(col("x0"), col("x1")), col("y"), iters = 60, lr = 2.0)
    // loss trajectory: strictly better than start, ends low
    assert(m.losses.last < m.losses.head * 0.5,
      s"loss must at least halve: ${m.losses.head} -> ${m.losses.last}")
    // thresholded accuracy on the training set
    val acc = df
      .withColumn("p", m.scoreCol(Seq(col("x0"), col("x1"))))
      .withColumn("hit",
        (when(col("p") >= 0.5, 1.0).otherwise(0.0) === col("y")).cast("int"))
      .agg(avg(col("hit"))).as[Double].collect().head
    assert(acc >= 0.95, s"train accuracy $acc")
    // the learned boundary has positive weights on both features
    assert(m.weights(1) > 0 && m.weights(2) > 0)
  }

  test("fit is bit-deterministic across repartitionings") {
    val base = planted(300, 7).toDF("x0", "x1", "y")
    def fit(df: org.apache.spark.sql.DataFrame) =
      QualityModel.trainLogReg(
        df, Seq(col("x0"), col("x1")), col("y"), iters = 15, lr = 1.0)
    val w1 = fit(base.repartition(2)).weights.toSeq
    val w2 = fit(base.repartition(13, col("x0"))).weights.toSeq
    assert(w1 == w2, "decimal gradient sums must make layout irrelevant")
  }

  test("scoreCol is a pure map-side expression (no shuffle)") {
    val df = planted(50, 5).toDF("x0", "x1", "y")
    val m = QualityModel.trainLogReg(
      df, Seq(col("x0"), col("x1")), col("y"), iters = 3)
    val scored = df.withColumn("p", m.scoreCol(Seq(col("x0"), col("x1"))))
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "scoring must not shuffle")
    // probabilities are valid
    val ps = scored.select("p").as[Double].collect()
    assert(ps.forall(p => p >= 0.0 && p <= 1.0))
  }

  test("l2 shrinks feature weights but not the bias path") {
    val df = planted(300, 11).toDF("x0", "x1", "y")
    val free = QualityModel.trainLogReg(
      df, Seq(col("x0"), col("x1")), col("y"), iters = 40, lr = 2.0)
    val ridge = QualityModel.trainLogReg(
      df, Seq(col("x0"), col("x1")), col("y"), iters = 40, lr = 2.0, l2 = 0.5)
    assert(math.abs(ridge.weights(1)) < math.abs(free.weights(1)))
    assert(math.abs(ridge.weights(2)) < math.abs(free.weights(2)))
  }
}
