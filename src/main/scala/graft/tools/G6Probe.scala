package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-cost probe for the r9 distributed exactQuantiles: where does
  * g6_quantiles_exact's wall go at a given scale dir — the split-point
  * pass, the count pass, or the rank-pick pass? Not contract surface.
  *
  * Usage: runMain graft.tools.G6Probe <sfDir> [reps]
  */
object G6Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[g6probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); a
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    println(s"[g6probe] rows=${li.count()}")
    val base = li.select(col("l_returnflag").as("group_key"),
      col("l_extendedprice").as("v")).filter(col("v").isNotNull)
    val fracs = (1 until 32).map(i => i.toDouble / 32)
    timed("pass 0: sampled percentile splits (collect)") {
      base.sample(withReplacement = false, 0.01, seed = 42L)
        .groupBy("group_key")
        .agg(percentile_approx(col("v").cast("double"),
          array(fracs.map(lit): _*), lit(1000)).as("bs")).collect()
    }
    // interleaved A/B: rescan vs localCheckpoint'd bucketed lineage
    // (r9 verdict ask #4) — alternation cancels warmup/load drift
    (1 to reps).foreach { _ =>
      val a = timed("full operator, rescan (collect)") {
        graft.operators.Relational.exactQuantiles(
          li, col("l_returnflag"), col("l_extendedprice"),
          Seq(0.25, 0.50, 0.75)).collect()
      }
      val b = timed("full operator, materialized (collect)") {
        graft.operators.Relational.exactQuantiles(
          li, col("l_returnflag"), col("l_extendedprice"),
          Seq(0.25, 0.50, 0.75), materialize = true).collect()
      }
      require(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq,
        "variants must agree")
    }
    spark.stop()
  }
}
