package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev one-off (r10): classify the r9 verdict's j2_join_agg sf0.1 drift
  * (0.82 -> 1.31 s across rounds) as noise or plan change. Code is
  * byte-identical to r8 (git diff empty), so the only open question is
  * the run-to-run spread in one warmed JVM. Not part of the engine. */
object J2TimingProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(15)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("j2_join_agg")(spark, dir).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val s = times.sorted
    println(f"[j2probe] reps=$reps min=${s.head}%.2f median=${s(reps / 2)}%.2f " +
      f"p90=${s((reps * 9) / 10)}%.2f max=${s.last}%.2f all=${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
