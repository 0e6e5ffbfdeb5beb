package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-shape spot-reader: print the executed physical plan of named
  * contract queries against a (small) scale dir — the per-operator
  * audit the repo's scale discipline demands (is the filter pushed,
  * is the small side broadcast, does anything corpus-sized sort?).
  *
  * Usage: runMain graft.tools.PlanRead <sfDir> <query1,query2,...>
  */
object PlanRead {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: PlanRead <sfDir> <q1,q2,...>")
    val spark = SparkSession.builder()
      .master(s"local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .appName("planread")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try args(1).split(",").foreach { q =>
      println(s"\n======== $q ========")
      val df = graft.SparkEntry.queries(q.trim)(spark, args(0))
      println(df.queryExecution.executedPlan.toString.take(6000))
    } finally spark.stop()
  }
}
