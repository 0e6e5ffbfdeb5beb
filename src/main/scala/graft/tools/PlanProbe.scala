package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: physical-plan hygiene probe for contract queries. For each
  * named query (args; default = all), executes it against a small SF
  * and prints the post-AQE plan's exchange / reused-exchange / file-scan
  * counts plus the exchange lines — the quick answer to "did this query
  * just plan N corpus scans?" (the ext_cooccur_lift lesson: a DataFrame
  * referenced from several plan branches re-derives its whole subtree
  * per reference, and neither ReuseExchange nor AQE dedupes it if the
  * branches canonicalize differently). NOT part of the engine.
  *
  * Usage: runMain graft.tools.PlanProbe [sfDir] [query ...]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- names) {
      println(s"===== $q")
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      // Execute THIS DataFrame's own QueryExecution: a write() plans a
      // separate command QE and leaves df's AdaptiveSparkPlan unexecuted
      // (isFinalPlan=false, ReusedExchange structurally absent) — the
      // counts below would then describe a plan that never ran.
      df.collect()
      // the executed AdaptiveSparkPlan prints "Final Plan" AND "Initial
      // Plan" sections — keep only the final one or every count doubles
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      def n(pat: String) = pat.r.findAllIn(plan).length
      // "(?<!Reused)Exchange": a bare "Exchange" substring match would
      // also count every ReusedExchange line. Codegen stages print as
      // "*(k)" markers in the final-plan string, not "WholeStageCodegen".
      println(s"exchanges=${n("(?<!Reused)Exchange")} reused=${n("ReusedExchange")} " +
        s"scans=${n("Scan parquet")} codegen_spans=${n("\\*\\(\\d+\\)")}")
      plan.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("FileScan parquet"))
        .map(_.replaceAll("^[\\s:+-]+", "").take(120))
        .foreach(l => println("  " + l))
    }
    spark.stop()
  }
}
