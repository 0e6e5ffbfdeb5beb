package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev receipt for the r9 j5_revenue_topk profiling ask (VERDICT r8 #4):
  * times the shipped orderkey-pre-aggregated formulation against a
  * direct join + custkey-only aggregate on an arbitrary scale dir, and
  * cross-checks both produce the same top-20.
  *
  * Usage: runMain graft.tools.J5Probe <sfDir> [reps]
  */
object J5Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String) = spark.read.parquet(s"$dir/$name.parquet")

    // (a) shipped: pre-aggregate revenue per orderkey below the join
    def preAgg(): DataFrame = {
      val o = t("orders")
      val liRev = t("lineitem")
        .groupBy("l_orderkey")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,6)")).as("rev0"))
      val custRev = liRev
        .join(o, liRev("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("rev0")).cast("double").as("revenue"))
      custRev.join(t("customer"), custRev("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name").as("name"), col("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }

    // (b) direct: join raw lineitem terms to (orderkey, custkey), one
    // custkey-keyed aggregate (map-side partial) — no orderkey hash table
    def direct(): DataFrame = {
      val o = t("orders").select("o_orderkey", "o_custkey")
      val li = t("lineitem").select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,6)").as("rv"))
      val custRev = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("rv")).cast("double").as("revenue"))
      custRev.join(t("customer"), custRev("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name").as("name"), col("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }

    val a = preAgg().collect().toSeq
    val b = direct().collect().toSeq
    println(s"[j5probe] results match: ${a == b} (a=${a.length} b=${b.length})")

    for ((label, mk) <- Seq("preagg" -> preAgg _, "direct" -> direct _)) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[j5probe] $label: median ${times.sorted.apply(reps / 2)}%.2f s " +
        s"(all ${times.map(x => f"$x%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
