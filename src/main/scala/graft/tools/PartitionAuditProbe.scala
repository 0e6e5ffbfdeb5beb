package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Sweeps the whole contract surface and reports, per query, the output
  * row count and the number of partitions the final stage ran with —
  * hunting for the fuzzy-join pathology (r7): a join/explode whose
  * OUTPUT multiplicity is invisible to AQE's byte-based coalescing, so
  * millions of rows materialize on one partition. Flags rows/partition
  * above a threshold. Not part of the contract surface.
  */
object PartitionAuditProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val flagRowsPerPart = args.lift(1).map(_.toLong).getOrElse(500000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val t0 = System.nanoTime()
        // count() executes the full plan; partition count of the final
        // RDD reflects what the materialization stage actually used
        val rdd = df.rdd
        val parts = rdd.getNumPartitions
        val rows = rdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val rpp = if (parts == 0) 0L else rows / math.max(parts, 1)
        val flag = if (rpp > flagRowsPerPart) "  <-- HOT" else ""
        println(f"[audit] $name%-28s rows=$rows%10d parts=$parts%4d rows/part=$rpp%9d ${sec}%6.2f s$flag")
      } catch {
        case e: Throwable => println(s"[audit] $name FAILED: ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
