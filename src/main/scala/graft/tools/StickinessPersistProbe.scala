package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Events

/** Dev receipt (VERDICT r14 ask #4): stickiness with the (user, day)
  * working set materialized once (eager localCheckpoint) vs re-derived
  * per coverage reach. One VARIANT per JVM — the r13 harness lesson:
  * probe walls in one JVM are position-dominated, so absolute A/B
  * needs a fresh JVM per variant, min-of-3 within it.
  *
  * Usage: runMain graft.tools.StickinessPersistProbe <sfDir> <checkpoint|rescan>
  */
object StickinessPersistProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val variant = args(1)
    require(variant == "checkpoint" || variant == "rescan",
      s"variant? $variant")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = graft.Tables(spark, dir, "events")
    val times = (1 to 3).map { i =>
      val t0 = System.nanoTime()
      val n = Events.stickiness(events,
        materialize = variant == "checkpoint").count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[stickiness-persist] $variant run$i: $sec%.3f s ($n rows)")
      sec
    }
    println(f"[stickiness-persist] $variant min-of-3: ${times.min}%.3f s")
    spark.stop()
  }
}
