package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Testdata table loader. One quirk: `events.ts` is parquet INT64
  * TIMESTAMP(NANOS), which Spark refuses outright (PARQUET_TYPE_ILLEGAL)
  * unless `spark.sql.legacy.parquet.nanosAsLong=true` is set — our
  * Verify/Bench/test sessions set it, the column arrives as Long
  * nanoseconds, and we rebuild a proper microsecond timestamp here
  * (`ts div 1000` in integer math — no double round-trip, no precision
  * loss). Downstream operators always see `ts: timestamp`. */
object Tables {
  def apply(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
      df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
