package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** Testdata table loader. One quirk: `events.ts` has shipped in two
  * encodings across driver data refreshes, and the engine normalizes
  * BOTH so downstream operators always see `ts: timestamp` (µs, UTC):
  *
  *  - INT64 TIMESTAMP(NANOS): Spark refuses it outright
  *    (PARQUET_TYPE_ILLEGAL) unless
  *    `spark.sql.legacy.parquet.nanosAsLong=true` is set — our
  *    Verify/Bench/test sessions set it, the column arrives as Long
  *    nanoseconds, and we rebuild a microsecond timestamp (`ts div
  *    1000` in integer math — no double round-trip, no precision loss);
  *  - parquet `timestamp[us]` with no timezone: Spark 4 infers
  *    TIMESTAMP_NTZ, which `unix_millis`/`window`/watermarks reject
  *    (DATATYPE_MISMATCH: requires TIMESTAMP). Every engine entrypoint
  *    pins the session timezone to UTC, so `cast("timestamp")`
  *    reinterprets the wall-clock instant identically — a metadata
  *    change, not an arithmetic one.
  *
  * Two more encodings a driver refresh could plausibly ship — INT96
  * legacy timestamps and tz-aware `timestamp[us, tz=UTC]` — already
  * arrive from Spark's parquet reader as TimestampType, so the
  * normalizer passes them through untouched; TablesSpec pins all four
  * arrival shapes with synthetic parquet fixtures so the next silent
  * refresh is a red test, not a red round.
  */
object Tables {

  /** Normalize the `ts` column of an events-shaped schema in place.
    * Shared by the batch loader below and the streaming file source
    * (streaming.EventStreams.readEventStream) so a testdata encoding
    * change can never split the two paths again. Works on batch and
    * streaming DataFrames alike (withColumn only). */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType == LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(f) if f.dataType == TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** The post-normalization schema `ts` must have. */
  def tsIsNormalized(schema: StructType): Boolean =
    schema.fields.find(_.name == "ts").forall(_.dataType == TimestampType)

  def apply(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }
}
