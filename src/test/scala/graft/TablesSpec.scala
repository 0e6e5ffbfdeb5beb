package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Testdata-contract guard. The driver regenerates
  * /root/testdata/sf* between rounds, and a silent encoding change
  * (round 7: events.ts INT64-nanos → timestamp[us]/NTZ) once broke six
  * queries with no in-tree red row. This spec pins the contract: every
  * table loads through Tables, and the normalized events.ts is ALWAYS
  * TimestampType — never NTZ, never Long — so the next refresh fails
  * here, in tests, not in the driver's bench. */
class TablesSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  test("every testdata table loads and is non-empty") {
    tables.foreach { t =>
      val df = Tables(spark, dir, t)
      assert(df.limit(1).count() == 1L, s"table $t is empty or unreadable")
    }
  }

  test("events.ts normalizes to TimestampType regardless of on-disk encoding") {
    val events = Tables(spark, dir, "events")
    val tsField = events.schema.fields.find(_.name == "ts")
    assert(tsField.isDefined, "events has no ts column")
    assert(tsField.get.dataType == TimestampType,
      s"events.ts normalized to ${tsField.get.dataType}, want TimestampType " +
        "(NTZ/Long leaking through Tables.normalizeTs breaks every " +
        "unix_millis/window/watermark consumer)")
    assert(Tables.tsIsNormalized(events.schema))
    // the type must also be USABLE: unix_millis is the call the NTZ
    // regression killed with DATATYPE_MISMATCH
    val ms = events.select(unix_millis(col("ts")).as("ms")).limit(5).collect()
    assert(ms.nonEmpty && ms.forall(r => r.getLong(0) > 0L))
  }

  test("normalizeTs handles an NTZ ts column") {
    import spark.implicits._
    val ntz = Seq("2024-01-02T03:04:05.123456").toDF("s")
      .select(col("s").cast(TimestampNTZType).as("ts"))
    assert(ntz.schema.head.dataType == TimestampNTZType)
    val fixed = Tables.normalizeTs(ntz)
    assert(fixed.schema.head.dataType == TimestampType)
    // session TZ is pinned UTC, so the wall-clock instant is preserved
    assert(fixed.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .head().getString(0) == "2024-01-02 03:04:05.123456")
  }

  test("normalizeTs handles a legacy nanos-as-long ts column") {
    import spark.implicits._
    // 2024-01-02T03:04:05.123456789 UTC as nanos since epoch
    val nanos = 1704164645123456789L
    val legacy = Seq(nanos).toDF("ts")
    val fixed = Tables.normalizeTs(legacy)
    assert(fixed.schema.head.dataType == TimestampType)
    assert(fixed.select(unix_micros(col("ts"))).head().getLong(0) ==
      nanos / 1000L) // integer truncation, no double round-trip
  }

  test("normalizeTs: all four plausible driver encodings land on TimestampType") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ts-enc").toString
    val base = Seq("2024-01-02 03:04:05.123456").toDF("s")
      .select(col("s").cast(TimestampType).as("ts"))
    val prevOut = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      // (a) INT96 legacy — Spark reads it back as TimestampType directly
      spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
      base.write.mode("overwrite").parquet(s"$tmp/int96")
      // (b) tz-aware timestamp[us, tz=UTC] — also arrives as TimestampType
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      base.write.mode("overwrite").parquet(s"$tmp/micros_utc")
      // (c) timestamp[us] no-tz — arrives NTZ, normalizer casts (r7 drift)
      base.select(col("ts").cast(TimestampNTZType).as("ts"))
        .write.mode("overwrite").parquet(s"$tmp/ntz")
      // (d) INT64 TIMESTAMP(NANOS) — with nanosAsLong (set in every engine
      // session) it arrives as raw Long nanos; a plain-int64 fixture has
      // the identical arrival shape
      Seq(1704164645123456789L).toDF("ts")
        .write.mode("overwrite").parquet(s"$tmp/nanos")
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prevOut)
    for (enc <- Seq("int96", "micros_utc", "ntz", "nanos")) {
      val fixed = Tables.normalizeTs(spark.read.parquet(s"$tmp/$enc"))
      assert(fixed.schema.head.dataType == TimestampType,
        s"encoding $enc normalized to ${fixed.schema.head.dataType}")
      assert(fixed.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .head().getString(0) == "2024-01-02 03:04:05.123456",
        s"encoding $enc changed the instant")
    }
  }

  test("streaming file source sees the same normalized schema as batch") {
    val batch = Tables(spark, dir, "events")
    val stream = graft.streaming.EventStreams
      .readEventStream(spark, s"$dir/events.parquet")
    assert(stream.isStreaming)
    assert(stream.schema == batch.schema,
      s"stream schema ${stream.schema.simpleString} != " +
        s"batch schema ${batch.schema.simpleString}")
  }
}
