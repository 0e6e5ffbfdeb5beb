package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Partitioning

/** Dev receipt: does the salted join (and AQE's skew-join split) actually
  * bound the straggler a planted hot key creates? NOT part of the engine —
  * a measurement harness behind SCALE.md's "skew receipt".
  *
  * Setup: lineitem at the given SF with ~30% of left rows collapsed onto
  * ONE join key, joined (sort-merge — broadcast disabled, the 100 TB
  * regime where the right side doesn't fit) against the distinct-key
  * table. Three variants, each timed and histogrammed by output
  * partition:
  *
  *   plain_noskew — AQE skew-join OFF: the hot key's rows land in one
  *                  reducer (the straggler this receipt quantifies);
  *   plain_aqe    — AQE skew-join ON, thresholds scaled to the local
  *                  data volume (defaults trigger at 256 MB partitions —
  *                  at 100 TB they fire untouched; scaling them here
  *                  demonstrates the mechanism, not a tuned number);
  *   salted       — Partitioning.saltedJoin factor 8: the hot key is
  *                  pre-split across 8 sub-keys, no AQE needed.
  *
  * Usage: runMain graft.tools.SkewReceiptProbe <sfDir>
  */
object SkewReceiptProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // sort-merge regime: the receipt targets joins too big to broadcast
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // AQE skew thresholds scaled to local volume (defaults: 256 MB)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // skew splits happen at MAP-BLOCK granularity: a reducer partition
      // is re-read as groups of map outputs, so a hot partition fed by a
      // single mapper is indivisible and reports "0 skewed partitions"
      // (measured here). 100 TB inputs have thousands of mappers; give
      // the 11 MB local scan more than one by shrinking the file split.
      .config("spark.sql.files.maxPartitionBytes", "512k")
      // not needed in this shape (measured: the split fires without it,
      // since the downstream agg re-shuffles regardless) — kept as an
      // escape hatch for experimenting with consumers that would inherit
      // the join's partitioning
      .config("spark.sql.adaptive.forceOptimizeSkewedJoin", sys.env.getOrElse("SKEW_PROBE_FORCE", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("SKEW_PROBE_EXPLAIN"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.adaptive", org.apache.logging.log4j.Level.DEBUG)

    val tmp = java.nio.file.Files.createTempDirectory("skew_receipt")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    // plant: ~30% of rows collapse onto hot key -1. Materialized to disk
    // in 32 files: the shipped parquet is ONE row group, i.e. one mapper —
    // and skew splits group MAP OUTPUTS, so a hot partition fed by a
    // single mapper is indivisible however low the thresholds (measured:
    // "number of skewed partitions: left 0"). 100 TB scans have
    // thousands of mappers; 32 files restore that shape locally.
    val leftPath = tmp.resolve("left.parquet").toString
    li.select(
      when(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(10)) < 3,
        lit(-1L)).otherwise(col("l_orderkey")).as("k"),
      col("l_extendedprice").as("v"),
      xxhash64(col("l_orderkey"), col("l_linenumber"), col("l_partkey")).as("row_id"))
      .repartition(32)
      .write.mode("overwrite").parquet(leftPath)
    val left = spark.read.parquet(leftPath)
    // right side goes to disk and back: a real dim table, AND a structural
    // requirement of AQE's skew rule — OptimizeSkewedJoin only matches a
    // join whose children are Sort(ShuffleQueryStage) DIRECTLY; leaving
    // the distinct() inline puts its final HashAggregate between the Sort
    // and the shuffle stage and the rule silently never fires (measured
    // here: no split at any threshold until the right side came from a
    // plain scan)
    val rightPath = tmp.resolve("right.parquet").toString
    left.select(col("k").as("rk")).distinct()
      .withColumn("payload", xxhash64(col("rk")))
      .write.mode("overwrite").parquet(rightPath)
    val right = spark.read.parquet(rightPath)

    // the histogram query CONSUMES the whole join output — summing both
    // sides' payloads so column pruning can't strip the join down to its
    // (constant, lz4-trivial) hot key: AQE detects skew by SHUFFLE BYTES,
    // and a key-only shuffle of one repeated value compresses below any
    // threshold (measured: the unpruned hot partition is ~MBs, the pruned
    // one ~KBs and invisible to the detector). Wall time of this query is
    // the join's wall time; per-pid row counts are the reducer histogram.
    def measure(label: String, out: DataFrame): Unit = {
      val q = out.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg(count(lit(1)).as("count"),
          sum(col("v")).as("v_sum"), sum(col("payload").cast("double")).as("p_sum"))
      val t0 = System.nanoTime()
      val hist = q.collect().map(_.getAs[Long]("count")).sorted
      val secs = (System.nanoTime() - t0) / 1e9
      val total = hist.sum
      println(f"$label%-14s wall=$secs%6.2f s  partitions=${hist.length}%4d  " +
        f"rows=$total%9d  max=${hist.last}%8d (${100.0 * hist.last / total}%5.1f%%)  " +
        f"p50=${hist(hist.length / 2)}%7d")
      if (sys.env.contains("SKEW_PROBE_EXPLAIN"))
        println(q.queryExecution.executedPlan.toString.linesIterator
          .filter(l => l.contains("Join") || l.contains("skew")).mkString("\n"))
    }

    def plain = left.join(right, col("k") === col("rk"))

    plain.count() // warm-up: JIT + codegen paid outside the measurements

    // SKEW_PROBE_ORDER=reverse runs the variants in the opposite order
    // in a fresh JVM — the order-independence check that separates the
    // variants' intrinsic walls from JIT/pagecache warm-up drift
    val variants: Seq[(String, () => Unit)] = Seq(
      ("plain_noskew", () => {
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        measure("plain_noskew", plain)
      }),
      ("plain_aqe", () => {
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        measure("plain_aqe", plain)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      }),
      ("salted", () => {
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        measure("salted",
          Partitioning.saltedJoin(left, right, "k", "rk", col("row_id"), 8))
      }))
    // SKEW_PROBE_VARIANT=<name> runs exactly ONE variant — the fresh-
    // JVM-per-variant mode the ABSOLUTE comparison requires: same-JVM
    // sequential walls are dominated by position (first variant reads
    // the parquet cold and compiles every codegen class; measured
    // forward/reverse runs flipped plain_noskew between 54.9 s and
    // 17.1 s with identical histograms). The histograms themselves are
    // position-free; only walls need forking.
    val chosen = sys.env.get("SKEW_PROBE_VARIANT") match {
      case Some(v) =>
        val hit = variants.filter(_._1 == v)
        require(hit.nonEmpty, s"unknown variant '$v' — " +
          s"one of ${variants.map(_._1).mkString("/")}")
        hit
      case None =>
        if (sys.env.get("SKEW_PROBE_ORDER").contains("reverse"))
          variants.reverse
        else variants
    }
    chosen.foreach(_._2())

    spark.stop()
  }
}
