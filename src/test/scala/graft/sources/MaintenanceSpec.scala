package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class MaintenanceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def fileNames(dir: String): Set[String] =
    new java.io.File(dir).listFiles().map(_.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
      .toSet

  test("compaction merges small files, preserves rows and content") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    val df = (1L to 5000L).toDF("k").withColumn("v", col("k") * 3)
    df.repartition(40).write.parquet(dir)
    assert(fileNames(dir).size == 40)
    val before = spark.read.parquet(dir).orderBy("k").collect().toSeq

    val report = Maintenance.compactParquet(spark, dir, targetFileBytes = 1L << 30)
    assert(report.filesBefore == 40L && report.filesAfter == 1L)
    assert(report.rows == 5000L)
    assert(fileNames(dir).size == 1)
    assert(spark.read.parquet(dir).orderBy("k").collect().toSeq == before)
    // no staging/retired residue
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(_.contains("__compact")))
  }

  test("compaction with sortBy restores disjoint per-file key ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-sort").toString + "/t"
    // shuffled appends: every file carries the full key range (no pruning)
    (1L to 8000L).toDF("k").withColumn("grp", pmod(col("k"), lit(4)))
      .repartition(16, col("grp")).write.parquet(dir)

    Maintenance.compactParquet(spark, dir, targetFileBytes = 20_000L, sortBy = Some("k"))
    val stats = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("k"))
      .groupBy("f").agg(min("k").as("lo"), max("k").as("hi"))
      .orderBy("lo").collect()
    assert(stats.length > 1, "target size should yield multiple files")
    stats.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"),
        "compacted files must carry disjoint key ranges")
      case _ =>
    }
    assert(spark.read.parquet(dir).count() == 8000L)
  }

  test("compaction with zorderBy bounds BOTH keys per file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-z").toString + "/t"
    // full 64x64 (a, b) grid, shuffled: no layout prunes anything
    (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b))
      .toDF("a", "b").repartition(16).write.parquet(dir)
    val bytes = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")).map(_.length).sum

    intercept[IllegalArgumentException] {
      Maintenance.compactParquet(spark, dir,
        sortBy = Some("a"), zorderBy = Some(("a", "b")))
    }
    val rep = Maintenance.compactParquet(spark, dir,
      targetFileBytes = math.max(1L, bytes / 16),
      zorderBy = Some(("a", "b")))
    assert(rep.rows == 4096L)
    assert(rep.filesAfter > 4, "need multiple files for a pruning claim")

    def matching(c: String, v: Long): Long = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col(c))
      .groupBy("f").agg(min(c).as("lo"), max(c).as("hi"))
      .filter(col("lo") <= v && col("hi") >= v).count()
    // a z-layout prunes point slices on EITHER column to ~sqrt(files)
    assert(matching("a", 33L) <= rep.filesAfter / 2, "a-slice should prune")
    assert(matching("b", 33L) <= rep.filesAfter / 2, "b-slice should prune")
    assert(spark.read.parquet(dir).count() == 4096L)
  }

  test("fileStats: per-file bounds match the layout; skipping audit works") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fstats").toString + "/t"
    (1L to 1000L).toDF("k").withColumn("v", col("k") * 2)
      .repartitionByRange(4, col("k")).write.parquet(dir)
    val stats = Maintenance.fileStats(spark, dir, Seq("k", "v")).collect()
    assert(stats.length == 4)
    assert(stats.map(_.getAs[Long]("n_rows")).sum == 1000L)
    // range-clustered: per-file k-ranges are disjoint and ordered
    val ranges = stats.map(r => (r.getAs[Long]("k_min"), r.getAs[Long]("k_max")))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._2 < b._1, s"overlap: $a $b")
      case _ =>
    }
    // the skipping audit: a point predicate overlaps exactly one box
    val hit = stats.count { r =>
      r.getAs[Long]("k_min") <= 500L && r.getAs[Long]("k_max") >= 500L }
    assert(hit == 1, s"k=500 must fall in exactly one file's box, got $hit")
  }

  test("vacuumCompactionDebris: old crash debris goes, live staging survives") {
    val root = java.nio.file.Files.createTempDirectory("graft-vacuum").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate an interrupted swap inside a partition tree + a live one
    val old1 = new org.apache.hadoop.fs.Path(root, ".t__compact_staging")
    val old2 = new org.apache.hadoop.fs.Path(root, "day=2024-01-01/.p__compact_retired")
    val live = new org.apache.hadoop.fs.Path(root, ".u__compact_staging_live")
    fs.mkdirs(old1); fs.mkdirs(old2); fs.mkdirs(live)
    // real data dir must survive regardless of age
    val data = new org.apache.hadoop.fs.Path(root, "day=2024-01-01")
    assert(fs.exists(data))
    val removed = Maintenance.vacuumCompactionDebris(spark, root, ttlMillis = -1)
    assert(removed == 2, s"exactly the two debris dirs: $removed")
    assert(!fs.exists(old1) && !fs.exists(old2))
    assert(fs.exists(live), "non-matching hidden dirs are not touched")
    assert(fs.exists(data))
    // with a real TTL, freshly-created debris (a CONCURRENT compaction)
    // is left alone
    fs.mkdirs(old1)
    assert(Maintenance.vacuumCompactionDebris(spark, root) == 0)
    assert(fs.exists(old1))
  }

  test("compactPartitioned rolls up only the fragmented partitions") {
    val root = java.nio.file.Files.createTempDirectory("graft-compact-part").toString + "/t"
    // day 1: one clean file; day 2: 8 small appended files
    val day1 = (1L to 100L).toDF("v").withColumn("day", lit("2024-01-01"))
    day1.repartition(1).write.partitionBy("day").parquet(root)
    (1 to 8).foreach { i =>
      ((i * 1000L) to (i * 1000L + 99L)).toDF("v")
        .withColumn("day", lit("2024-01-02"))
        .repartition(1).write.mode("append").partitionBy("day").parquet(root)
    }
    def partFiles(day: String): Map[String, Long] =
      new java.io.File(s"$root/day=$day").listFiles()
        .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(f => f.getName -> f.lastModified()).toMap
    val day1Before = partFiles("2024-01-01")
    assert(partFiles("2024-01-02").size == 8)

    val reports = Maintenance.compactPartitioned(spark, root, 1L << 30)
    // ONLY the fragmented partition was touched
    assert(reports.map(_.partition) == Seq("day=2024-01-02"))
    assert(reports.head.filesBefore == 8L && reports.head.filesAfter == 1L)
    assert(reports.head.rows == 800L)
    assert(partFiles("2024-01-01") == day1Before,
      "already-compact partition must not be rewritten")
    assert(partFiles("2024-01-02").size == 1)
    // the partitioned read still sees everything, partition column intact
    val back = spark.read.parquet(root)
    assert(back.count() == 900L)
    assert(back.filter(col("day") === "2024-01-02").count() == 800L)
    // idempotent: second run finds nothing to do
    assert(Maintenance.compactPartitioned(spark, root, 1L << 30).isEmpty)
  }
}
