package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Partitioning
import graft.sources.Maintenance

/** Dev receipt (VERDICT r13 ask #3): two-predicate file skipping under
  * Z-ORDER vs SINGLE-KEY range clustering, measured from the actual
  * per-file min/max boxes (what parquet row-group stats expose to the
  * reader — a file whose box misses the predicate box is never read).
  *
  * Three layouts of the same events slice, same file count:
  *   A. range-clustered on user_id   (the Maintenance.sortBy status quo)
  *   B. z-ordered on (user_id,value) (compactParquet zorderBy path)
  *   C. unclustered coalesce         (the no-layout floor)
  * For each: how many files' boxes overlap (1) a user_id slice, (2) a
  * value slice, (3) the two-predicate box ext_zorder_scan runs.
  *
  * Usage: runMain graft.tools.ZorderReceiptProbe <sfDir>
  */
object ZorderReceiptProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = graft.Tables(spark, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
    val root = java.nio.file.Files.createTempDirectory("graft-zrec").toString
    val nFiles = 16

    val aDir = s"$root/range_userid"
    Partitioning.writeRangeClustered(events, aDir, "user_id", nFiles)
    val bDir = s"$root/zorder"
    Partitioning.writeZOrdered(events, bDir, "user_id", "value", nFiles)
    val cDir = s"$root/coalesce"
    events.repartition(nFiles).write.mode("overwrite").parquet(cDir)

    // the compaction path must produce the same clustering as the
    // direct writer: compact C in place with zorderBy and re-measure
    val dDir = s"$root/compact_zorder"
    events.repartition(nFiles).write.mode("overwrite").parquet(dDir)
    // size targetFileBytes for ~nFiles output files
    val dBytes = {
      val p = new org.apache.hadoop.fs.Path(dDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.isFile)
        .filterNot(_.getPath.getName.startsWith("_")).map(_.getLen).sum
    }
    val rep = Maintenance.compactParquet(spark, dDir,
      targetFileBytes = math.max(1L, dBytes / nFiles),
      zorderBy = Some(("user_id", "value")))
    println(s"compactParquet zorderBy: files ${rep.filesBefore} -> ${rep.filesAfter}, rows ${rep.rows}")

    def boxes(path: String): DataFrame =
      Maintenance.fileStats(spark, path, Seq("user_id", "value"))
        .select(col("file").as("f"),
          col("user_id_min").as("ulo"), col("user_id_max").as("uhi"),
          col("value_min").as("vlo"), col("value_max").as("vhi"))

    def overlap(bx: DataFrame,
        u: Option[(Long, Long)], v: Option[(Double, Double)]): Long = {
      val pu = u.map { case (lo, hi) =>
        col("ulo") <= hi && col("uhi") >= lo }.getOrElse(lit(true))
      val pv = v.map { case (lo, hi) =>
        col("vlo") <= hi && col("vhi") >= lo }.getOrElse(lit(true))
      bx.filter(pu && pv).count()
    }

    // boxes sized to the corpus: the middle ~25% of each key's range,
    // so the receipt reads the same at every scale factor (a fixed box
    // that is 27% of the keyspace at sf0.01 is 2.7% at sf0.1 and the
    // single-key layout wins by selectivity alone, hiding the story)
    val Array(kr) = events.agg(
      min("user_id"), max("user_id"), min("value"), max("value")).collect()
    val (ul, uh) = (kr.getLong(0), kr.getLong(1))
    val (vl, vh) = (kr.getDouble(2), kr.getDouble(3))
    val uBox = (ul + (uh - ul) * 3 / 8, ul + (uh - ul) * 5 / 8)
    val vBox = (vl + (vh - vl) * 0.375, vl + (vh - vl) * 0.625)
    println(s"boxes: user_id $uBox value $vBox")
    for ((label, path) <- Seq(
        ("range(user_id)", aDir), ("zorder(user_id,value)", bDir),
        ("coalesce", cDir), ("compact+zorder", dDir))) {
      val bx = boxes(path).cache()
      val total = bx.count()
      val onU = overlap(bx, Some(uBox), None)
      val onV = overlap(bx, None, Some(vBox))
      val onBoth = overlap(bx, Some(uBox), Some(vBox))
      println(f"$label%-22s files=$total%2d  user_id-slice=$onU%2d  value-slice=$onV%2d  two-predicate=$onBoth%2d")
      bx.unpersist()
    }
    spark.stop()
  }
}
