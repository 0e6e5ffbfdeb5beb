package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

/** Plan-shape SNAPSHOT for the regression gate (VERDICT r12 ask #2):
  * for each named contract query, record the STATIC physical plan's
  * structural counts — exchanges, sorts, join strategies, scans, and
  * per-scan pruning facts — as deterministic JSON, diffable across
  * commits by tools/plan_shapes_compare.py.
  *
  * Why static (AQE off): the gate catches the `ext_roc_auc` class of
  * regression — an uncached subtree silently re-evaluated per consumer
  * shows up statically as "Exchange/scan count jumped" — and a static
  * plan is byte-deterministic, while AQE's runtime re-plan depends on
  * observed sizes. Exchange counts here are therefore the UPPER BOUND
  * the optimizer committed to before AQE trims; that is exactly the
  * number the gate must watch.
  *
  * Default query set: EVERY `SparkEntry.queries` key (VERDICT r15 ask
  * #4 — the gate's zero-regression claim must cover the whole contract
  * surface, not a curated subset; static capture is one plan build per
  * query, seconds each, so there is no cost reason to sample). Queries
  * that cannot produce a batch physical plan would go in [[Excluded]]
  * with a reason — currently none.
  *
  * Usage: runMain graft.tools.PlanShapes <sfDir> <out.json> [q1,q2,...]
  */
object PlanShapes {

  /** Contract queries with no static batch plan to snapshot (none
    * today — every `SparkEntry.queries` entry is a batch DataFrame;
    * streaming operators are spec-verified, not contract queries). */
  val Excluded: Set[String] = Set.empty

  def DefaultQueries: Seq[String] =
    (graft.SparkEntry.queries.keySet -- Excluded).toSeq.sorted

  /** Queries whose VALUE is runtime file/row-group skipping that a
    * static plan cannot see (VERDICT r14 ask #3: `ext_zorder_scan`
    * showed files_scanned 16/16 statically while the probe receipt
    * measured 16→2 two-predicate overlap). For these the tool ALSO
    * executes the plan and records each scan's post-execution metrics
    * — `rt_rows_read` (rows surviving parquet row-group min/max
    * skipping: THE z-order dividend) and `rt_files_read` — so a
    * layout regression fails the gate instead of hiding in a probe
    * log. Kept to the layout queries: executing the whole gated set
    * would turn a seconds-fast static tool into a second bench run. */
  val RuntimeGated: Set[String] =
    Set("ext_zorder_scan", "ext_partitioned_scan",
      "ext_bucket_pruned_lookup")

  /** GRAFT_PLANSHAPES_RT=all executes EVERY captured query so the
    * rt_rows_read/rt_files_read fields are populated for the whole
    * surface (VERDICT r16 ask #6) — one full-surface capture per round
    * close; the default stays the seconds-fast static tool with the
    * three layout queries executed. */
  private def rtAll: Boolean =
    sys.env.get("GRAFT_PLANSHAPES_RT").contains("all")

  final case class ScanFacts(
      partitionFilters: Seq[String], pushedFilters: String,
      partitionsSelected: Option[Int], filesScanned: Option[Long],
      filesTotal: Option[Long],
      bucketsSelected: Option[Int], bucketsTotal: Option[Int])

  /** Structural counts of one physical plan. Node identity is the
    * exec class simple name — stable across Spark minor versions. */
  def shape(plan: SparkPlan): Map[String, Int] = {
    val names = plan.collect { case n => n.getClass.getSimpleName }
    names.groupBy(identity).map { case (k, v) => k -> v.size }
  }

  def scanFacts(plan: SparkPlan): Seq[ScanFacts] =
    plan.collect { case s: FileSourceScanExec =>
      val pf = s.partitionFilters.map(_.sql)
      val pushed = s.metadata.getOrElse("PushedFilters", "[]")
      // Bucket pruning (VERDICT r13 ask #2): optionalBucketSet is the
      // BitSet of bucket ids a point/IN predicate on the bucket column
      // selects; selectedPartitions does NOT reflect it (the file list
      // is filtered later, in createBucketedReadRDD), so files_scanned
      // must be recomputed through BucketingUtils.getBucketId.
      val bTotal = s.relation.bucketSpec.map(_.numBuckets)
      val bSel = s.optionalBucketSet.map(_.cardinality())
      val (sel, scanned, total) =
        try {
          val selected = s.selectedPartitions // post-pruning listing
          val all = s.relation.location.inputFiles.length.toLong
          val effective = s.optionalBucketSet match {
            case Some(bits) =>
              selected.toPartitionArray.map(_.urlEncodedPath).distinct
                .count { p =>
                  val name = p.substring(p.lastIndexOf('/') + 1)
                  org.apache.spark.sql.execution.datasources.BucketingUtils
                    .getBucketId(name)
                    .exists(b => bits.get(b.asInstanceOf[Int]))
                }.toLong
            case None => selected.totalNumberOfFiles
          }
          (Option(selected.partitionCount), Option(effective), Option(all))
        } catch {
          case _: Throwable =>
            (Option.empty[Int], Option.empty[Long], Option.empty[Long])
        }
      ScanFacts(pf, pushed, sel, scanned, total, bSel, bTotal)
    }

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n") + "\""

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanShapes <sfDir> <out.json> [q1,q2,...]")
    val dir = args(0)
    val out = args(1)
    val names =
      if (args.length > 2) args(2).split(",").map(_.trim).toSeq
      else DefaultQueries
    // master core count never affects plan shape (shuffle.partitions is
    // pinned); GRAFT_PLANSHAPES_CPUS only speeds up the rt=all full-
    // surface EXECUTION capture
    val cpus = sys.env.getOrElse("GRAFT_PLANSHAPES_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false") // static gate — see scaladoc
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the structural families the gate watches, summed over exec classes
    val families = Seq(
      "exchanges" -> Seq("ShuffleExchangeExec"),
      "broadcasts" -> Seq("BroadcastExchangeExec"),
      "sorts" -> Seq("SortExec"),
      "smj" -> Seq("SortMergeJoinExec"),
      "bhj" -> Seq("BroadcastHashJoinExec"),
      "shj" -> Seq("ShuffledHashJoinExec"),
      "bnlj" -> Seq("BroadcastNestedLoopJoinExec"),
      "cartesian" -> Seq("CartesianProductExec"),
      "scans" -> Seq("FileSourceScanExec"),
      "aggregates" -> Seq("HashAggregateExec", "ObjectHashAggregateExec",
        "SortAggregateExec"),
      "windows" -> Seq("WindowExec", "WindowGroupLimitExec"),
      "generates" -> Seq("GenerateExec"))

    val entries = names.sorted.flatMap { q =>
      graft.SparkEntry.queries.get(q) match {
        case None =>
          System.err.println(s"[plan-shapes] unknown query: $q"); None
        case Some(f) =>
          val plan = f(spark, dir).queryExecution.executedPlan
          val counts = shape(plan)
          val fam = families.map { case (label, classes) =>
            label -> classes.map(c => counts.getOrElse(c, 0)).sum
          }
          // runtime skipping profile (layout queries only): execute the
          // SAME plan instance so its scan nodes' SQL metrics populate,
          // then read rows/files actually produced per scan. AQE is off,
          // so executedPlan is final — no re-plan between the static
          // snapshot and this execution.
          val rtScans: Seq[(Long, Long)] =
            if (!rtAll && !RuntimeGated.contains(q)) Seq.empty
            else {
              plan.execute().count()
              val rts = plan.collect { case s: FileSourceScanExec =>
                (s.metrics.get("numOutputRows").map(_.value).getOrElse(-1L),
                  s.metrics.get("numFiles").map(_.value).getOrElse(-1L))
              }
              // full-surface executions leave per-query artifacts
              // (persisted proxies, checkpoint blocks) — the Bench
              // hygiene sweep, so 278 executions don't tax each other
              spark.sharedState.cacheManager.clearCache()
              spark.sparkContext.getPersistentRDDs.values
                .foreach(_.unpersist(blocking = false))
              rts
            }
          val scans = scanFacts(plan).zipWithIndex.map { case (sf, i) =>
            val rt = rtScans.lift(i)
            val fields = Seq(
              "partition_filters" ->
                sf.partitionFilters.map(jstr).mkString("[", ",", "]"),
              "pushed_filters" -> jstr(sf.pushedFilters),
              "partitions_selected" ->
                sf.partitionsSelected.map(_.toString).getOrElse("null"),
              "files_scanned" ->
                sf.filesScanned.map(_.toString).getOrElse("null"),
              "files_total" ->
                sf.filesTotal.map(_.toString).getOrElse("null"),
              "buckets_selected" ->
                sf.bucketsSelected.map(_.toString).getOrElse("null"),
              "buckets_total" ->
                sf.bucketsTotal.map(_.toString).getOrElse("null"),
              "rt_rows_read" ->
                rt.map(_._1.toString).getOrElse("null"),
              "rt_files_read" ->
                rt.map(_._2.toString).getOrElse("null"))
            fields.map { case (k, v) => s"${jstr(k)}: $v" }
              .mkString("{", ", ", "}")
          }
          val body =
            (fam.map { case (k, v) => s"${jstr(k)}: $v" } :+
              (s"${jstr("scan_details")}: " +
                scans.mkString("[", ", ", "]"))).mkString(", ")
          Some(s"  ${jstr(q)}: {$body}")
      }
    }
    val json = entries.mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    println(s"[plan-shapes] wrote ${entries.size} query shapes to $out")
    spark.stop()
  }
}
