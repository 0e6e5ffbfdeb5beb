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
  * Default query set: the 20 heaviest queries of the r12 round-close
  * bench (they carry the plan complexity) plus the two r13 storage-
  * layout queries whose VALUE is their plan shape (partition pruning,
  * exchange-free bucketed join).
  *
  * Usage: runMain graft.tools.PlanShapes <sfDir> <out.json> [q1,q2,...]
  */
object PlanShapes {

  /** 20 heaviest from bench/bench_r12_final_sf01_32c.json + the r13
    * additions (storage layouts + the 9 new operators), so every new
    * query gets a structural baseline from its birth round. */
  val DefaultQueries: Seq[String] = Seq(
    "ext_bootstrap_ci", "ext_pca_power", "ext_semdedup", "ext_resample_fill",
    "g5_corr_moments", "ext_quality_keeper", "ext_fuzzy_join",
    "g6_quantiles_exact", "ext_rrf_fusion", "ext_minhash_neardup",
    "ext_dedup_clusters", "ext_ppr", "g3_approx_distinct", "ext_mad",
    "ext_skipgram_cooccur", "ext_triangles", "ext_incremental_neardup",
    "ext_leakage_split", "ext_pagerank", "ext_kcore",
    "ext_partitioned_scan", "ext_bucketed_join",
    "ext_cuped", "ext_qq_drift", "ext_zipf_slope", "ext_conformal",
    "ext_conversion_lag", "ext_dedup_by_source", "ext_hist_quantiles",
    "ext_coverage_select", "ext_ce_drift", "ext_cluster_purity",
    "ext_ht_mean",
    "ext_bucket_pruned_lookup", "ext_zorder_scan", "ext_bloom_semijoin",
    "ext_cube_agg", "ext_pivot_counts", "ext_theilsen",
    "ext_ann_ivf_recall", "ext_ann_pq_recall", "ext_incremental_agg",
    // r14 batch 2 (this session's 8 — baselined from their birth round)
    "ext_bfs_hops", "ext_ewma", "ext_cusum", "ext_weekday_anomaly",
    "ext_benford", "ext_corr_matrix", "ext_welch_t", "ext_mann_whitney",
    // r14 batch 3+4 (eval/privacy)
    "ext_pr_auc", "ext_k_anonymity", "ext_dp_counts", "ext_quality_rules",
    "ext_lift_table", "ext_confusion_matrix", "ext_srm_check",
    "ext_centroid_drift",
    // r14 session-3 twelve (survival/causal, time-series, text-LM,
    // privacy/profile) — baselined from their birth round
    "ext_hll_distinct", "ext_kaplan_meier", "ext_diff_in_diff",
    "ext_psm_match", "ext_seasonal_decompose", "ext_markov_transitions",
    "ext_hits", "ext_boilerplate", "ext_kneser_ney", "ext_l_diversity",
    "ext_profile_drift", "ext_rfm_segments",
    "ext_activity_streaks", "ext_growth_accounting", "ext_stickiness",
    "ext_token_burstiness",
    "ext_mcnemar", "ext_log_odds_words", "ext_cohort_ltv",
    "ext_link_prediction",
    "ext_quantile_calibration", "ext_embedding_whiten",
    "ext_activity_concentration", "ext_activity_knee",
    "ext_saturation_curve", "ext_hill_tail", "ext_best_split",
    "ext_dedup_threshold_sweep",
    // r15: measure-then-pick skew join (under this AQE-off static gate
    // the profiler deterministically lands on the 'plain' branch — the
    // 'aqe' branch is pinned by the query's own oracle, which emits
    // the decision as a column) + the two new-operator baselines
    "ext_auto_skew_join", "ext_interarrival", "ext_theil_index",
    // r15 batch 2 (privacy/text/ts/eval/ANN/survival) — baselined from
    // their birth round
    "ext_t_closeness", "ext_script_mix", "ext_heaps_law", "ext_sprt",
    "ext_holt_forecast", "ext_matryoshka_recall", "ext_nelson_aalen",
    "ext_logrank", "ext_simpsons_slope", "ext_rake_keyphrases")

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
    val spark = SparkSession.builder()
      .master("local[4]")
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
            if (!RuntimeGated.contains(q)) Seq.empty
            else {
              plan.execute().count()
              plan.collect { case s: FileSourceScanExec =>
                (s.metrics.get("numOutputRows").map(_.value).getOrElse(-1L),
                  s.metrics.get("numFiles").map(_.value).getOrElse(-1L))
              }
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
