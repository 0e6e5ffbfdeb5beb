package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** [EXT] Mergeable frequency/cardinality sketches the repo's surface was
  * missing: Count–Min (point-frequency estimation over an unbounded
  * token stream in `depth × width` integers) and KMV / theta-style
  * k-minimum-values (mergeable distinct counting whose estimate —
  * unlike HLL's — is an exact deterministic function of the k smallest
  * hashes, so a second engine can replay it bit-for-bit).
  *
  * Reference context: the reference backend's analytics are exact
  * GROUP-BY counts over one Hive table (`backend/app.py:33-481`); at
  * 100 TB the first thing a pipeline adds is sketched counterparts.
  * The repo already carries HLL (`g3_approx_distinct`), Misra–Gries
  * heavy hitters and approx quantiles; CMS and KMV complete the
  * standard sketch family.
  *
  * 100 TB design rules:
  *  - the CMS aggregation state is `depth × width` cells TOTAL — the
  *    groupBy key space is bounded by construction, so map-side partial
  *    aggregation collapses every partition to ≤ depth·width rows no
  *    matter how many tokens flow through it, and the one shuffle moves
  *    sketch cells, never tokens;
  *  - KMV state is ≤ k sorted longs per group per partition (a custom
  *    `Aggregator` — bounded buffer, mergeable, map-side combined), on
  *    top of a (group, hash) pre-distinct whose shuffle key is the
  *    high-cardinality hash, not the low-cardinality group — the same
  *    "never window-partition by a tiny key" rule the exact-quantile
  *    rewrite follows;
  *  - both sketches hash with md5 prefixes (portable: DuckDB replays
  *    the exact cells/minima — see the `ext_cms_freq` /
  *    `ext_kmv_distinct` oracles), not JVM-private hashing.
  */
object Sketches {

  /** First `hexChars` hex digits of md5(value) as an unsigned long.
    * 8 hex chars → 32-bit range, 15 → 60-bit (still < 2^63, no sign
    * issues). Engine-portable: DuckDB's
    * `CAST(concat('0x', substr(md5(v), 1, n)) AS BIGINT)` yields the
    * identical integer for the identical UTF-8 input. */
  def portableHash(value: Column, hexChars: Int): Column = {
    require(hexChars > 0 && hexChars <= 15,
      s"hexChars must be in [1, 15] to fit a signed long, got $hexChars")
    conv(substring(md5(value), 1, hexChars), 16, 10).cast("long")
  }

  /** All `depth` cells for a value, as an array indexed by sketch row:
    * ONE md5 per value, sliced into disjoint 8-hex (32-bit) windows —
    * md5's output bits are pairwise independent across windows, and one
    * digest per occurrence beats `depth` salted digests 3× on the hot
    * path. Caps depth at 4 (32 hex / 8). */
  private def cmsCells(value: Column, depth: Int, width: Int): Column = {
    val h = md5(value)
    array((0 until depth).map { i =>
      pmod(conv(substring(h, i * 8 + 1, 8), 16, 10).cast("long"),
        lit(width.toLong))
    }: _*)
  }

  /** Build a Count–Min sketch over one occurrence-per-row `item`s.
    * Returns `(cms_row, cms_cell, n)` — at most `depth × width` rows.
    *
    * Plan shape: one md5 per occurrence, then a map-side `posexplode`
    * fans it into its `depth` (row, cell) updates BEFORE the one
    * hash-aggregate whose key space is bounded at depth·width — the
    * same fan-out-then-partial-agg shape as `Events.slidingAgg`. No
    * token ever crosses the wire: partial aggregation reduces every
    * map task's output to ≤ depth·width cell counts. */
  def cmSketch(occurrences: DataFrame, item: Column, depth: Int, width: Int): DataFrame =
    cmSketchWeighted(occurrences, item, lit(1L), depth, width)

  /** [[cmSketch]] generalized to weighted occurrences: cell counts are
    * Σ weight. Because cell sums are plain additions, a PRE-AGGREGATED
    * (item, count) table yields the bit-identical sketch — so a query
    * that already counts items exactly (e.g. the `ext_cms_freq`
    * certificate) can fold its counts into cells without a second
    * corpus scan. */
  def cmSketchWeighted(
      occurrences: DataFrame,
      item: Column,
      weight: Column,
      depth: Int,
      width: Int): DataFrame = {
    require(depth > 0 && depth <= 4,
      s"depth must be in [1, 4] (8 hex chars of one md5 per row), got $depth")
    require(width > 0, s"width must be positive, got $width")
    occurrences
      .select(item.as("item"), weight.as("w"))
      // a NULL item hashes to NULL cells — without this filter it lands
      // in a quarantined null-cell bucket per row (junk state, even if
      // bounded); a 100 TB crawl always contains garbage rows
      .where(col("item").isNotNull)
      .select(posexplode(cmsCells(col("item"), depth, width))
        .as(Seq("cms_row", "cms_cell")), col("w"))
      .groupBy("cms_row", "cms_cell")
      .agg(sum(col("w")).as("n"))
  }

  /** Point-frequency estimates for `queries` (one item per row) against
    * a built sketch: f̂(item) = min over rows of the item's cell count —
    * an overestimate by construction (f̂ ≥ f always; E[f̂ − f] ≤ N/width
    * per row, and the min over `depth` independent rows sharpens the
    * tail). The sketch is ≤ depth·width rows, so the lookup join
    * broadcasts it; the query side never shuffles. */
  def cmsEstimate(
      sketch: DataFrame,
      queries: DataFrame,
      item: Column,
      depth: Int,
      width: Int): DataFrame = {
    require(depth > 0 && depth <= 4,
      s"depth must be in [1, 4] (8 hex chars of one md5 per row), got $depth")
    val cells = queries
      .select(item.as("item"))
      .select(col("item"),
        posexplode(cmsCells(col("item"), depth, width))
          .as(Seq("cms_row", "cms_cell")))
    cells
      .join(broadcast(sketch), Seq("cms_row", "cms_cell"), "left")
      .groupBy("item")
      // a missing cell means nothing ever hashed there → count 0
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_n"))
  }

  /** Bounded min-k accumulator: keeps the `k` smallest DISTINCT longs
    * seen, as a sorted array. This is the textbook mergeable-sketch
    * shape — `reduce` is O(1) for the common case (value ≥ current
    * max once saturated: an expected k·ln n of n inputs insert), and
    * `merge` is a linear merge of two ≤ k sorted arrays — so Spark's
    * partial aggregation keeps per-partition state at k longs and the
    * final shuffle moves ≤ k · numPartitions values per group. */
  final case class MinK(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k > 0, s"k must be positive, got $k")

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(b: Array[Long], a: Long): Array[Long] = {
      if (b.length >= k && a >= b(b.length - 1)) b
      else {
        val idx = java.util.Arrays.binarySearch(b, a)
        if (idx >= 0) b // already present — KMV is over distinct hashes
        else {
          val ins = -idx - 1
          if (ins >= k) b
          else {
            val n = math.min(b.length + 1, k)
            val out = new Array[Long](n)
            System.arraycopy(b, 0, out, 0, ins)
            out(ins) = a
            if (n - ins - 1 > 0) System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
            out
          }
        }
      }
    }

    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      if (x.isEmpty) y
      else if (y.isEmpty) x
      else {
        val out = new Array[Long](math.min(x.length + y.length, k))
        var i = 0; var j = 0; var o = 0
        while (o < out.length && (i < x.length || j < y.length)) {
          val take =
            if (i >= x.length) { val v = y(j); j += 1; v }
            else if (j >= y.length) { val v = x(i); i += 1; v }
            else if (x(i) < y(j)) { val v = x(i); i += 1; v }
            else if (x(i) > y(j)) { val v = y(j); j += 1; v }
            else { val v = x(i); i += 1; j += 1; v } // dedupe ties
          out(o) = take; o += 1
        }
        if (o == out.length) out else java.util.Arrays.copyOf(out, o)
      }
    }

    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** KMV distinct-count estimate per group over `value`:
    * hash each value to 60 bits (md5 prefix — portable), keep the k
    * smallest distinct hashes per group, estimate
    * n̂ = (k−1) · 2^60 / h_(k) when the group saturates k, else the
    * exact distinct count (the sketch IS exact below k). The estimate
    * is a deterministic function of the kept hashes — every arithmetic
    * step (long→double cast, one multiply, one divide) is an exactly-
    * rounded IEEE operation, so DuckDB replays it bit-for-bit (gotcha
    * list: cross-engine float parity; same discipline as
    * `TextPipeline.bigramLift`'s lift-not-log choice).
    *
    * Output: (group_key, n_exact, kmv_n) — n_exact is the certificate
    * column (distinct-hash count from the same pre-distinct pass; at
    * 60-bit hashes it equals the true distinct count with overwhelming
    * probability, and DETERMINISTICALLY equals what the oracle
    * computes either way).
    *
    * Plan shape: one shuffle keyed on (group, hash) for the
    * pre-distinct — high cardinality, parallelism preserved — then the
    * bounded MinK aggregation whose partial state is ≤ k longs; the
    * final per-group shuffle moves ≤ k · partitions longs even when
    * the group key has 3 values (the g6 lesson). */
  /** Deterministic k-per-cell sample with BOUNDED aggregation state:
    * keep the k rows whose md5(id) hashes are smallest within each
    * `dims` cell — a uniform-without-replacement sample that is
    * seed-free, engine-portable, and stable under partitioning.
    *
    * This is the scale path for per-cell sampling: the existing
    * `TextPipeline.sampleToQuota` ranks with a window PARTITIONED BY
    * THE CELL DIMS, which caps parallelism at the (tiny) cell count —
    * the same trap the g6 exact-quantile rewrite removed. Here the
    * per-cell top-k folds through [[MinK]] (≤ k longs of state per cell
    * per partition, map-side combined), then ONE broadcast-able
    * (cell, hash) table joins winners back by hash — the big table
    * shuffles on the high-cardinality hash key, never windows over the
    * cell key.
    *
    * Caveat (documented, not defended): two DISTINCT ids in one cell
    * sharing a full 60-bit hash would both join back (k+1 rows).
    * P ≈ n²/2^61 per cell — at a billion rows per cell that is ~1e-3;
    * acceptable for sampling (and deterministic: both engines see the
    * same tie).
    *
    * Null contract (r9 ADVICE): a NULL id carries no identity to hash,
    * so null-id rows are EXCLUDED from the sample (previously a null
    * hash decoded as 0L inside the primitive-long MinK buffer and
    * burned a winner slot that matched nothing). Duplicate (cell, id)
    * rows are collapsed first — the sample is over distinct ids, so a
    * duplicated id can never occupy two of the k slots. NULL dims are
    * their own cell (null-safe join), exactly like the window-replay
    * oracle's PARTITION BY.
    *
    * Output: dims* :+ sample_id. */
  def minKSample(df: DataFrame, dims: Seq[String], id: Column, k: Int): DataFrame = {
    require(dims.nonEmpty, "minKSample needs at least one cell dimension")
    require(k > 0, s"k must be positive, got $k")
    val minK = udaf(MinK(k), Encoders.scalaLong)
    val dimCols = dims.map(col)
    val withH = df.select(dimCols :+ id.as("sample_id"): _*)
      .dropDuplicates(dims :+ "sample_id")
      .withColumn("h", portableHash(col("sample_id").cast("string"), 15))
      .where(col("h").isNotNull)
    val winners = withH
      .groupBy(dimCols: _*)
      .agg(minK(col("h")).as("hs"))
      .select(dimCols :+ explode(col("hs")).as("h"): _*)
    val wl = withH.alias("mks_l")
    val wn = winners.alias("mks_w")
    val joinCond = dims.map(d => col(s"mks_l.`$d`") <=> col(s"mks_w.`$d`"))
      .reduce(_ && _) && col("mks_l.h") === col("mks_w.h")
    wl.join(broadcast(wn), joinCond)
      .select(dims.map(d => col(s"mks_l.`$d`")) :+ col("mks_l.sample_id"): _*)
  }

  /** NULL value → Long.MaxValue sentinel, NOT a dropped row: the DuckDB
    * oracle's `DISTINCT (group, md5-hash)` keeps one NULL-hash row per
    * group and its `ORDER BY h` puts it LAST (NULLS LAST); the sentinel
    * (> any 60-bit hash — unambiguous) reproduces exactly that. Without
    * it the primitive-long MinK buffer decoded a null hash as 0L — the
    * SMALLEST possible hash — which at saturation displaced a real
    * minimum and inflated kmv_n (r9 ADVICE; NullHandlingSpec pins the
    * saturated case now). */
  private val nullHashSentinel = Long.MaxValue

  private def hashOrSentinel(value: Column): Column =
    coalesce(portableHash(value.cast("string"), 15), lit(nullHashSentinel))

  def kmvDistinct(df: DataFrame, group: Column, value: Column, k: Int): DataFrame = {
    require(k > 1, s"KMV needs k > 1 (estimate uses k-1), got $k")
    val minK = udaf(MinK(k), Encoders.scalaLong)
    val distinctHashes = df
      .select(group.as("group_key"), hashOrSentinel(value).as("h"))
      .groupBy("group_key", "h")
      .agg(count(lit(1)).as("dummy"))
      .drop("dummy")
    distinctHashes
      .groupBy("group_key")
      .agg(count(lit(1)).as("n_exact"), minK(col("h")).as("hs"))
      .select(col("group_key"), col("n_exact"),
        kmvEstimate(col("hs"), k).as("kmv_n"))
  }

  /** The KMV estimate from a kept-hashes array: exact (= array length)
    * below saturation, (k−1)·2^60/h_(k) at k. Shared by the batch and
    * streaming forms so the arithmetic can never fork. If the k-th
    * minimum is the NULL sentinel (exactly k−1 real hashes + a null
    * value), the estimate is NULL — the oracle's
    * `CASE WHEN rn = k THEN h END` sees the NULL hash there too. */
  private def kmvEstimate(hs: Column, k: Int): Column =
    round(
      when(size(hs) < k, size(hs).cast("double"))
        .when(element_at(hs, k) === lit(nullHashSentinel),
          lit(null).cast("double"))
        .otherwise(
          lit((k - 1).toDouble) * lit(1152921504606846976.0) /
            element_at(hs, k).cast("double")),
      4)

  /** Streaming-safe KMV: ONE aggregation (no pre-distinct — [[MinK]]
    * dedupes hashes internally, so the kept minima are identical), which
    * is what Structured Streaming's single-aggregation rule requires.
    * Emits (group_key, kmv_n) only: the exact-count certificate column
    * needs the pre-distinct pass and belongs to the batch form. State
    * per group is ≤ k longs regardless of stream length — like the CMS
    * grid, bounded by construction, no watermark needed. Batch parity:
    * kmv_n here equals [[kmvDistinct]]'s on the same input
    * (EventStreamsSpec pins it across micro-batches). */
  def kmvSketch(df: DataFrame, group: Column, value: Column, k: Int): DataFrame = {
    require(k > 1, s"KMV needs k > 1 (estimate uses k-1), got $k")
    val minK = udaf(MinK(k), Encoders.scalaLong)
    df.select(group.as("group_key"), hashOrSentinel(value).as("h"))
      .groupBy("group_key")
      .agg(minK(col("h")).as("hs"))
      .select(col("group_key"), kmvEstimate(col("hs"), k).as("kmv_n"))
  }

  /** Sketch-based JOIN-SIZE ESTIMATION — the planning statistic a
    * 100 TB engine wants BEFORE committing to a join strategy (will
    * `orders ⋈ customer` broadcast? explode? need salting?), computed
    * without running the join: KMV sketches of both key columns give
    * the union cardinality via the k-th-minimum estimator, the Jaccard
    * via the ρ = |X ∩ A ∩ B|/k coincidence rate over the k smallest
    * union hashes (Beyer et al., "On Synopses for Distinct-Value
    * Estimation Under Multiset Operations", SIGMOD'07 — the theta-
    * sketch intersection), and the equi-join row estimate from the
    * containment × average-multiplicity model:
    *
    *   D_∩ ≈ ρ·D_∪,   |A ⋈ B| ≈ D_∩ · (n_a/D_a) · (n_b/D_b)
    *
    * Exactness note: below saturation (|union hashes| < k) BOTH
    * sketches are their complete distinct-hash sets, so D_∪, D_∩ and
    * the Jaccard are EXACT (modulo 60-bit hash collisions), same rule
    * as [[kmvDistinct]].
    *
    * 100 TB shape: one scan per side — distinct-hash pre-aggregate,
    * then a k-long MinK buffer per side; the estimate itself is array
    * arithmetic over two broadcast 1-row frames. Null keys are DROPPED
    * (a null never equi-joins; both engines agree).
    *
    * Determinism: hashes are [[portableHash]] 60-bit md5 prefixes;
    * every estimate is an IEEE chain over integers, rounded 4dp (the
    * [[kmvDistinct]] discipline).
    *
    * Output: ALWAYS one row — (n_a, n_b, d_a, d_b, d_union, jaccard,
    * d_intersect, join_rows_est); an empty side yields zero estimates,
    * not an empty frame. */
  def joinSizeEstimate(
      dfA: DataFrame, keyA: Column,
      dfB: DataFrame, keyB: Column,
      k: Int = 128): DataFrame = {
    require(k > 1, s"KMV needs k > 1 (estimate uses k-1), got $k")
    val minK = udaf(MinK(k), Encoders.scalaLong)
    def side(df: DataFrame, key: Column, tag: String): DataFrame = df
      .filter(key.isNotNull)
      .select(portableHash(key.cast("string"), 15).as("h"))
      .groupBy("h").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c")), lit(0L)).as(s"n_$tag"),
        minK(col("h")).as(s"hs_$tag"),
        count(lit(1)).as(s"dx_$tag"))
    def est(hs: Column, exact: Column): Column =
      round(
        when(size(hs) < k, exact.cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976.0) /
            element_at(hs, k).cast("double")), 4)
    val both = side(dfA, keyA, "a").crossJoin(broadcast(side(dfB, keyB, "b")))
    val packed = graft.functions.TextFunctions.bound(
      array_sort(array_union(col("hs_a"), col("hs_b")))) { un =>
      val dU = est(un, size(un))
      // ρ's denominator: how many union hashes X actually holds; both
      // sides empty → 0/0, defined to ρ = 0 (ANSI divides throw)
      val xK = when(size(un) < k, size(un)).otherwise(lit(k))
      val rho = when(xK > 0,
        size(array_intersect(
          array_intersect(slice(un, 1, k), col("hs_a")), col("hs_b")))
          .cast("double") / xK.cast("double"))
        .otherwise(lit(0.0))
      val dA = est(col("hs_a"), col("dx_a"))
      val dB = est(col("hs_b"), col("dx_b"))
      val dI = round(rho * dU, 4)
      struct(
        col("n_a"), col("n_b"), dA.as("d_a"), dB.as("d_b"),
        dU.as("d_union"),
        round(rho, 6).as("jaccard"),
        dI.as("d_intersect"),
        when(col("n_a") > 0 && col("n_b") > 0,
          round(dI * (col("n_a").cast("double") / dA) *
            (col("n_b").cast("double") / dB), 4))
          .otherwise(lit(0.0)).as("join_rows_est"))
    }
    both.select(packed.as("p")).select(col("p.*"))
  }

  /** Mergeable QUANTILE rollup from fixed-grid histogram sketches —
    * the [[kmvMergeRollup]] story for quantiles: per-group quantile
    * estimates AND a global `__all__` estimate derived FROM THE GROUP
    * GRIDS ALONE (bin-count vectors add), so coarser slices never
    * re-scan the corpus. The third quantile tier next to exact
    * selection ([[Relational.exactQuantiles]] — exact, two passes) and
    * `approx_percentile` (g9 — sketch, not engine-portable): FIXED
    * memory (`bins` longs per group), one pass, mergeable, and
    * deterministic to the bin edge on every engine.
    *
    * Estimate: the value's bin is floor((v−lo)/(hi−lo)·bins) clamped
    * to [0, bins); the p-quantile reports the UPPER EDGE of the first
    * bin whose cumulative count reaches ⌈p·n⌉ — error ≤ one bin width
    * by construction (callers pick bins for their tolerance; ±∞/out-of-
    * range values clamp into the edge bins and are COUNTED, never
    * dropped). Edges are lo + i·(hi−lo)/bins with the IEEE chain fixed
    * by this signature — identical in the DuckDB replay.
    *
    * 100 TB shape: one scan → (group, bin) counts with map-side
    * collapse (≤ G·bins rows total); per-group quantiles are a window
    * over each group's ≤ bins rows; the global grid is a second ≤
    * G·bins-row aggregate of the COUNTS, not the data.
    *
    * Output: one row per group plus `__all__` — (group_key, n, p50,
    * p90, p99), bin-edge doubles rounded 6. */
  def histQuantileRollup(
      df: DataFrame, group: Column, value: Column,
      lo: Double, hi: Double, bins: Int = 256,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(bins > 1, s"need > 1 bins, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    require(ps.nonEmpty && ps.forall(p => p > 0 && p < 1))
    val width = (hi - lo) / bins
    val bin = least(greatest(
      floor((value.cast("double") - lit(lo)) / lit(width)).cast("int"),
      lit(0)), lit(bins - 1))
    val grid = df
      .filter(value.isNotNull)
      .select(group.cast("string").as("group_key"), bin.as("bin"))
      .groupBy("group_key", "bin")
      .agg(count(lit(1)).as("c"))
    val all = grid.groupBy("bin") // merge = add the grids, never re-scan
      .agg(sum("c").as("c"))
      .select(lit("__all__").as("group_key"), col("bin"), col("c"))
    val w = Window.partitionBy("group_key").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = Window.partitionBy("group_key")
      .orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = grid.unionByName(all)
      .withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(full))
    val picks = ps.map { p =>
      val pct = math.round(p * 100)
      // first bin whose cumulative reaches ceil(p·n): its upper edge
      round(min(when(col("cum") >= ceil(lit(p) * col("n")),
        lit(lo) + (col("bin") + 1).cast("double") * lit(width))), 6)
        .as(s"p$pct")
    }
    val aggs = max("n").cast("long").as("n") +: picks
    cum.groupBy("group_key")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("group_key")
  }

  /** KMV MERGEABILITY rollup: per-group distinct estimates plus a
    * global `__all__` estimate computed FROM THE PER-GROUP SKETCHES
    * ALONE — union the groups' kept minima, keep the k smallest, apply
    * the same estimator. Merging k-min sets is exact (the k smallest
    * of a union are among the unions of k-smallests), so the rolled-up
    * row equals what a direct global KMV over the raw data would
    * produce (SketchesSpec pins the identity) — the property that lets
    * a 100 TB pipeline keep per-partition/per-day sketches and answer
    * ANY coarser distinct-count by merging k·|groups| longs instead of
    * re-scanning the data. Below global saturation the merged estimate
    * is the EXACT distinct count, same as the per-group rule.
    *
    * Output: per-group rows (group_key, kmv_n) plus one ('__all__',
    * merged kmv_n) row. */
  def kmvMergeRollup(
      df: DataFrame, group: Column, value: Column, k: Int): DataFrame = {
    require(k > 1, s"KMV needs k > 1 (estimate uses k-1), got $k")
    val minK = udaf(MinK(k), Encoders.scalaLong)
    val perGroup = df
      .select(group.as("group_key"), hashOrSentinel(value).as("h"))
      .groupBy("group_key", "h")
      .agg(count(lit(1)).as("dummy"))
      .drop("dummy")
      .groupBy("group_key")
      .agg(minK(col("h")).as("hs"))
    val groups = perGroup
      .select(col("group_key"), kmvEstimate(col("hs"), k).as("kmv_n"))
    val merged = perGroup
      .select(explode(col("hs")).as("h"))
      .distinct()
      .agg(minK(col("h")).as("hs"))
      .select(lit("__all__").as("group_key"),
        kmvEstimate(col("hs"), k).as("kmv_n"))
    groups.unionByName(merged)
  }

  /** PORTABLE HyperLogLog (Flajolet et al. '07) with register-level
    * replay — the third leg of the distinct-count family: Spark's
    * built-in `approx_count_distinct` (g3) is HLL++ but its sketch is
    * JVM-private (no second engine can audit a register), and KMV
    * ([[kmvDistinct]]) is exactly replayable but keeps k longs per
    * group. This one is BOTH fixed-size and replayable: the state is
    * m = 2^p max-rank registers derived from md5 prefixes, so DuckDB
    * rebuilds every register bit-for-bit (`ext_hll_distinct` oracle)
    * and the estimate is a pure deterministic function of them.
    *
    * Register math (all exact integers until the final divide):
    * bucket = first p/4 hex chars of md5(value); the next 13 hex chars
    * are the 52-bit tail whose leading-zero count sets the rank —
    * rho = 4·(leading '0' hex chars) + zeros-within-first-nonzero-digit
    * + 1, capped at 53 for an all-zero tail. Σ 2^−M_j is carried as
    * the exact BIGINT Σ 2^(53−M_j) (≤ m·2^53 < 2^63, no float sum):
    * raw = (α_m·m²·2^53) / Σint with α_m = 0.7213/(1 + 1.079/m)
    * (m ≥ 128 regime), linear-counting fallback m·ln(m/V) below
    * 2.5·m when V (empty registers) > 0 — ln's last-ulp libm skew is
    * absorbed by the 4dp output round (the [[TfIdf.unigramLogProb]]
    * argument).
    *
    * MERGEABILITY is the point (the [[kmvMergeRollup]] story): the
    * `__all__` row is computed from the per-group REGISTERS alone —
    * max per bucket across groups — and max-of-maxes makes that
    * identical to a direct global HLL (SketchesSpec pins the
    * identity). A 100 TB pipeline keeps m longs per (day, source) and
    * answers any coarser distinct count by folding registers, never
    * re-scanning.
    *
    * 100 TB shape: one scan → (group, bucket) max-rank partials
    * (map-side collapse to ≤ G·m rows); estimates aggregate m rows per
    * group; the rollup folds G·m register rows. Null values are
    * DROPPED (the [[joinSizeEstimate]] rule — both engines agree).
    *
    * Output: one row per group plus `__all__` — (group_key, n_regs
    * populated, v_zero empty registers, hll_n estimate 4dp). */
  def hllRegisterRollup(
      df: DataFrame, group: Column, value: Column, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 12 && p % 4 == 0,
      s"p must be 4, 8 or 12 (whole md5 hex chars), got $p")
    val m = 1 << p
    val h = md5(value.cast("string"))
    val bucket = conv(substring(h, 1, p / 4), 16, 10).cast("long")
    val tail = substring(h, p / 4 + 1, 13)
    val zHex = length(regexp_extract(tail, "^(0*)", 1))
    val d = conv(tail.substr(zHex + 1, lit(1)), 16, 10).cast("long")
    val inDigit = when(d >= 8, 0).when(d >= 4, 1).when(d >= 2, 2).otherwise(3)
    val rho = when(zHex === 13, lit(53))
      .otherwise(zHex * 4 + inDigit + 1)
    val regs = df
      .filter(value.isNotNull)
      .select(group.cast("string").as("group_key"), bucket.as("b"), rho.as("r"))
      .groupBy("group_key", "b")
      .agg(max("r").as("mj"))
    def estimate(r: DataFrame): DataFrame = {
      val sumInt = r.groupBy("group_key").agg(
        count(lit(1)).as("n_regs"),
        sum(expr("shiftleft(cast(1 as bigint), 53 - mj)")).as("s_present"))
      // α_m·m²·2^53 / Σint, linear counting below 2.5m; the float
      // expression ORDER is mirrored textually in the DuckDB oracle so
      // both engines run the identical IEEE chain
      val vZero = lit(m.toLong) - col("n_regs")
      val sInt = col("s_present") + vZero * lit(9007199254740992L) // 2^53
      val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
        lit((m.toLong * m).toDouble) * lit(9007199254740992.0) /
        sInt.cast("double")
      sumInt.select(
        col("group_key"), col("n_regs"), vZero.as("v_zero"),
        round(when(raw <= lit(2.5 * m) && vZero > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / vZero.cast("double")))
          .otherwise(raw), 4).as("hll_n"))
    }
    val merged = regs.groupBy("b").agg(max("mj").as("mj"))
      .select(lit("__all__").as("group_key"), col("b"), col("mj"))
    estimate(regs).unionByName(estimate(merged)).orderBy("group_key")
  }
}
