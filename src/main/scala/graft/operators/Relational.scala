package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational operators re-expressing the reference's Python
  * dataflow layer (SURVEY.md §2.B) as lazy, Catalyst-optimizable
  * DataFrame transforms. The reference pulled the whole table into
  * Python per request (ref: backend/app.py:35, backend/utils.py:156-164);
  * here every operator stays declarative so filters/projections reach the
  * parquet scan, partial aggregation happens map-side, and whole-stage
  * codegen covers the hot path. Nothing here calls collect().
  *
  * Scale notes (100 TB / 1000 executors):
  *  - group-by operators shuffle on their grouping keys only after
  *    map-side partial aggregation; cardinality of the outputs here is
  *    small (years, priorities, buckets), so the reduce side is trivial.
  *  - share-of-total uses a two-level aggregate (group counts, then a
  *    broadcast of the single global total) rather than a global window:
  *    Window.partitionBy() would funnel ALL rows through one partition.
  */
object Relational {

  /** A1/B1: projection with optional db→api rename. Catalyst prunes the
    * scan to exactly these columns (ref: backend/app.py:15-26,33-46). */
  def renameProject(df: DataFrame, mapping: Seq[(String, String)]): DataFrame =
    df.select(mapping.map { case (from, to) => col(from).as(to) }: _*)

  /** A2/B8/B11: conjunctive filter from optional predicates
    * (ref: backend/utils.py:145-154, backend/app.py:344-361). Catalyst
    * pushes every conjunct to the source scan. */
  def conjunctiveFilter(df: DataFrame, preds: Seq[Option[Column]]): DataFrame =
    preds.flatten.foldLeft(df)((acc, p) => acc.filter(p))

  /** A3/B7: DISTINCT projection (ref: backend/func.py:37-39,
    * backend/app.py:282-286). distinct() = partial+final hash aggregate;
    * at scale the map-side partial keeps the shuffle tiny for
    * low-cardinality columns. */
  def distinctValues(df: DataFrame, cols: String*): DataFrame =
    df.select(cols.map(col): _*).distinct()

  /** B3: derived surrogate key "{a}_{b}" with spaces collapsed to '_'
    * (ref: backend/app.py:55-57). Pure codegen'd expressions. */
  def surrogateKey(parts: Column*): Column =
    regexp_replace(concat_ws("_", parts: _*), " ", "_")

  /** B6: share-of-total per group, with an optional value recode applied
    * BEFORE grouping (ref: backend/app.py:132-164, recode :149-151).
    * Two aggregations instead of a global window: the grouped result is
    * tiny, so the window over it is safe — but we still avoid
    * Window.partitionBy() over the BASE table, which would single-thread
    * 100 TB through one partition. */
  def shareOfTotal(df: DataFrame, groupCol: Column, weight: Column): DataFrame = {
    val grouped = df.groupBy(groupCol.as("group_key"))
      .agg(weight.as("group_weight"))
    grouped.withColumn(
      "share",
      col("group_weight").cast("double") /
        sum("group_weight").over(Window.partitionBy()))
  }

  /** B12 argmax: deterministic top-1 by (metric desc, tiebreak asc)
    * (ref: backend/app.py:390-394). orderBy+limit(1) compiles to
    * TakeOrderedAndProject — a per-partition top-1 plus a single-row
    * merge, no global sort. */
  def argmax(df: DataFrame, metric: Column, tiebreak: Column): DataFrame =
    df.orderBy(metric.desc, tiebreak.asc).limit(1)

  /** B14: static-range histogram with EMPTY BUCKETS PRESERVED
    * (ref: backend/app.py:422-459; golden counts [1,0,1,1,1] at
    * test_app.py:229-236). Naive groupBy drops empty groups, so we
    * right-join the aggregated counts onto a literal bucket spine.
    * The spine is a handful of rows → broadcast join; the scan side
    * does one pass with a codegen'd CASE chain.
    *
    * Buckets are half-open [lo, hi); the last bucket is >= lo only
    * (ref: backend/app.py:440-444). Empty buckets report count 0 and
    * avg 0.0 (div-zero guard at ref: backend/app.py:448-451). */
  final case class Bucket(id: Int, label: String, lo: Double, hi: Option[Double])

  def histogram(
      spark: SparkSession,
      df: DataFrame,
      value: Column,
      avgOf: Column,
      buckets: Seq[Bucket]): DataFrame = {
    import spark.implicits._
    val bucketId = buckets.foldRight(lit(null: java.lang.Integer): Column) {
      case (b, elseCol) =>
        val cond = b.hi match {
          case Some(hi) => value >= lit(b.lo) && value < lit(hi)
          case None     => value >= lit(b.lo)
        }
        when(cond, lit(b.id)).otherwise(elseCol)
    }
    val agged = df
      .withColumn("bucket_id", bucketId)
      .filter(col("bucket_id").isNotNull)
      .groupBy("bucket_id")
      .agg(
        count(lit(1)).as("n"),
        // exact decimal sum → double: deterministic across engines
        sum(avgOf.cast("decimal(18,2)")).cast("double").as("s"))
    val spine = buckets.map(b => (b.id, b.label)).toDF("bucket_id", "label")
    spine
      .join(agged, Seq("bucket_id"), "left")
      .select(
        col("bucket_id").cast("long").as("bucket_id"),
        col("label"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("s") / col("n"), lit(0.0)).as("avg_value"))
      .orderBy("bucket_id")
  }

  /** SCD1 snapshot merge (upsert): rows from `delta` replace same-key
    * rows in `base`; delta-only keys insert; base-only keys carry
    * through. The MERGE INTO every incremental ingest pipeline runs,
    * expressed as ONE full-outer equi-join on the key — both sides
    * shuffle-partition on the key once and merge locally; nothing is
    * collected, nothing rewrites untouched partitions' content.
    *
    * `base` and `delta` must share a schema; delta must be unique per
    * key (pre-aggregate with max_by(ts) upstream for CDC streams —
    * last-writer-wins is the caller's reduction, not this operator's).
    * A whole-row struct per side (not per-column coalesce) decides
    * precedence, so a delta row carrying genuine NULLs still replaces
    * its base row outright. */
  def upsert(base: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty && base.columns.sameElements(delta.columns),
      "upsert: base/delta schemas must match")
    val nonKeys = base.columns.filterNot(keys.contains)
    val b = base.withColumn("__b", struct(nonKeys.toIndexedSeq.map(col): _*))
      .select(keys.map(col) :+ col("__b"): _*)
    val d = delta.withColumn("__d", struct(nonKeys.toIndexedSeq.map(col): _*))
      .select(keys.map(col) :+ col("__d"): _*)
    b.join(d, keys, "full_outer")
      .withColumn("__m", coalesce(col("__d"), col("__b")))
      .select(keys.map(col) ++ nonKeys.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Exact sum that is bitwise-reproducible across engines and partition
    * orders: doubles are summed in fixed-point DECIMAL (associative,
    * order-independent) and the exact total is cast back to double.
    * Plain sum(double) differs in the last bits between Spark's
    * partial-aggregate tree and a serial oracle. */
  def exactSum(c: Column): Column = sum(c.cast("decimal(18,6)")).cast("double")

  /** Exact average built the same way (exact sum / count). */
  def exactAvg(c: Column): Column =
    sum(c.cast("decimal(18,6)")).cast("double") / count(c)

  /** Exact DISCRETE per-group quantiles: for each probability p the
    * returned value is the ACTUAL data element at rank ⌈p·n⌉ — no
    * interpolation, so the output is an existing value reproducible
    * bit-for-bit by any engine (interpolated quantiles differ in final
    * ulps between implementations). One shuffle on the group key and a
    * per-group local sort (the same shape as any ranked window); n per
    * group rides the same window, no second scan. For quantiles over
    * 100 TB where a per-group sort is too hot, approx_percentile
    * (t-digest, g3-style bounded error) is the scale path — this is the
    * exact gate. Output: group_key, then one `p<pct>` column per p. */
  def exactQuantiles(
      df: DataFrame, group: Column, value: Column, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0))
    val byGroup = Window.partitionBy(col("group_key"))
    val ranked = df.select(group.as("group_key"), value.as("v"))
      .withColumn("rn", row_number().over(byGroup.orderBy(col("v"))))
      .withColumn("n", count(lit(1)).over(byGroup))
    val picks = ps.map { p =>
      max(when(col("rn") === ceil(lit(p) * col("n")), col("v")))
        .as(s"p${math.round(p * 100)}")
    }
    ranked.groupBy("group_key").agg(picks.head, picks.tail: _*)
  }

  /** One-pass column profile — the data-quality summary every ingest
    * runs before accepting a drop: per column, non-null count, distinct
    * count, and min/max (stringified so one schema fits every type).
    *
    * All columns aggregate in a SINGLE `agg` call: Catalyst plans the
    * multi-column distinct aggregates with one Expand over the scan —
    * the table is still read once, which at 100 TB is the difference
    * between a profile and a full re-scan per column. Output: one row
    * per column, ordered by name. */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("n_rows") +: columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"__${c}__nonnull"),
        count_distinct(col(c)).as(s"__${c}__distinct"),
        min(col(c)).cast("string").as(s"__${c}__min"),
        max(col(c)).cast("string").as(s"__${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = explode(array(columns.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__${c}__nonnull").as("n_nonnull"),
        col(s"__${c}__distinct").as("n_distinct"),
        col(s"__${c}__min").as("min_value"),
        col(s"__${c}__max").as("max_value"))
    }: _*))
    one.select(col("n_rows"), perCol.as("p"))
      .select(col("p.column").as("column"), col("n_rows"),
        col("p.n_nonnull").as("n_nonnull"),
        col("p.n_distinct").as("n_distinct"),
        col("p.min_value").as("min_value"),
        col("p.max_value").as("max_value"))
      .orderBy("column")
  }
}
