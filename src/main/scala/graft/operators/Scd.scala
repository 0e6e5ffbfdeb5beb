package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Slowly-changing-dimension (Type 2) history build: turn a
  * change-log of (key, ordered-change, attribute) rows into versioned
  * validity intervals — the warehouse counterpart of the reference's
  * overwrite-only car_data table (`backend/app.py:174-249` re-ingests
  * the whole dimension on every upload; a 100 TB warehouse keeps
  * history instead).
  *
  * 100 TB shape: every window below partitions by the HIGH-cardinality
  * entity key (user/vehicle id), never by an attribute — per-entity
  * timelines sort locally after ONE shuffle on the key, the same
  * discipline as `Events.sessionize`. No global ordering anywhere.
  */
object Scd {

  /** Two-snapshot TABLE DIFF — the reconciliation readout run after
    * every backfill/re-export at 100 TB ("did yesterday's pipeline
    * change what it shouldn't have?"): per-key added / removed /
    * changed / unchanged classification from ONE co-partitioned
    * full-outer join, with row contents compared as md5 fingerprints
    * so only (key, 16-byte digest) pairs ever shuffle — never the rows
    * themselves. The four classes are emitted from a literal spine
    * (B14 keep-empty-buckets rule), each with its count and min key as
    * the drill-down starting point.
    *
    * Fingerprint portability: values are null-sentineled (chr(1)) and
    * unit-separated (chr(31)) before md5 — the engine-portable digest
    * discipline. CALLER CONTRACT: `valueCols` must already be in
    * engine-portable string form (strings, integers, decimals — NOT
    * raw doubles, whose to-string formatting differs across engines;
    * cast doubles to DECIMAL first).
    *
    * 100 TB shape: two scans (one per snapshot, map-side digesting),
    * one key-keyed shuffle join (bucket both snapshots on the key and
    * it is co-located), a ≤4-row aggregate. Null keys join nothing and
    * classify as added/removed — loud, not dropped.
    *
    * Output: (change_type, n, min_key), always exactly 4 rows. */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "need at least one value column to compare")
    val spark = oldSnap.sparkSession
    import spark.implicits._
    def digested(df: DataFrame, tag: String): DataFrame =
      df.select(col(keyCol).as("k"),
        md5(concat_ws("\u001f",
          valueCols.map(c => coalesce(col(c).cast("string"), lit("\u0001"))): _*))
          .as(s"fp_$tag"))
    val j = digested(oldSnap, "old")
      .join(digested(newSnap, "new"), Seq("k"), "full_outer")
      .select(col("k"),
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") =!= col("fp_new"), "changed")
          .otherwise("unchanged").as("change_type"))
      .groupBy("change_type")
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_key"))
    Seq("added", "changed", "removed", "unchanged").toDF("change_type")
      .join(j, Seq("change_type"), "left")
      .select(col("change_type"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("min_key"))
      .orderBy("change_type")
  }

  /** Build the Type-2 history for one changing attribute.
    *
    * Steps (each a window over the same entity-key partitioning, which
    * Catalyst collapses into one shuffle + one local sort):
    *  1. order each entity's changes by `orderBy` (caller supplies a
    *     total order — e.g. (ts, event_id) so equal timestamps break
    *     deterministically);
    *  2. run-length-collapse: a change row survives only if its
    *     attribute differs from the previous surviving value — standard
    *     gaps-and-islands via lag();
    *  3. version the survivors 1..n per entity and derive
    *     [valid_from, valid_to) from the NEXT survivor's change time;
    *     the last version is open-ended (valid_to null, is_current).
    *
    * Output: (entity_key, version, attr_value, valid_from, valid_to,
    * is_current), one row per attribute run. */
  def scd2(
      changes: DataFrame,
      entity: Column,
      changeTime: Column,
      orderBy: Seq[Column],
      attr: Column): DataFrame = {
    require(orderBy.nonEmpty, "scd2 needs at least one ordering column")
    val byEntity = Window.partitionBy(col("entity_key")).orderBy(orderBy: _*)
    changes
      .select(Seq(entity.as("entity_key"), changeTime.as("change_ts"),
        attr.as("attr_value")) ++ orderBy: _*)
      // 2. keep only rows where the attribute actually changes. The
      //    first row needs an explicit marker: lag() = NULL is ambiguous
      //    between "no previous row" and "previous attribute was NULL",
      //    and the null-safe <=> comparison handles every null pairing
      //    (a null RUN collapses like any other run)
      .withColumn("prev_attr", lag(col("attr_value"), 1).over(byEntity))
      .withColumn("chg_rn", row_number().over(byEntity))
      .where(col("chg_rn") === 1 ||
        !(col("attr_value") <=> col("prev_attr")))
      // 3. version + validity interval from the next surviving change
      .withColumn("version", row_number().over(byEntity))
      .withColumn("valid_from", col("change_ts"))
      .withColumn("valid_to", lead(col("change_ts"), 1).over(byEntity))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("entity_key"), col("version"), col("attr_value"),
        col("valid_from"), col("valid_to"), col("is_current"))
  }

  /** Point-in-time lookup against a Type-2 history: the version of each
    * entity valid AT `asOf` (valid_from ≤ asOf < valid_to, open
    * intervals count). A pure filter — no join, no shuffle: at 100 TB
    * this is the reason the history table exists. */
  def asOfSnapshot(history: DataFrame, asOf: Column): DataFrame =
    history.where(col("valid_from") <= asOf &&
      (col("valid_to").isNull || col("valid_to") > asOf))

  /** Incremental Type-2 maintenance: fold a NEW batch of changes into
    * an existing history without rebuilding untouched entities — the
    * operation a daily warehouse load actually performs (at 100 TB the
    * history table is petabytes and a day's delta touches a sliver of
    * its entities; a full [[scd2]] rebuild per load is the anti-pattern
    * this operator exists to avoid).
    *
    * Mechanics: entities NOT in the batch pass through untouched (no
    * shuffle work beyond the semi/anti joins' key exchange); for
    * touched entities the history's (valid_from, attr_value) rows ARE
    * the collapsed change log, so re-running the run-length collapse
    * over history-rows ∪ new-changes rebuilds exactly those entities.
    *
    * In-order contract (documented, asserted by the oracle): each new
    * change must be STRICTLY AFTER its entity's last valid_from. A
    * late change landing at or between historical change instants
    * cannot generally be repaired from the collapsed log — the
    * collapse dropped the consecutive duplicates that decide adjacency
    * there (a full rebuild from the raw change log is the correct tool
    * for backfills). Under the contract, incremental output ==
    * full-rebuild output, and `ext_scd2_incremental`'s oracle IS the
    * full rebuild — a green row is the equivalence proof.
    *
    * Ordering note: history rows carry ord = MIN_LONG + version, so
    * same-instant historical versions (zero-length runs from equal-ts
    * changes) keep their original relative order through the
    * re-collapse, and any same-instant NEW change (outside the
    * equality contract but still deterministic) orders after them. */
  def scd2Apply(
      history: DataFrame,
      changes: DataFrame,
      entity: Column,
      changeTime: Column,
      changeOrder: Column,
      attr: Column): DataFrame = {
    // log column names deliberately differ from scd2's output aliases
    // (entity_key/change_ts/attr_value) — the orderBy columns survive
    // scd2's initial select, and a name collision there is ambiguous
    val batch = changes.select(entity.as("c_key"),
      changeTime.as("c_ts"), changeOrder.as("c_ord"), attr.as("c_attr"))
    val touchedKeys = batch.select(col("c_key").as("entity_key")).distinct()
    val untouched = history
      .join(touchedKeys, Seq("entity_key"), "left_anti")
    val touchedLog = history
      .join(touchedKeys, Seq("entity_key"), "left_semi")
      .select(col("entity_key").as("c_key"), col("valid_from").as("c_ts"),
        (lit(Long.MinValue) + col("version").cast("long")).as("c_ord"),
        col("attr_value").as("c_attr"))
      .unionByName(batch)
    val rebuilt = scd2(touchedLog, col("c_key"), col("c_ts"),
      Seq(col("c_ts"), col("c_ord")), col("c_attr"))
    untouched.unionByName(rebuilt)
  }

  /** Point-in-time (temporal) join: attach to every fact row the
    * history version valid at the fact's own timestamp — the join that
    * makes a Type-2 dimension usable for training-data labeling
    * ("what was this user's tier WHEN the event happened", no leakage
    * from later versions).
    *
    * The join is an EQUI-join on the entity key with the interval
    * predicate as a post-join filter — so Catalyst plans a hash/sort-
    * merge join keyed on the high-cardinality entity, never a range
    * nested-loop; per entity the candidate set is its version count
    * (small by construction — versions only exist where the attribute
    * CHANGED), so the filter prunes a bounded fan-out. Facts before an
    * entity's first version get a left-join null version (surfaced,
    * not dropped — silent row loss is how PIT joins leak).
    *
    * Output: fact columns + (version, attr_value). */
  def pointInTimeJoin(
      facts: DataFrame,
      history: DataFrame,
      factEntity: Column,
      factTime: Column): DataFrame = {
    val h = history.select(
      col("entity_key").as("_h_entity"), col("version"),
      col("attr_value"), col("valid_from"), col("valid_to"))
    facts
      .join(h,
        factEntity === col("_h_entity") &&
          col("valid_from") <= factTime &&
          (col("valid_to").isNull || col("valid_to") > factTime),
        "left")
      .drop("_h_entity", "valid_from", "valid_to")
  }
}
