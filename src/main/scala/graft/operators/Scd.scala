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
      // 2. keep only rows where the attribute actually changes
      .withColumn("prev_attr", lag(col("attr_value"), 1).over(byEntity))
      .where(col("prev_attr").isNull ||
        col("prev_attr") =!= col("attr_value") ||
        col("attr_value").isNull && col("prev_attr").isNotNull)
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
