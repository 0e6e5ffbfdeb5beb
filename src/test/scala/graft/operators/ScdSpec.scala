package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ScdSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val changeLog = Seq(
    // (user, ts, event_id, attr)
    (1L, ts("2024-01-01 00:00:00"), 10L, "bronze"),
    (1L, ts("2024-01-02 00:00:00"), 11L, "bronze"), // no change — collapses
    (1L, ts("2024-01-03 00:00:00"), 12L, "silver"),
    (1L, ts("2024-01-04 00:00:00"), 13L, "gold"),
    (2L, ts("2024-01-01 12:00:00"), 20L, "silver"), // single-version entity
    (3L, ts("2024-02-01 00:00:00"), 31L, "gold"),
    (3L, ts("2024-02-01 00:00:00"), 30L, "bronze")) // equal ts → event_id breaks
    .toDF("user_id", "ts", "event_id", "attr")

  private def history = Scd.scd2(changeLog, col("user_id"), col("ts"),
    Seq(col("ts"), col("event_id")), col("attr"))

  test("scd2 collapses runs, versions survivors, and chains intervals") {
    val got = history
      .select("entity_key", "version", "attr_value", "valid_from", "valid_to", "is_current")
      .as[(Long, Int, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val want = Seq(
      (1L, 1, "bronze", ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), false),
      (1L, 2, "silver", ts("2024-01-03 00:00:00"), Some(ts("2024-01-04 00:00:00")), false),
      (1L, 3, "gold", ts("2024-01-04 00:00:00"), None, true),
      (2L, 1, "silver", ts("2024-01-01 12:00:00"), None, true),
      // user 3: equal timestamps — event_id 30 (bronze) precedes 31 (gold)
      (3L, 1, "bronze", ts("2024-02-01 00:00:00"), Some(ts("2024-02-01 00:00:00")), false),
      (3L, 2, "gold", ts("2024-02-01 00:00:00"), None, true))
    assert(got == want)
  }

  test("scd2 intervals tile each entity's timeline with no gap or overlap") {
    val rows = history
      .as[(Long, Int, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().groupBy(_._1)
    rows.foreach { case (u, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.zipWithIndex.forall { case (r, i) => r._2 == i + 1 },
        s"user $u versions not 1..n")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"user $u: v${a._2} valid_to != v${b._2} valid_from")
        case _ =>
      }
      assert(sorted.init.forall(!_._6) && sorted.last._6 && sorted.last._5.isEmpty,
        s"user $u: exactly the last version must be current/open")
    }
  }

  test("asOfSnapshot returns exactly one version per entity, the one valid then") {
    val snap = Scd.asOfSnapshot(history, lit("2024-01-03 12:00:00").cast("timestamp"))
      .select("entity_key", "attr_value")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(snap == Seq((1L, "silver"), (2L, "silver")))
    // user 3's history starts after the as-of instant — absent, not null
  }

  test("pointInTimeJoin maps each fact into the interval tiling, leakage-free") {
    val facts = Seq(
      (100L, 1L, ts("2024-01-01 12:00:00")), // inside v1
      (101L, 1L, ts("2024-01-03 00:00:00")), // exactly at v2's valid_from → v2
      (102L, 1L, ts("2024-01-09 00:00:00")), // open tail → v3
      (103L, 2L, ts("2024-01-01 00:00:00")), // BEFORE user 2's history → null
      (104L, 3L, ts("2024-02-01 00:00:00"))) // zero-length v1 skipped → v2
      .toDF("fact_id", "fuser", "fts")
    val got = Scd.pointInTimeJoin(facts, history, col("fuser"), col("fts"))
      .select("fact_id", "version", "attr_value")
      .as[(Long, Option[Int], Option[String])].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (100L, Some(1), Some("bronze")),
      (101L, Some(2), Some("silver")),
      (102L, Some(3), Some("gold")),
      (103L, None, None),
      (104L, Some(2), Some("gold"))))
  }

  test("pointInTimeJoin never double-matches: intervals tile, so one version per fact") {
    val rnd = new scala.util.Random(555L)
    val events = (1 to 400).map { i =>
      (rnd.nextInt(10).toLong, ts(f"2024-03-${1 + rnd.nextInt(28)}%02d 00:00:00"),
        i.toLong, s"s${rnd.nextInt(3)}")
    }.toDF("user_id", "ts", "event_id", "attr")
    val hist = Scd.scd2(events, col("user_id"), col("ts"),
      Seq(col("ts"), col("event_id")), col("attr"))
    val joined = Scd.pointInTimeJoin(
      events.select(col("event_id"), col("user_id"), col("ts")),
      hist, col("user_id"), col("ts"))
    assert(joined.count() == 400L, "tiling must yield exactly one match per fact")
    assert(joined.filter(col("version").isNull).count() == 0L,
      "every event lies at-or-after its entity's first version")
  }

  test("scd2Apply: incremental fold equals the full rebuild, entity by entity") {
    val rnd = new scala.util.Random(3131L)
    val events = (1 to 500).map { i =>
      (rnd.nextInt(15).toLong,
        ts(f"2024-05-${1 + rnd.nextInt(28)}%02d 00:00:00"),
        i.toLong, s"s${rnd.nextInt(4)}")
    }.toDF("user_id", "ts", "event_id", "attr")
    val cutoff = ts("2024-05-21 00:00:00")
    val hist = Scd.scd2(events.filter(col("ts") <= cutoff),
      col("user_id"), col("ts"), Seq(col("ts"), col("event_id")), col("attr"))
    val got = Scd.scd2Apply(hist, events.filter(col("ts") > cutoff),
      col("user_id"), col("ts"), col("event_id"), col("attr"))
      .as[(Long, Int, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val full = Scd.scd2(events, col("user_id"), col("ts"),
      Seq(col("ts"), col("event_id")), col("attr"))
      .as[(Long, Int, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == full)
  }

  test("scd2Apply leaves untouched entities bit-identical, preserves equal-ts runs") {
    // user 3's history has two same-instant versions (zero-length v1) —
    // a delta for OTHER users must not disturb their relative order
    val delta = Seq((1L, ts("2024-06-01 00:00:00"), 99L, "platinum"))
      .toDF("user_id", "ts", "event_id", "attr")
    val got = Scd.scd2Apply(history, delta,
      col("user_id"), col("ts"), col("event_id"), col("attr"))
      .as[(Long, Int, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val before = history
      .as[(Long, Int, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got.filter(_._1 != 1L) == before.filter(_._1 != 1L),
      "untouched entities must pass through unchanged")
    val u1 = got.filter(_._1 == 1L)
    assert(u1.length == 4 && u1.last._3 == "platinum" && u1.last._6,
      s"user 1 must gain version 4 = platinum/current: $u1")
    assert(u1(2)._5.contains(ts("2024-06-01 00:00:00")),
      "the old current version must close at the new change's instant")
  }

  test("scd2 fuzz: matches a serial run-length reference") {
    val rnd = new scala.util.Random(2024L)
    (1 to 4).foreach { trial =>
      val rows = (1 to 300).map { i =>
        (rnd.nextInt(12).toLong,
          ts(f"2024-03-${1 + rnd.nextInt(28)}%02d 00:00:00"),
          i.toLong,
          s"s${rnd.nextInt(4)}")
      }
      val want = rows.groupBy(_._1).flatMap { case (u, evs) =>
        val ordered = evs.sortBy(e => (e._2.getTime, e._3))
        val runs = ordered.foldLeft(Vector.empty[(Timestamp, String)]) { (acc, e) =>
          if (acc.nonEmpty && acc.last._2 == e._4) acc else acc :+ ((e._2, e._4))
        }
        runs.zipWithIndex.map { case ((from, attr), i) =>
          val to = if (i + 1 < runs.length) Some(runs(i + 1)._1) else None
          (u, i + 1, attr, from, to, to.isEmpty)
        }
      }.toSeq.sortBy(r => (r._1, r._2))
      val got = Scd.scd2(rows.toDF("user_id", "ts", "event_id", "attr"),
          col("user_id"), col("ts"), Seq(col("ts"), col("event_id")), col("attr"))
        .as[(Long, Int, String, Timestamp, Option[Timestamp], Boolean)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
      assert(got == want, s"trial $trial")
    }
  }

  test("snapshotDiff: planted added/removed/changed, empty classes kept, null-aware") {
    val old = Seq(
      (1L, Some("a"), Some("p")), (2L, Some("b"), Some("q")),
      (3L, Some("c"), Some("r")), (4L, Some("d"), None),
      (5L, Some("e"), Some("t")))
      .toDF("k", "v1", "v2")
    val nw = Seq(
      (1L, Some("a"), Some("p")),            // unchanged
      (3L, Some("c"), Some("CHANGED")),      // changed
      (4L, Some("d"), Some("")),             // null -> empty string IS a change
      (5L, Some("e"), Some("t")),            // unchanged
      (6L, Some("f"), Some("u")))            // added; 2 removed
      .toDF("k", "v1", "v2")
    val got = Scd.snapshotDiff(old, nw, "k", Seq("v1", "v2"))
      .as[(String, Long, Option[Long])].collect()
    assert(got.map(r => r._1 -> ((r._2, r._3))).toMap == Map(
      "added" -> ((1L, Some(6L))),
      "changed" -> ((2L, Some(3L))),
      "removed" -> ((1L, Some(2L))),
      "unchanged" -> ((2L, Some(1L)))), s"got ${got.toSeq}")
    // identical snapshots: the three change classes keep their zero rows
    val same = Scd.snapshotDiff(old, old, "k", Seq("v1", "v2"))
      .as[(String, Long, Option[Long])].collect()
    assert(same.map(r => r._1 -> r._2).toMap ==
      Map("added" -> 0L, "changed" -> 0L, "removed" -> 0L, "unchanged" -> 5L))
    assert(same.filter(_._1 != "unchanged").forall(_._3.isEmpty),
      "empty classes carry NULL min_key, not a fabricated one")
  }
}
