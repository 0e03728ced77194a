package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at-or-before each left ts, left-outer") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:30:00"), 200.0)
    ).toDF("k", "ts", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00"), "t1"), // after 10:00 quote -> 100
      (1L, ts("2024-01-01 11:00:00"), "t2"), // equal ts inclusive -> 110
      (2L, ts("2024-01-01 10:00:00"), "t3"), // before any quote -> null
      (3L, ts("2024-01-01 12:00:00"), "t4")  // key with no quotes -> null
    ).toDF("k", "ts", "trade")
    val out = TemporalJoins.asofJoin(trades, quotes, "k", "ts", "ts", Seq("px"))
      .orderBy("trade").collect()
    assert(out.map(r => r.getAs[String]("trade") ->
      Option(r.getAs[Any]("asof_px"))).toSeq == Seq(
      "t1" -> Some(100.0), "t2" -> Some(110.0), "t3" -> None, "t4" -> None))
  }

  test("asofJoin never matches NULL keys (SQL join semantics)") {
    val quotes = Seq((Option.empty[Long], ts("2024-01-01 09:00:00"), 50.0),
        (Some(1L), ts("2024-01-01 10:00:00"), 100.0))
      .toDF("k", "ts", "px")
    val trades = Seq((Option.empty[Long], ts("2024-01-01 10:30:00"), "tnull"),
        (Some(1L), ts("2024-01-01 10:30:00"), "t1"))
      .toDF("k", "ts", "trade")
    val out = TemporalJoins.asofJoin(trades, quotes, "k", "ts", "ts", Seq("px"))
      .orderBy("trade").collect()
    // NULL-key trade gets NO payload even though a NULL-key quote exists
    assert(out.map(r => r.getAs[String]("trade") ->
      Option(r.getAs[Any]("asof_px"))).toSeq ==
      Seq("t1" -> Some(100.0), "tnull" -> None))
  }

  test("batch sessionize splits on gaps and numbers sessions per key") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:10:00"), 2L),  // same session (10 min gap)
      (1L, ts("2024-01-01 11:30:00"), 3L),  // new session (80 min gap)
      (2L, ts("2024-01-01 10:00:00"), 4L)
    ).toDF("user_id", "ts", "event_id")
    val stats = graft.ops.Sessions.sessionStats(ev, "user_id", "ts", "event_id",
        gapSeconds = 1800)
      .orderBy("user_id", "session_id").collect()
    assert(stats.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 1L, 2L, 600L), (1L, 2L, 1L, 0L), (2L, 1L, 1L, 0L)))
  }

  test("rangeJoin matches points to covering intervals across bucket boundaries") {
    val points = Seq(
      (ts("2024-01-01 10:05:00"), "p1"),
      (ts("2024-01-01 10:59:00"), "p2"),
      (ts("2024-01-01 12:00:00"), "p3")
    ).toDF("ts", "p")
    val intervals = Seq(
      // spans two 30-min buckets
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "i1"),
      (ts("2024-01-01 11:30:00"), ts("2024-01-01 11:59:00"), "i2")
    ).toDF("s", "e", "i")
    val out = TemporalJoins.rangeJoin(points, "ts", intervals, "s", "e",
        bucketSeconds = 1800)
      .select("p", "i").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("p1", "i1"), ("p2", "i1"))) // p3 in no interval
  }

  test("asofJoinMulti keys on the composite; same-entity-other-tenant " +
      "rows never bleed") {
    val quotes = Seq(
      ("t1", 7L, ts("2024-01-01 10:00:00"), 100.0),
      ("t2", 7L, ts("2024-01-01 09:00:00"), 999.0), // same entity, other tenant
      ("t1", 7L, ts("2024-01-01 11:00:00"), 110.0)
    ).toDF("tenant", "ent", "ts", "px")
    val trades = Seq(
      ("a", "t1", 7L, ts("2024-01-01 10:30:00")), // -> 100
      ("b", "t2", 7L, ts("2024-01-01 10:30:00")), // -> 999 (its own tenant)
      ("c", "t3", 7L, ts("2024-01-01 10:30:00")), // unknown tenant -> null
      ("d", "t1", 7L, ts("2024-01-01 09:30:00"))  // before t1's first -> null
    ).toDF("id", "tenant", "ent", "ts")
    val out = TemporalJoins.asofJoinMulti(trades, quotes,
        Seq("tenant", "ent"), "ts", "ts", Seq("px")).collect()
      .map(r => r.getString(0) -> Option(r.get(4))
        .map(_.asInstanceOf[Double])).toMap
    assert(out == Map("a" -> Some(100.0), "b" -> Some(999.0),
      "c" -> None, "d" -> None))
  }

  test("pointInTimeJoin resolves the version true at the fact date, " +
      "with nulls before history and in closeMissing gaps") {
    // build the dim with the REAL scd2 machinery: k=1 changes tier at
    // 2024-03-01; k=2 disappears from the 2024-03-01 snapshot and is
    // closed (closeMissing) -> a gap after that date
    val dim0 = Seq(
      ("1", "bronze", "2024-01-01", null.asInstanceOf[String]),
      ("2", "gold", "2024-01-01", null.asInstanceOf[String])
    ).toDF("k", "tier", "valid_from", "valid_to")
    val snap = Seq(("1", "silver")).toDF("k", "tier")
    val dim = Scd.scd2Merge(dim0, snap, Seq("k"), Seq("tier"),
      snapshotDate = "2024-03-01", closeMissing = true)
    val facts = Seq(
      ("f1", "1", "2024-02-10"), // inside v1
      ("f2", "1", "2024-03-01"), // boundary: v2 starts, v1 excluded
      ("f3", "1", "2024-07-01"), // inside open v2
      ("f4", "2", "2024-02-01"), // inside k=2's only version
      ("f5", "2", "2024-04-01"), // in the closeMissing gap -> null
      ("f6", "3", "2024-02-01"), // unknown key -> null
      ("f7", "1", "2023-12-31")  // before any history -> null
    ).toDF("f", "k", "day")
    val out = TemporalJoins.pointInTimeJoin(facts, dim, "k", "day",
        Seq("tier")).collect()
      .map(r => r.getString(0) -> r.getAs[String]("pit_tier")).toMap
    assert(out == Map("f1" -> "bronze", "f2" -> "silver", "f3" -> "silver",
      "f4" -> "gold", "f5" -> null, "f6" -> null, "f7" -> null))
    // row count preserved: PIT join never duplicates or drops facts
    assert(TemporalJoins.pointInTimeJoin(facts, dim, "k", "day",
      Seq("tier")).count() == facts.count())
  }
}
