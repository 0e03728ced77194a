package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** [[FunnelStream.completions]] — the streaming funnel must advance only
  * watermark-final events, discard skipped-ahead events exactly like the
  * batch running-min, and converge to [[graft.ops.Events.funnel]].
  */
class FunnelStreamSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("advances are watermark-gated and skipped-ahead events discard") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val q = Streams.withStatePartitions(spark, 4) {
      FunnelStream.completions(df, "user_id", "ts", "event_id",
          "event_type", Seq("view", "click", "purchase"),
          watermarkDelay = "10 minutes")
        .writeStream.format("memory").queryName("funnel_comp")
        .outputMode("append").start()
    }
    try {
      mem.addData(
        // user 1: purchase arrives FIRST in event time (skipped ahead —
        // must never count), then the proper chain
        (1L, ts("2024-01-01 09:00:00"), 1L, "purchase"),
        (2L, ts("2024-01-01 10:00:00"), 1L, "view"),
        (3L, ts("2024-01-01 10:05:00"), 1L, "click"),
        // user 2 stalls at view
        (4L, ts("2024-01-01 10:00:00"), 2L, "view"))
      q.processAllAvailable()
      // watermark still trails — nothing final yet beyond what it passed
      mem.addData((99L, ts("2024-01-01 12:00:00"), 9L, "view"))
      q.processAllAvailable()
      mem.addData((100L, ts("2024-01-01 14:00:00"), 9L, "click"))
      q.processAllAvailable()
      val rows = spark.table("funnel_comp")
        .select("user_id", "step_idx", "step").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(rows.contains((1L, 1, "view")) && rows.contains((1L, 2, "click")))
      assert(!rows.contains((1L, 3, "purchase")),
        "a purchase BEFORE the view/click chain must not complete the funnel")
      assert(rows.contains((2L, 1, "view")))
    } finally q.stop()
  }

  test("streaming completions aggregate to the exact batch funnel") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val fixture = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:05:00", 1L, "click"),
      (3L, "2024-01-01 10:10:00", 1L, "purchase"),
      (4L, "2024-01-01 10:00:00", 2L, "view"),
      (5L, "2024-01-01 10:20:00", 2L, "purchase"), // no click: stalls at 1
      (6L, "2024-01-01 10:00:00", 3L, "click"),    // starts mid-funnel
      (7L, "2024-01-01 10:30:00", 3L, "view"),
      (8L, "2024-01-01 10:40:00", 3L, "click"))
    val batchDf = fixture.toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val batch = graft.ops.Events.funnel(batchDf, "user_id", "ts",
        "event_id", "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Int]("step_idx") ->
        r.getAs[Long]("n_users")).toMap
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val q = Streams.withStatePartitions(spark, 4) {
      FunnelStream.completions(df, "user_id", "ts", "event_id",
          "event_type", Seq("view", "click", "purchase"),
          watermarkDelay = "5 minutes")
        .writeStream.format("memory").queryName("funnel_eq")
        .outputMode("append").start()
    }
    try {
      mem.addData(fixture.map { case (id, t, u, ty) => (id, ts(t), u, ty) }: _*)
      q.processAllAvailable()
      // the sentinel advances the watermark but its type is filtered out
      // AFTER the watermark node, so it emits no completion of its own
      mem.addData((999L, ts("2024-01-02 00:00:00"), 9L, "sentinel"))
      q.processAllAvailable()
      val streamed = spark.table("funnel_eq")
        .groupBy("step_idx")
        .agg(count_distinct(col("user_id")).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      // batch reports zero-count steps too; compare on the reached ones
      assert(streamed === batch.filter(_._2 > 0),
        s"stream $streamed vs batch $batch")
    } finally q.stop()
  }

  test("inactivityTtl evicts quiescent funnels: a TTL-late step restarts " +
      "at step 1 (bounded state, the documented trade)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val q = Streams.withStatePartitions(spark, 4) {
      FunnelStream.completions(df, "user_id", "ts", "event_id",
          "event_type", Seq("view", "click"),
          watermarkDelay = "10 minutes",
          inactivityTtlSeconds = Some(1800L))
        .writeStream.format("memory").queryName("funnel_ttl")
        .outputMode("append").start()
    }
    try {
      // user 1 completes the whole funnel at 10:00/10:05
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
        (2L, ts("2024-01-01 10:05:00"), 1L, "click"))
      q.processAllAvailable()
      // sentinel -> watermark 10:50: both steps finalize AND the TTL
      // horizon (10:05 + 30 min = 10:35) is past -> user 1's state evicts
      mem.addData((3L, ts("2024-01-01 11:00:00"), 9L, "sentinel"))
      q.processAllAvailable()
      // a fresh view at 12:00 must restart the funnel (state was evicted),
      // re-emitting step 1 once finalized
      mem.addData((4L, ts("2024-01-01 12:00:00"), 1L, "view"))
      q.processAllAvailable()
      mem.addData((5L, ts("2024-01-01 13:30:00"), 9L, "sentinel"))
      q.processAllAvailable()
      val step1 = spark.table("funnel_ttl")
        .filter(col("user_id") === 1L && col("step_idx") === 1).count()
      assert(step1 === 2L,
        "an evicted funnel must restart from step 1 on new activity")
      // and the state store holds nothing once everything is quiescent
      // past its TTL (sentinel users never advance a step -> no state)
      val lastState = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum)
      assert(lastState.forall(_ <= 1L),
        s"state store should be ~empty after TTL eviction, got $lastState")
    } finally q.stop()
  }
}
