package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** [[AttributionStream.credits]] — the streaming lane must converge to
  * [[graft.ops.Events.attribution]]'s exact credits, watermark-driven
  * (no wall clock), with late touches honored until the watermark
  * passes their conversion.
  */
class AttributionStreamSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def batchDf(rows: Seq[(Long, String, Long, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
  }

  test("credits finalize only after the watermark passes the conversion, " +
      "and equal the batch split") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val q = Streams.withStatePartitions(spark, 4) {
      AttributionStream.credits(df, "user_id", "ts", "event_id",
          "event_type", lookbackSeconds = 7200L,
          watermarkDelay = "10 minutes")
        .writeStream.format("memory").queryName("attr_credits")
        .outputMode("append").start()
    }
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
        (2L, ts("2024-01-01 10:10:00"), 1L, "click"),
        (3L, ts("2024-01-01 10:20:00"), 1L, "view"),
        (4L, ts("2024-01-01 10:30:00"), 1L, "purchase"))
      q.processAllAvailable()
      // watermark still at 10:20 — the conversion must NOT be final yet
      assert(spark.table("attr_credits").isEmpty,
        "credits emitted before the watermark passed the conversion")
      // a sentinel advances the watermark far past the conversion
      mem.addData((99L, ts("2024-01-01 13:00:00"), 2L, "view"))
      q.processAllAvailable()
      val rows = spark.table("attr_credits")
        .select("channel", "first_micro", "last_micro", "linear_micro")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_.toString)
      // 3 touches: first view gets first_touch 1e6 + linear 333334;
      // click 333333; last view last_touch 1e6 + linear 333333
      assert(rows.length === 3)
      assert(rows.contains(("view", 1000000L, 0L, 333334L)))
      assert(rows.contains(("click", 0L, 0L, 333333L)))
      assert(rows.contains(("view", 0L, 1000000L, 333333L)))
    } finally q.stop()
  }

  test("streaming credits aggregate to the exact batch attribution report") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // a messy multi-user fixture: out-of-window touches, double
    // conversions, touch-after-conversion, a user with no conversion
    val fixture = Seq(
      (1L, "2024-01-01 06:00:00", 1L, "view"),     // outside 2h lookback
      (2L, "2024-01-01 09:30:00", 1L, "click"),
      (3L, "2024-01-01 10:00:00", 1L, "purchase"),
      (4L, "2024-01-01 10:10:00", 1L, "view"),
      (5L, "2024-01-01 10:20:00", 1L, "purchase"), // second conversion
      (6L, "2024-01-01 11:00:00", 2L, "view"),     // user 2: no conversion
      (7L, "2024-01-01 09:00:00", 3L, "view"),
      (8L, "2024-01-01 09:05:00", 3L, "click"),
      (9L, "2024-01-01 09:10:00", 3L, "purchase"),
      (10L, "2024-01-01 09:59:00", 4L, "purchase") // conversion, no touches
    )
    val batch = graft.ops.Events.attribution(batchDf(fixture),
        "user_id", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("touches"), r.getAs[Long]("credit_micro")))).toMap
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val q = Streams.withStatePartitions(spark, 4) {
      AttributionStream.credits(df, "user_id", "ts", "event_id",
          "event_type", watermarkDelay = "5 minutes")
        .writeStream.format("memory").queryName("attr_eq")
        .outputMode("append").start()
    }
    try {
      // two arrival waves, each unordered WITHIN itself but respecting
      // the watermark contract (no event older than the current
      // watermark — those are genuinely-late rows the engine drops, by
      // design), then a sentinel to flush everything
      val rows = fixture.map { case (id, t, u, ty) => (id, ts(t), u, ty) }
      val (early, late) = rows.partition(_._2.before(ts("2024-01-01 10:00:00")))
      mem.addData(early.reverse: _*)
      q.processAllAvailable()
      mem.addData(late.reverse: _*)
      q.processAllAvailable()
      mem.addData((999L, ts("2024-01-02 00:00:00"), 9L, "view"))
      q.processAllAvailable()
      val streamed = spark.table("attr_eq")
        .groupBy("channel")
        .agg(count(lit(1)).as("touches"),
          sum("first_micro").as("f"), sum("last_micro").as("l"),
          sum("linear_micro").as("n"))
        .collect().flatMap(r => Seq(
          ("first_touch", r.getString(0)) -> ((r.getAs[Long]("touches"), r.getAs[Long]("f"))),
          ("last_touch", r.getString(0)) -> ((r.getAs[Long]("touches"), r.getAs[Long]("l"))),
          ("linear", r.getString(0)) -> ((r.getAs[Long]("touches"), r.getAs[Long]("n"))))).toMap
      assert(streamed === batch,
        s"streaming credits diverged from the batch report:\n" +
          s"stream $streamed\nbatch  $batch")
    } finally q.stop()
  }
}
