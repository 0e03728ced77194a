package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The `exact = false` escape hatch on the exact-`percentile` family
  * ([[Stats.equiDepthBins]], [[Events.rfm]], [[Events.funnelLatency]] —
  * the q126 `perplexityBuckets` switch, generalized): at validation
  * scale (sf0.1, the largest local tier) the GK-sketch
  * `approx_percentile` path must agree with the exact path to within
  * the sketch's rank-error contract, so flipping the switch at 100 TB
  * changes memory shape (bounded, mergeable buffers instead of a full
  * value multiset in one aggregation buffer), not answers.
  */
class ApproxPercentileSwitchSpec extends SparkSpec {

  private lazy val lineitem =
    graft.core.Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
  private lazy val events =
    graft.core.Tables.load(spark, "/root/testdata/sf0.1", "events")

  test("equiDepthBins: approx deciles match exact within sketch rank error") {
    val exact = Stats.equiDepthBins(lineitem, "l_extendedprice", bins = 10)
      .orderBy("bucket").collect()
    val approx = Stats.equiDepthBins(lineitem, "l_extendedprice", bins = 10,
        exact = false, accuracy = 10000)
      .orderBy("bucket").collect()
    assert(exact.length === 10 && approx.length === 10)
    val n = exact.map(_.getAs[Long]("n")).sum
    // accuracy=10000 -> rank error <= n/10000 per edge; each bucket is
    // bounded by two edges
    val tol = math.max(2L * n / 10000L, 1L)
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getAs[Long]("bucket") === a.getAs[Long]("bucket"))
      assert(math.abs(e.getAs[Long]("n") - a.getAs[Long]("n")) <= tol,
        s"bucket ${e.getAs[Long]("bucket")}: exact ${e.getAs[Long]("n")} " +
          s"vs approx ${a.getAs[Long]("n")} (tol $tol)")
    }
  }

  test("rfm: approx quintile labels agree for ~all users at sf0.1") {
    def run(ex: Boolean) =
      Events.rfm(events, "user_id", "ts", "value", "2024-07-01 00:00:00",
          exact = ex)
        .select("user_id", "segment").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val e = run(true)
    val a = run(false)
    assert(e.keySet === a.keySet)
    val disagree = e.count { case (u, s) => a(u) != s }
    // only users sitting exactly on a shifted cut point can flip; with
    // rank error n/10000 over ~1.5k users the edges land on the same
    // interpolation neighborhood — allow <1% label drift
    assert(disagree <= math.max(e.size / 100, 1),
      s"$disagree of ${e.size} users changed segment under approx edges")
  }

  test("funnelLatency: approx p50/p90 within 1% of exact at sf0.1") {
    val steps = Seq("signup", "view", "purchase")
    def run(ex: Boolean) =
      Events.funnelLatency(events, "user_id", "ts", "event_id", "event_type",
          steps, exact = ex)
        .orderBy("step_idx").collect()
    val e = run(true)
    val a = run(false)
    assert(e.length === a.length && e.nonEmpty)
    e.zip(a).foreach { case (er, ar) =>
      assert(er.getAs[Long]("n_users") === ar.getAs[Long]("n_users"))
      Seq("p50_s", "p90_s").foreach { c =>
        val ev = er.getAs[Double](c); val av = ar.getAs[Double](c)
        assert(math.abs(ev - av) <= math.max(0.01 * ev, 0.01),
          s"$c: exact $ev vs approx $av")
      }
    }
  }

  test("funnelLatency: step names with quotes are data, not SQL text") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "it's a view"),
      (2L, "2024-01-01 10:01:00", 1L, "bob's click"))
      .toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = Events.funnelLatency(df, "user_id", "ts", "event_id",
        "event_type", Seq("it's a view", "bob's click")).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("step") === "bob's click")
    assert(out.head.getAs[Double]("p50_s") === 60.0)
  }
}
