package graft.jobs

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.model.Manifest
import graft.engine.Flow

/** The new events-pipeline branches (attribution, transitions, volume
  * alerts) run from `conf/events_pipeline.yml` alone and agree with the
  * library operators they wrap.
  */
class EventsJobsSpec extends SparkSpec {

  private def manifest(out: String) = {
    val events = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
    events.write.mode("overwrite").parquet(s"$out/events_micros")
    Manifest.loadFile("conf/events_pipeline.yml", Seq("dev"),
      Map("events_in" -> s"$out/events_micros", "out_root" -> out))
  }

  test("attribution, transitions, and volume_alerts run from the manifest") {
    val out = java.nio.file.Files.createTempDirectory("graft_evjobs").toString
    val loaded = manifest(out)
    val events = spark.read.parquet(s"$out/events_micros")

    val attr = Flow.runPipeline(spark, loaded.jobs, "attribution",
      save = true)("attribution")
    val direct = graft.ops.Events.attribution(events,
      "user_id", "ts", "event_id", lookbackSeconds = 7200L)
    assert(attr.collect().map(_.toSeq).toSet ===
      direct.collect().map(_.toSeq).toSet)
    assert(spark.read.parquet(s"$out/attribution").count() === attr.count())

    val trans = Flow.runPipeline(spark, loaded.jobs, "transitions",
      save = false)("transitions")
    val totals = trans.groupBy("from_type")
      .agg(sum("p_micro").as("p")).collect()
    // probabilities per from_type sum to ~1e6 (micro rounding drift < |types|)
    assert(totals.forall(r => math.abs(r.getAs[Long]("p") - 1000000L) <= 5L))

    val alerts = Flow.runPipeline(spark, loaded.jobs, "volume_alerts",
      save = false)("volume_alerts")
    val cols = alerts.columns.toSet
    assert(Set("event_type", "day", "n", "pred_micro", "is_anomaly")
      .subsetOf(cols))
    assert(alerts.count() > 0)
  }
}
