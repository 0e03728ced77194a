package graft.engine

import graft.SparkSpec
import graft.core.model.{DatasetSpec, JobSpec}
import org.apache.spark.sql.functions._

/** [[StreamRun]]: YAML-declared streaming jobs — increments mode is
  * end-to-end spec'd through real spark-submit in RunnerEndToEndSpec and
  * gated by q223/q224; here the lane-dispatch contracts (param mapping,
  * loud failures) and a full reservoir-lane drain against the batch
  * sampler.
  */
class StreamRunSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_srun").toString

  test("reservoir lane: a YAML-declared drain equals the batch sampler " +
      "over everything streamed") {
    val dir = tmp()
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map(i =>
      (i.toLong, s"g${rnd.nextInt(4)}", rnd.nextInt(40).toLong + 1))
    // two feed files -> two micro-batches
    rows.take(150).toDF("id", "g", "w").coalesce(1)
      .write.mode("append").parquet(s"$dir/feed")
    rows.drop(150).toDF("id", "g", "w").coalesce(1)
      .write.mode("append").parquet(s"$dir/feed")
    val job = JobSpec(name = "res",
      inputs = Map("src" -> DatasetSpec(path = s"$dir/feed",
        readOptions = Map("maxFilesPerTrigger" -> "1"))),
      output = Some(DatasetSpec(path = s"$dir/partials")),
      params = Map("stream_lane" -> "reservoir", "id_col" -> "id",
        "group_col" -> "g", "weight_col" -> "w", "n" -> "5"))
    val batches = graft.streaming.Streams.withStatePartitions(spark, 4) {
      StreamRun.runOnce(spark, job, s"$dir/ckpt", now = "n1")
    }
    assert(batches === 2L)
    val streamed = graft.streaming.Streams
      .loadReservoir(spark, s"$dir/partials", "id", "g", n = 5)
      .collect().map(_.toSeq).toSet
    val truth = graft.ops.Sampling.prioritySamplePerGroup(
        rows.toDF("id", "g", "w"), "id", "g", "w", n = 5)
      .collect().map(_.toSeq).toSet
    assert(streamed === truth,
      "YAML reservoir drain must equal the one-shot batch sampler")
    // a SECOND drain on the same checkpoint reports only ITS OWN batch
    // count — batchId is cumulative across restarts, so a naive
    // lastProgress.batchId+1 would report the lifetime count (3) here
    val more = (301 to 340).map(i =>
      (i.toLong, s"g${rnd.nextInt(4)}", rnd.nextInt(40).toLong + 1))
    more.toDF("id", "g", "w").coalesce(1)
      .write.mode("append").parquet(s"$dir/feed")
    val batches2 = graft.streaming.Streams.withStatePartitions(spark, 4) {
      StreamRun.runOnce(spark, job, s"$dir/ckpt", now = "n1")
    }
    assert(batches2 === 1L,
      s"restarted drain must count its own batches, got $batches2")
    // the streaming lanes are not in PlanAuditSpec's batch roster —
    // sweep the final read frame here, where the lane runs
    graft.PlanAudit.assertClean("reservoir lane read",
      graft.streaming.Streams.loadReservoir(spark, s"$dir/partials",
        "id", "g", n = 5))
    val streamed2 = graft.streaming.Streams
      .loadReservoir(spark, s"$dir/partials", "id", "g", n = 5)
      .collect().map(_.toSeq).toSet
    val truth2 = graft.ops.Sampling.prioritySamplePerGroup(
        (rows ++ more).toDF("id", "g", "w"), "id", "g", "w", n = 5)
      .collect().map(_.toSeq).toSet
    assert(streamed2 === truth2,
      "the restarted drain folds the new batch into the same reservoir")
  }

  test("unknown lanes and missing lane params fail loudly") {
    val dir = tmp()
    Seq((1L, 2.0)).toDF("id", "v").write.parquet(s"$dir/feed")
    def job(params: Map[String, String]) = JobSpec(name = "j",
      inputs = Map("src" -> DatasetSpec(path = s"$dir/feed")),
      output = Some(DatasetSpec(path = s"$dir/out")),
      params = params)
    val e1 = intercept[RuntimeException] {
      StreamRun.start(spark, job(Map("stream_lane" -> "nope")),
        s"$dir/c1", "n1")
    }
    assert(e1.getMessage.contains("unknown stream_lane"))
    val e2 = intercept[RuntimeException] {
      StreamRun.start(spark, job(Map("stream_lane" -> "psi_drift")),
        s"$dir/c2", "n1")
    }
    assert(e2.getMessage.contains("needs param 'ref'"))
    // join lane: input-count and param validation fail loudly
    val e3 = intercept[IllegalArgumentException] {
      StreamRun.start(spark, job(Map("stream_lane" -> "join",
        "left" -> "src", "key" -> "id", "left_ts" -> "v",
        "right_ts" -> "v", "watermark" -> "1 hour",
        "within" -> "1 hour")), s"$dir/c3", "n1")
    }
    assert(e3.getMessage.contains("exactly two inputs"))
    val twoIn = JobSpec(name = "j2",
      inputs = Map("a" -> DatasetSpec(path = s"$dir/feed"),
        "b" -> DatasetSpec(path = s"$dir/feed")),
      output = Some(DatasetSpec(path = s"$dir/out2")),
      params = Map("stream_lane" -> "join", "left" -> "nope"))
    val e4 = intercept[IllegalArgumentException] {
      StreamRun.start(spark, twoIn, s"$dir/c4", "n1")
    }
    assert(e4.getMessage.contains("names no input"))
    // two inputs WITHOUT the join lane still fail the one-input rule
    val e5 = intercept[IllegalArgumentException] {
      StreamRun.start(spark, twoIn.copy(params = Map.empty),
        s"$dir/c5", "n1")
    }
    assert(e5.getMessage.contains("exactly one input"))
  }
}
