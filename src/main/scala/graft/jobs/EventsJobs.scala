package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.EtlJob
import graft.ops.Events

/** Manifest-loadable adapters onto [[graft.ops.Events]] so the batch
  * event-analytics chain (sessionize → per-user/funnel/cohort rollups)
  * runs from YAML alone (`conf/events_pipeline.yml`), the same `class:`
  * mechanism as the training-data jobs in [[LlmPipelineJobs]].
  *
  * Shared params (all optional): `user_col` (default `user_id`),
  * `ts_col` (`ts`), `id_col` (`event_id`).
  */
private object EP {
  def user(p: Map[String, String]): String = p.getOrElse("user_col", "user_id")
  def ts(p: Map[String, String]): String = p.getOrElse("ts_col", "ts")
  def id(p: Map[String, String]): String = p.getOrElse("id_col", "event_id")
}

/** Gap-based sessionization ([[Events.sessionize]]). Extra params:
  * `value_col` (default `value`), `gap_seconds` (default 1800).
  */
class SessionizeJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame =
    Events.sessionize(inputs.values.head, EP.user(params), EP.ts(params),
      EP.id(params), params.getOrElse("value_col", "value"),
      gapSeconds = params.getOrElse("gap_seconds", "1800").toLong)
}

/** Ordered-step funnel ([[Events.funnel]]). Extra params: `type_col`
  * (default `event_type`), `steps` (comma-separated, required),
  * `within_seconds` (optional — bounds each step to a conversion window
  * after the previous one, [[Events.funnelWithin]]).
  */
class FunnelJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame = {
    val steps = params.getOrElse("steps",
      sys.error("FunnelJob needs a 'steps' param (comma-separated)"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val typeCol = params.getOrElse("type_col", "event_type")
    params.get("within_seconds") match {
      case Some(w) => Events.funnelWithin(inputs.values.head,
        EP.user(params), EP.ts(params), EP.id(params), typeCol, steps,
        withinSeconds = w.toLong)
      case None => Events.funnel(inputs.values.head, EP.user(params),
        EP.ts(params), EP.id(params), typeCol, steps)
    }
  }
}

/** Cohort retention ([[Events.cohortRetention]]). */
class CohortRetentionJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame =
    Events.cohortRetention(inputs.values.head, EP.user(params), EP.ts(params))
}

/** Multi-touch attribution ([[Events.attribution]]). Extra params:
  * `type_col` (default `event_type`), `conversion` (default `purchase`),
  * `touches` (comma-separated, default `view,click`),
  * `lookback_seconds` (default 7200).
  */
class AttributionJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame =
    Events.attribution(inputs.values.head, EP.user(params), EP.ts(params),
      EP.id(params),
      conversionType = params.getOrElse("conversion", "purchase"),
      touchTypes = params.getOrElse("touches", "view,click")
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      typeCol = params.getOrElse("type_col", "event_type"),
      lookbackSeconds = params.getOrElse("lookback_seconds", "7200").toLong)
}

/** Markov transition matrix ([[Events.transitionMatrix]]). Extra param:
  * `type_col` (default `event_type`).
  */
class TransitionMatrixJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame =
    Events.transitionMatrix(inputs.values.head, EP.user(params),
      EP.ts(params), EP.id(params), params.getOrElse("type_col", "event_type"))
}

/** EWMA volume anomaly ([[graft.ops.Stats.ewmaAnomaly]]) keyed on
  * `type_col`. Extra params: `horizon_days` (default 20), `ratio`
  * (default 2).
  */
class EwmaAnomalyJob extends EtlJob {
  def transform(inputs: Map[String, DataFrame], spark: SparkSession,
                params: Map[String, String]): DataFrame =
    graft.ops.Stats.ewmaAnomaly(inputs.values.head,
      params.getOrElse("type_col", "event_type"), EP.ts(params),
      horizonDays = params.getOrElse("horizon_days", "20").toInt,
      ratio = params.getOrElse("ratio", "2").toLong)
}
