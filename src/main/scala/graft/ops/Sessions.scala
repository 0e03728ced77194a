package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch sessionization: the gaps-and-islands window composition (lag →
  * new-session flag → running sum), the batch twin of
  * streaming.Sessionize. One shuffle on the key; session ids are ordinals
  * within each key, deterministic given a unique (tsCol, tieCol) order.
  *
  * Gap decisions truncate to WHOLE SECONDS (`unix_timestamp`) — this is
  * the contract streaming.Sessionize's event-time replay (q61) is held
  * to, so it stays second-granular on purpose. For microsecond-exact
  * session boundaries plus session-grain rollup columns (duration_us,
  * value sums) use [[Events.sessionize]].
  */
object Sessions {

  /** Attach a per-key ordinal `session_id` to every event: a new session
    * starts when the gap to the previous event exceeds `gapSeconds`.
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(prev.isNull ||
      unix_timestamp(col(tsCol)) - unix_timestamp(prev) > gapSeconds, 1L)
      .otherwise(0L)
    events.withColumn("session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** One row per session: event count and duration in seconds. */
  def sessionStats(events: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, gapSeconds: Long): DataFrame =
    sessionize(events, keyCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
          .as("duration_sec"))
}
