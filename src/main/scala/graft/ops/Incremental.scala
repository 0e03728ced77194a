package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-load filters (reference yaetos/etl_utils.py:299-347,
  * 579-593). All bounds stay in the plan (broadcast scalar frames, not
  * driver `collect`), so the same code runs unchanged on a cluster and the
  * filters push down to the scan when the bound is a literal.
  */
object Incremental {

  /** Keep rows of one day-granularity period: `date(incCol) == period`.
    *
    * For date/timestamp columns the predicate is a half-open RANGE on the
    * raw column (`incCol >= p AND incCol < p+1d`) — equivalent under the
    * session's UTC zone, but pushdown-eligible: parquet row-group min/max
    * pruning and JDBC predicate pushdown both work, where
    * `to_date(incCol) = p` is an expression on the column and forces every
    * period's pass to scan the full input. Opaque (string) columns keep
    * the to_date form.
    */
  def periodFilter(df: DataFrame, incCol: String, period: String): DataFrame = {
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    val p = lit(period).cast("date")
    // case-INSENSITIVE column lookup, matching the analyzer's default
    // resolution (a manifest's inc_field: "TS" must keep resolving
    // against a "ts" column); unknown/ambiguous falls to the to_date form
    val dtype = df.schema.find(_.name.equalsIgnoreCase(incCol)).map(_.dataType)
    dtype match {
      case Some(TimestampType) => df.filter(
        col(incCol) >= p.cast("timestamp") &&
          col(incCol) < date_add(p, 1).cast("timestamp"))
      case Some(TimestampNTZType) => df.filter(
        col(incCol) >= p.cast("timestamp_ntz") &&
          col(incCol) < date_add(p, 1).cast("timestamp_ntz"))
      case Some(DateType) => df.filter(col(incCol) === p)
      case _ => df.filter(to_date(col(incCol)) === p)
    }
  }

  /** Max of the increment column as a 1-row frame (for plan-side bounds). */
  def maxOf(df: DataFrame, incCol: String): DataFrame =
    df.agg(max(col(incCol)).as("hi"))

  /** "Min-of-max" incremental filter: each input can only be consumed up to
    * the smallest of the inputs' max(inc) values (so a lagging input never
    * leaves a gap). Returns `df` restricted to (lo, minOfMax].
    *
    * The bound is computed as a cross-join with a broadcast 1-row aggregate
    * — no collect, and Catalyst folds it into a scalar subquery plan.
    */
  def minOfMaxFilter(df: DataFrame, incCol: String, lo: Column,
                     inputs: Seq[(DataFrame, String)]): DataFrame = {
    val bounds = inputs.map { case (in, c) =>
      in.agg(max(col(c)).cast("timestamp").as("m"))
    }.reduce((a, b) => a.crossJoin(b.withColumnRenamed("m", "m2"))
      .select(least(col("m"), col("m2")).as("m")))
    df.crossJoin(broadcast(bounds))
      .filter(col(incCol) > lo && col(incCol) <= col("m"))
      .drop("m")
  }
}
