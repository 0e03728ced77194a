package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution statistics for pipeline monitoring: before gating a
  * corpus on a score (quality, perplexity, length) you need its shape.
  * Spark's `approxQuantile` answers interactively but is
  * merge-order-dependent; these are exact, deterministic aggregates that
  * hold under the dual-engine hash gate.
  */
object Stats {

  /** Exact equi-width histogram of `valueCol` over [lo, hi): `bins`
    * buckets of width (hi-lo)/bins, out-of-range values clamped into the
    * edge buckets so totals are conserved. Returns one row per non-empty
    * bucket: `(bucket, lo_edge, hi_edge, cnt)`.
    *
    * One map-side-combined aggregation on a bounded key space (≤ bins
    * groups) — at 100 TB the shuffle carries at most `bins` rows per
    * task, nothing scales with the data.
    */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
                bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    require(hi > lo, s"empty range: [$lo, $hi)")
    val width = (hi - lo) / bins
    val raw = floor((col(valueCol).cast("double") - lit(lo)) / lit(width))
    val bucket = least(greatest(raw, lit(0.0)), lit((bins - 1).toDouble))
      .cast("long")
    df.filter(col(valueCol).isNotNull)
      .select(bucket.as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("lo_edge", round(lit(lo) + col("bucket") * lit(width), 6))
      .withColumn("hi_edge", round(lit(lo) + (col("bucket") + 1) * lit(width), 6))
      .select(col("bucket"), col("lo_edge"), col("hi_edge"), col("cnt"))
  }

  /** Grouped numeric profile: count, min, max, mean, stddev (population).
    * Values quantize to 4 decimals and accumulate as EXACT scaled-integer
    * sums (decimal-backed, overflow-safe), so mean/variance are pure
    * functions of the value multiset — identical across partitionings and
    * engines. A plain double `sum` drifts with summation order (~n·ε
    * relative), which a rounded stddev at 1e8 magnitudes would expose;
    * the only doubles here are two final conversions and divisions, the
    * same IEEE ops in the same order on every engine.
    *
    * Domain: |value| ≤ ~9·10¹³ (the 18-digit decimal quantization bound);
    * squaring happens in decimal, so no long overflow inside the plan.
    */
  def profile(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val d: Column = col(valueCol).cast("decimal(18,4)")
    val u: Column = (d * lit(10000)).cast("long")
    val uDec: Column = u.cast("decimal(19,0)")
    val n = count(lit(1))
    val s = sum(u.cast("decimal(38,0)")).cast("double") / lit(1e4)
    val s2 = sum(uDec * uDec).cast("double") / lit(1e8)
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(n.as("cnt"),
        round(min(d).cast("double"), 4).as("min_v"),
        round(max(d).cast("double"), 4).as("max_v"),
        round(s / n, 4).as("mean_v"),
        round(sqrt(s2 / n - (s / n) * (s / n)), 4).as("stddev_pop"))
  }

  /** MERGEABLE per-batch partial of [[profile]]: the exact accumulators,
    * one row per group — `(grp, cnt, sum_u, sum_u2, min_v, max_v)` with
    * the sums as scaled decimals and min/max still decimal(18,4).
    * Partials from disjoint batches (today's ingest, yesterday's card)
    * combine through [[profileMerge]] into BIT-IDENTICAL output to
    * [[profile]] over the union: integer/decimal accumulators merge with
    * no float drift, and the finalization applies the same IEEE ops in
    * the same order. The incremental dataset-card step — a corpus is
    * never rescanned to refresh its card.
    */
  def profilePartial(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val d: Column = col(valueCol).cast("decimal(18,4)")
    val u: Column = (d * lit(10000)).cast("long")
    val uDec: Column = u.cast("decimal(19,0)")
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("cnt"),
        sum(u.cast("decimal(38,0)")).as("sum_u"),
        sum(uDec * uDec).as("sum_u2"),
        min(d).as("min_v"), max(d).as("max_v"))
  }

  /** Merge [[profilePartial]] frames (union them first) and finalize to
    * exactly [[profile]]'s schema and values.
    */
  def profileMerge(partials: DataFrame): DataFrame = {
    val merged = partials.groupBy("grp")
      .agg(sum("cnt").as("cnt"), sum("sum_u").as("sum_u"),
        sum("sum_u2").as("sum_u2"),
        min("min_v").as("min_v"), max("max_v").as("max_v"))
    val n = col("cnt")
    val s = col("sum_u").cast("double") / lit(1e4)
    val s2 = col("sum_u2").cast("double") / lit(1e8)
    merged.select(col("grp"), n.as("cnt"),
      round(col("min_v").cast("double"), 4).as("min_v"),
      round(col("max_v").cast("double"), 4).as("max_v"),
      round(s / n, 4).as("mean_v"),
      round(sqrt(s2 / n - (s / n) * (s / n)), 4).as("stddev_pop"))
  }
}
