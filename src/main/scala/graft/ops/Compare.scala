package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset comparison — the reference's most operator-like owned logic
  * (reference yaetos/libs/analysis_toolkit/compare_pandas_dfs.py:6-103,
  * jobs/generic/compare_job.py:18-81), re-expressed as distributed plans:
  * the reference hashes rows in pandas on the driver; here both sides stay
  * distributed (exceptAll / full-outer join on PKs), so the comparison
  * works at any scale.
  */
object Compare {

  /** Exact multiset diff: counts of rows only in the left / only in the
    * right / total matches. Order-free, null-safe (exceptAll is multiset
    * semantics, like the reference's row-hash compare).
    */
  def exactSummary(left: DataFrame, right: DataFrame): DataFrame = {
    val onlyLeft = left.exceptAll(right)
      .agg(count(lit(1)).cast("long").as("n")).withColumn("side", lit("only_left"))
    val onlyRight = right.exceptAll(left)
      .agg(count(lit(1)).cast("long").as("n")).withColumn("side", lit("only_right"))
    val nLeft = left.agg(count(lit(1)).cast("long").as("n"))
      .withColumn("side", lit("rows_left"))
    val nRight = right.agg(count(lit(1)).cast("long").as("n"))
      .withColumn("side", lit("rows_right"))
    onlyLeft.unionByName(onlyRight).unionByName(nLeft).unionByName(nRight)
      .select(col("side"), col("n")).orderBy("side")
  }

  /** Fuzzy per-row compare: full outer join on `pks`; numeric columns in
    * `compareCols` match when the relative delta is within `thresholdPct`
    * percent (nulls equal each other; a zero left value matches only an
    * exactly-zero right value — same special cases as the reference).
    * Output: one row per PK with a status column.
    */
  def fuzzyRows(left: DataFrame, right: DataFrame, pks: Seq[String],
                compareCols: Seq[String], thresholdPct: Double): DataFrame = {
    val l = pks.foldLeft(left.select((pks ++ compareCols).map(col): _*)) {
      (df, k) => df.withColumnRenamed(k, s"l_$k")
    }
    val lr = compareCols.foldLeft(l)((df, c) => df.withColumnRenamed(c, s"lv_$c"))
    val r0 = pks.foldLeft(right.select((pks ++ compareCols).map(col): _*)) {
      (df, k) => df.withColumnRenamed(k, s"r_$k")
    }
    val rr = compareCols.foldLeft(r0)((df, c) => df.withColumnRenamed(c, s"rv_$c"))
    val cond = pks.map(k => col(s"l_$k") === col(s"r_$k")).reduce(_ && _)
    val joined = lr.join(rr, cond, "full_outer")
    // Numeric columns match within the relative threshold; everything else
    // (strings, dates, booleans) by null-safe equality — the reference's
    // split (compare_pandas_dfs.py:31-103).
    val numericCols = left.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
    }.toSet
    val colMatches: Seq[Column] = compareCols.map { c =>
      val a = col(s"lv_$c"); val b = col(s"rv_$c")
      if (numericCols.contains(c))
        when(a.isNull && b.isNull, lit(true))
          .when(a.isNull || b.isNull, lit(false))
          .when(a === 0, b === 0)
          .otherwise(abs((a - b) / a) * 100 < thresholdPct)
      else a <=> b
    }
    val allMatch = colMatches.reduce(_ && _)
    val inLeft = pks.map(k => col(s"l_$k").isNotNull).reduce(_ && _)
    val inRight = pks.map(k => col(s"r_$k").isNotNull).reduce(_ && _)
    val status = when(inLeft && inRight && allMatch, "match")
      .when(inLeft && inRight, "delta_exceeds")
      .when(inLeft, "only_left")
      .otherwise("only_right")
    // per-column verdicts (the reference's per-column delta columns +
    // `_no_deltas` rollup, compare_pandas_dfs.py:31-103)
    val perCol = compareCols.zip(colMatches).map { case (c, m) =>
      when(inLeft && inRight, m).as(s"${c}_match")
    }
    joined.select(
      (pks.map(k => coalesce(col(s"l_$k"), col(s"r_$k")).as(k)) ++
        Seq(status.as("status"), allMatch.as("_no_deltas")) ++ perCol): _*)
  }

  /** Pre-compare column profile (reference compare_job's describe() step,
    * jobs/generic/compare_job.py:24-26): count/mean/stddev/min/quartiles/max
    * per numeric column.
    */
  def columnStats(df: DataFrame): DataFrame = df.summary()

  /** Aggregated fuzzy-compare report: counts per status. */
  def fuzzySummary(left: DataFrame, right: DataFrame, pks: Seq[String],
                   compareCols: Seq[String], thresholdPct: Double): DataFrame =
    fuzzyRows(left, right, pks, compareCols, thresholdPct)
      .groupBy("status").agg(count(lit(1)).as("n")).orderBy("status")
}
