package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Data-quality checks (reference yaetos/spark_utils.py:16-40): primary-key
  * uniqueness and the non-unique-PK finder. Distributed — the uniqueness
  * test is two aggregates, the finder is one window, no collects.
  */
object Checks {

  /** True iff `pks` uniquely identify rows. */
  def pkIsUnique(df: DataFrame, pks: Seq[String]): Boolean = {
    val pkCols = pks.map(col)
    val counts = df.agg(
      count(lit(1)).as("n"),
      countDistinct(pkCols.head, pkCols.tail: _*).as("d")).head()
    counts.getLong(0) == counts.getLong(1)
  }

  /** Rows whose `pks` value occurs more than once, with the occurrence
    * count attached (reference's `find_non_unique_pks`).
    */
  def nonUniquePks(df: DataFrame, pks: Seq[String]): DataFrame = {
    val w = Window.partitionBy(pks.map(col): _*)
    df.withColumn("_count_pk", count(lit(1)).over(w))
      .filter(col("_count_pk") >= 2)
  }

  /** Count of null values per column — cheap profile used before loads. */
  def nullProfile(df: DataFrame): DataFrame = {
    val aggs = df.columns.map(c => sum(when(col(c).isNull, 1).otherwise(0)).as(c))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Schema contract (dbt-style): compare a frame's actual schema to the
    * expected DDL and report every violation — `missing` (contract column
    * absent), `type_mismatch` (present at the wrong type), and `extra`
    * (present but not in the contract; suppressed by `allowExtra` for
    * additive-evolution pipelines). Purely schema-driven: zero data
    * scanned, so the gate is free at any table size.
    *
    * Output: `(column_name, issue, expected, actual)` ordered by column —
    * empty means the contract holds. [[enforceContract]] turns
    * violations into a hard failure at the load boundary.
    */
  def schemaContract(df: DataFrame, expectedDdl: String,
                     allowExtra: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val expected = org.apache.spark.sql.types.StructType.fromDDL(expectedDdl)
      .fields.map(f => f.name -> f.dataType.simpleString).toSeq
    val actual = df.schema.fields.map(f => f.name -> f.dataType.simpleString)
    val actualM = actual.toMap
    val expectedM = expected.toMap
    val missing = expected.collect { case (n, t) if !actualM.contains(n) =>
      (n, "missing", t, null.asInstanceOf[String]) }
    val mismatched = expected.collect {
      case (n, t) if actualM.get(n).exists(_ != t) =>
        (n, "type_mismatch", t, actualM(n)) }
    val extra: Seq[(String, String, String, String)] =
      if (allowExtra) Nil
      else actual.collect { case (n, t) if !expectedM.contains(n) =>
        (n, "extra", null.asInstanceOf[String], t) }.toSeq
    (missing ++ mismatched ++ extra)
      .toDF("column_name", "issue", "expected", "actual")
      .orderBy("column_name", "issue")
  }

  /** [[schemaContract]] as a gate: returns `df` untouched when the
    * contract holds, fails with the full violation list otherwise.
    */
  def enforceContract(df: DataFrame, expectedDdl: String,
                      allowExtra: Boolean = false): DataFrame = {
    val v = schemaContract(df, expectedDdl, allowExtra).collect()
    require(v.isEmpty, "schema contract violated:\n" + v.map(r =>
      s"  ${r.getString(0)}: ${r.getString(1)} " +
        s"(expected ${r.getString(2)}, actual ${r.getString(3)})")
      .mkString("\n"))
    df
  }

  /** Column-level PII scan: for every string column, the row-hit count
    * and rate of each PII pattern — the governance inventory that tells
    * you WHERE the emails/phones/IPs live before [[TextAnalysis
    * .redactPii]] scrubs them or [[graft.core.io.Maintenance
    * .deleteMatching]] forgets them.
    *
    * One scan, one single-row aggregate (columns × patterns counters,
    * map-side combined), then a row-local `stack` unpivot — no shuffle of
    * the data itself at any width, which is what lets it run over a
    * 100 TB table as a by-product of any other full read.
    *
    * Output: `(column_name, kind, n_hits, n_rows, hit_rate)`, one row per
    * string column × pattern.
    */
  def piiProfile(df: DataFrame,
                 patterns: Seq[(String, String)] = TextAnalysis.piiPatterns)
      : DataFrame = {
    val strCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name).toSeq
    require(strCols.nonEmpty, "piiProfile: no string columns to scan")
    val aggs = strCols.flatMap(c => patterns.map { case (k, re) =>
      sum(when(col(c).rlike(re), 1L).otherwise(0L)).as(s"${c}__$k") })
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val cells = strCols.flatMap(c =>
      patterns.map { case (k, _) => s"'$c', '$k', `${c}__$k`" })
    one.select(
        expr(s"stack(${cells.size}, ${cells.mkString(", ")}) " +
          "AS (column_name, kind, n_hits)"),
        col("n_rows"))
      .withColumn("hit_rate", round(col("n_hits") / col("n_rows"), 6))
      .select("column_name", "kind", "n_hits", "n_rows", "hit_rate")
  }

  /** K-anonymity audit over a quasi-identifier set (Sweeney 2002): a
    * release is k-anonymous when every quasi-identifier combination
    * matches at least k rows. Returns the one-row report the
    * governance gate needs before an export: `(n_rows, n_groups,
    * n_violating_groups, rows_at_risk, min_group_size, k_anonymous)` —
    * `rows_at_risk` counts rows living in sub-k groups.
    *
    * Scale shape: one map-side-combined aggregation to (quasi-id)
    * grain, then a second aggregate over the group-size table (already
    * contracted); nothing but group cardinality ever shuffles. Use
    * [[kAnonymityViolations]] for the actionable group list.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs at least one column")
    require(k >= 2, s"k must be >= 2: $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .agg(sum("_n").as("n_rows"),
        count(lit(1)).as("n_groups"),
        sum(when(col("_n") < k, 1L).otherwise(0L)).as("n_violating_groups"),
        sum(when(col("_n") < k, col("_n")).otherwise(0L)).as("rows_at_risk"),
        min("_n").as("min_group_size"))
      .withColumn("k_anonymous", col("min_group_size") >= k)
  }

  /** Referential-integrity audit: how many child rows point at a parent
    * key that does not exist (the FK check a lakehouse has no engine to
    * enforce). One left-anti-style aggregate: children contract to
    * (key, n) first — the join then moves one row per DISTINCT key,
    * never the child table — and parents prune to their key column.
    *
    * Output one row: `(n_child, n_child_keys, n_orphans,
    * n_orphan_keys, orphan_rate_micro, ok)`. Null child keys count as
    * orphans (they reference nothing).
    */
  def referentialIntegrity(child: DataFrame, parent: DataFrame,
                           childKey: String, parentKey: String): DataFrame = {
    val ckeys = child.groupBy(col(childKey).as("_k"))
      .agg(count(lit(1)).as("_n"))
    val pkeys = parent.select(col(parentKey).as("_k")).distinct()
      .withColumn("_hit", lit(1))
    ckeys.join(pkeys, Seq("_k"), "left")
      .agg(sum("_n").as("n_child"),
        count(lit(1)).as("n_child_keys"),
        sum(when(col("_hit").isNull, col("_n")).otherwise(0L)).as("n_orphans"),
        sum(when(col("_hit").isNull, 1L).otherwise(0L)).as("n_orphan_keys"))
      .select(col("n_child"), col("n_child_keys"), col("n_orphans"),
        col("n_orphan_keys"),
        round(round(col("n_orphans").cast("double") / col("n_child"), 6)
          * lit(1e6), 0).cast("long").as("orphan_rate_micro"),
        (col("n_orphans") === 0L).as("ok"))
  }

  /** L-diversity audit — [[kAnonymity]]'s companion (Machanavajjhala et
    * al. 2007): group size alone doesn't protect a release if every row
    * in a quasi-identifier group shares one sensitive value
    * (homogeneity attack). A release is l-diverse when every group
    * carries at least `l` DISTINCT sensitive values. Same one-row
    * report shape; same two-contraction scale cost (the distinct adds
    * one exact `count_distinct` per group).
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversity needs at least one quasi column")
    require(l >= 2, s"l must be >= 2: $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("_n"),
        count_distinct(col(sensitiveCol)).as("_d"))
      .agg(sum("_n").as("n_rows"),
        count(lit(1)).as("n_groups"),
        sum(when(col("_d") < l, 1L).otherwise(0L)).as("n_violating_groups"),
        sum(when(col("_d") < l, col("_n")).otherwise(0L)).as("rows_at_risk"),
        min("_d").as("min_distinct_sensitive"))
      .withColumn("l_diverse", col("min_distinct_sensitive") >= l)
  }

  /** The sub-k quasi-identifier groups themselves — what to suppress or
    * generalize. Output: the quasi columns + `n`, smallest groups the
    * most urgent.
    */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String],
                           k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityViolations needs a column")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }

  /** Freshness SLA check against an explicit `asOf` instant (a
    * PARAMETER, not the wall clock — determinism is part of the gate
    * contract): per group, the newest event time, its lag behind
    * `asOf` in seconds, and whether the lag is within `maxLagSeconds`.
    * One map-side-combined max per group.
    *
    * Output: `(group, max_ts, lag_s, fresh)` with `max_ts` rendered as
    * a string timestamp (engine-portable, like day outputs).
    */
  def freshness(df: DataFrame, groupCol: String, tsCol: String,
                asOf: String, maxLagSeconds: Long): DataFrame = {
    require(maxLagSeconds >= 0, s"maxLagSeconds must be >= 0: $maxLagSeconds")
    df.groupBy(col(groupCol).as("grp"))
      .agg(max(unix_micros(col(tsCol).cast("timestamp"))).as("_max_us"))
      .withColumn("_asof_us", unix_micros(to_timestamp(lit(asOf))))
      .select(col("grp"),
        date_format(timestamp_micros(col("_max_us")),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("max_ts"),
        // integer div, not float-divide-then-cast: DuckDB CAST rounds
        // where Spark truncates — `div`/`//` agree (for the sane
        // case asOf >= max_ts; a negative lag still reports, floor vs
        // trunc diverging by 1s there is documented noise)
        expr("(_asof_us - _max_us) div 1000000").as("lag_s"),
        (col("_asof_us") - col("_max_us") <= maxLagSeconds * 1000000L)
          .as("fresh"))
  }
}
