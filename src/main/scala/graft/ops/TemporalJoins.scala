package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal join operators Spark lacks as built-ins, composed from
  * primitives so Catalyst plans them with ONE key-partitioned shuffle —
  * never a cartesian or per-row range probe.
  */
object TemporalJoins {

  /** As-of join: for every left row, attach the latest right row of the
    * same key with rightTs <= leftTs (inclusive), left-outer semantics.
    *
    * Plan shape: union both sides tagged, one window over (key, ts) with
    * `last(_, ignoreNulls)` carrying the most recent right payload
    * forward, keep left rows. A single hash-partition on the key — the
    * sort-within-partition replaces the O(n·m) range probe, so the same
    * plan runs on a 1000-executor cluster unchanged. (DuckDB's native
    * ASOF JOIN is the verification oracle.)
    *
    * Right rows sharing (key, ts) must be unique for deterministic output
    * — pre-aggregate the right side if they are not.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightVals: Seq[String], prefix: String = "asof_"): DataFrame =
    asofJoinMulti(left, right, Seq(key), leftTs, rightTs, rightVals, prefix)

  /** [[asofJoin]] on a COMPOSITE key (e.g. (tenant, entity)): identical
    * plan, the window just partitions on all key columns. Null handling
    * is per-row: a right row with ANY null key column is dropped (SQL
    * join semantics), and left rows keep left-outer nulls.
    */
  def asofJoinMulti(left: DataFrame, right: DataFrame, keys: Seq[String],
                    leftTs: String, rightTs: String,
                    rightVals: Seq[String],
                    prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val leftCols = left.columns.toSeq
    // improbable working names + explicit collision checks: a silent
    // overwrite of a user column would corrupt output
    val (cTs, cSide, cRv, cLast) =
      ("__graft_asof_ts", "__graft_asof_side", "__graft_asof_rv", "__graft_asof_last")
    val reserved = Seq(cTs, cSide, cRv, cLast) ++ rightVals.map(prefix + _)
    val clash = reserved.intersect(leftCols)
    require(clash.isEmpty, s"asofJoin output/working columns collide with " +
      s"left columns: ${clash.mkString(", ")} (choose a different prefix)")
    val l = left
      .withColumn(cTs, col(leftTs))
      .withColumn(cSide, lit(1))
      .withColumn(cRv, lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightVals.map(v => org.apache.spark.sql.types.StructField(v,
            right.schema(v).dataType)))))
    // NULL keys never match in SQL join / ASOF semantics: drop them from
    // the right so the NULL-key window partition carries no payload and
    // NULL-key left rows keep a NULL result (left-outer behavior)
    val r = right.filter(keys.map(col(_).isNotNull).reduce(_ && _)).select(
        (keys.map(col) ++ Seq(col(rightTs).as(cTs), lit(0).as(cSide),
          struct(rightVals.map(col): _*).as(cRv))): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right (side 0) sorts before left (side 1) at equal ts → inclusive <=
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(cTs), col(cSide))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn(cLast,
      last(col(cRv), ignoreNulls = true).over(w))
    carried.filter(col(cSide) === 1)
      .select(leftCols.map(col) ++
        rightVals.map(v => col(s"$cLast.$v").as(s"$prefix$v")): _*)
  }

  /** Point-in-time join of facts onto an SCD2 dimension ([[Scd.scd2Merge]]
    * history): each fact row picks up the dimension version whose
    * `[validFrom, validTo)` interval contains the fact timestamp — the
    * "what did we believe about this key WHEN the event happened" join
    * every feature-store backfill needs (training-serving skew prevention:
    * a plain join to the CURRENT version leaks the future into features).
    *
    * Versions of one key partition its timeline, so this is [[asofJoin]]
    * on `validFrom` (latest version at-or-before the fact — ONE shuffle,
    * no interval explosion) plus a residual validity check: a version
    * closed BEFORE the fact (a gap from `closeMissing`) yields nulls,
    * exactly like a fact before the key's first version.
    *
    * Timestamps and validity bounds must share an ordering — ISO date
    * strings (the [[Scd]] convention, lexicographic = chronological) or
    * both real timestamps. Open versions carry null `validTo`.
    */
  def pointInTimeJoin(fact: DataFrame, dim: DataFrame, key: String,
                      factTs: String, dimVals: Seq[String],
                      validFrom: String = "valid_from",
                      validTo: String = "valid_to",
                      prefix: String = "pit_"): DataFrame =
    pointInTimeJoinMulti(fact, dim, Seq(key), factTs, dimVals,
      validFrom, validTo, prefix)

  /** [[pointInTimeJoin]] on a composite dimension key. */
  def pointInTimeJoinMulti(fact: DataFrame, dim: DataFrame,
                           keys: Seq[String], factTs: String,
                           dimVals: Seq[String],
                           validFrom: String = "valid_from",
                           validTo: String = "valid_to",
                           prefix: String = "pit_"): DataFrame = {
    require(dimVals.nonEmpty, "pointInTimeJoin needs at least one dim column")
    val joined = asofJoinMulti(fact, dim, keys, factTs, validFrom,
      dimVals :+ validTo, prefix)
    val vt = col(s"$prefix$validTo")
    val valid = vt.isNull || col(factTs) < vt
    dimVals.foldLeft(joined)((d, v) =>
        d.withColumn(s"$prefix$v",
          when(valid, col(s"$prefix$v"))
            .otherwise(lit(null).cast(dim.schema(v).dataType))))
      .drop(s"$prefix$validTo")
  }

  /** Interval/range join: left rows matched to right intervals containing
    * them (`left.ts` in `[right.start, right.end]`, same optional key).
    *
    * Plan shape: each interval explodes into the fixed-width time buckets
    * it covers; the join is an equi-join on the bucket (plus key) with the
    * exact range predicate as a residual filter. Shuffle volume scales
    * with rows + interval-bucket coverage, never |left|×|right|. Choose
    * `bucketSeconds` near the typical interval length so intervals cover
    * O(1) buckets.
    */
  def rangeJoin(left: DataFrame, leftTs: String,
                right: DataFrame, rightStart: String, rightEnd: String,
                bucketSeconds: Long, key: Option[String] = None): DataFrame = {
    val cBucket = "__graft_range_bucket"
    val clash = (left.columns ++ right.columns).filter(_ == cBucket)
    require(clash.isEmpty, s"rangeJoin working column $cBucket collides with input")
    val lb = left.withColumn(cBucket,
      floor(unix_timestamp(col(leftTs)) / bucketSeconds))
    // An inverted interval (end < start) would make sequence() step
    // BACKWARD — one corrupt row explodes into millions of descending
    // buckets that the residual filter then silently discards. Fail on
    // the row instead. NULL bounds keep their pre-existing drop semantics
    // (explode of a null array emits nothing — the residual filter could
    // never match them anyway).
    val startB = floor(unix_timestamp(col(rightStart)) / bucketSeconds)
    val endB = floor(unix_timestamp(col(rightEnd)) / bucketSeconds)
    val rb = right.withColumn(cBucket, explode(
      when(startB.isNull || endB.isNull, lit(null).cast("array<bigint>"))
        .when(endB >= startB, sequence(startB, endB))
        .otherwise(raise_error(
          concat(lit("rangeJoin: inverted interval, start "),
            col(rightStart).cast("string"), lit(" > end "),
            col(rightEnd).cast("string"))))))
    val joinCols = cBucket +: key.toSeq
    lb.join(rb, joinCols)
      .filter(col(leftTs) >= col(rightStart) && col(leftTs) <= col(rightEnd))
      .drop(cBucket)
  }
}
