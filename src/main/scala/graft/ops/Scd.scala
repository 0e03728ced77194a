package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension merge: fold a full snapshot of a
  * dimension into a history table that keeps one row per (key, version),
  * versions delimited by `valid_from`/`valid_to` (open rows have
  * `valid_to` NULL).
  *
  * The reference framework leaves dimension maintenance to per-job SQL
  * (incremental jobs in yaetos/etl_utils.py append by period); SCD2 is the
  * standard warehouse pattern its users hand-roll — offered here as one
  * deterministic operator.
  *
  * Merge semantics per snapshot key:
  *  - key absent from the dimension            → insert an open row
  *    (`valid_from = snapshotDate`)
  *  - open row exists, tracked columns equal   → unchanged (null-safe
  *    comparison)
  *  - open row exists, tracked columns differ  → close the open row
  *    (`valid_to = snapshotDate`) and insert a new open row
  * Keys absent from the snapshot keep their open row by default (a
  * partial snapshot is not a delete); with `closeMissing = true` absence
  * IS a delete — the open row closes at the snapshot date (full-snapshot
  * feeds where a dropped key means the entity is gone). Closed history
  * rows pass through untouched either way.
  *
  * Scale shape: history rows never shuffle (a filter pass-through); the
  * open-vs-snapshot reconciliation is ONE full-outer equi-join on the
  * key (a sort-merge shuffle — Spark cannot broadcast full-outer joins,
  * and both sides are far smaller than the full history) and the 0/1/2
  * output rows per joined key are built with a row-local `explode` — no
  * second pass, no window, no driver materialization.
  *
  * Requirements: snapshot must be unique per key (enforce upstream with
  * [[Checks.pkIsUnique]]); key columns must be non-null on both sides
  * (a null key reads as "absent" in the outer join); `dim` must contain
  * `keys ++ tracked ++ Seq(validFrom, validTo)`; snapshot must contain
  * `keys ++ tracked`.
  */
object Scd {

  def scd2Merge(dim: DataFrame, snapshot: DataFrame, keys: Seq[String],
                tracked: Seq[String], snapshotDate: String,
                validFrom: String = "valid_from",
                validTo: String = "valid_to",
                closeMissing: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "scd2Merge needs at least one key column")
    require(tracked.nonEmpty, "scd2Merge needs at least one tracked column")
    val outCols = keys ++ tracked ++ Seq(validFrom, validTo)

    val history = dim.filter(col(validTo).isNotNull).select(outCols.map(col): _*)
    val open = dim.filter(col(validTo).isNull)

    val cur = open.select((keys ++ tracked :+ validFrom).map(c => col(c).as(s"_c_$c")): _*)
    val snp = snapshot.select((keys ++ tracked).map(c => col(c).as(s"_s_$c")): _*)
    val joinCond = keys.map(k => cur(s"_c_$k") === snp(s"_s_$k")).reduce(_ && _)
    val j = cur.join(snp, joinCond, "full_outer")

    val curPresent = keys.map(k => col(s"_c_$k").isNotNull).reduce(_ || _)
    val snpPresent = keys.map(k => col(s"_s_$k").isNotNull).reduce(_ || _)
    val changed: Column =
      tracked.map(c => !(col(s"_c_$c") <=> col(s"_s_$c"))).reduce(_ || _)

    val vfType = dim.schema(validFrom).dataType
    val vtType = dim.schema(validTo).dataType
    def row(src: String, vf: Column, vt: Column): Column = struct(
      (keys ++ tracked).map(c => col(s"_${src}_$c").as(c)) ++
        Seq(vf.cast(vfType).as(validFrom), vt.cast(vtType).as(validTo)): _*)

    val keepOpen = row("c", col(s"_c_$validFrom"), lit(null))
    val closed = row("c", col(s"_c_$validFrom"), lit(snapshotDate))
    val fresh = row("s", lit(snapshotDate), lit(null))

    val emitted = j.select(explode(
      when(curPresent && !snpPresent,
          if (closeMissing) array(closed) else array(keepOpen))
        .when(curPresent && !changed, array(keepOpen))
        .when(curPresent && changed, array(closed, fresh))
        .otherwise(array(fresh))).as("_r"))
      .select("_r.*")

    emitted.unionByName(history)
  }

  /** Replay N dated snapshots into the dimension — real SCD2 maintenance
    * is rarely one merge: a backfill or catch-up applies a SEQUENCE of
    * dated full snapshots in order. A strict left fold of [[scd2Merge]],
    * one merge per date, with dates required ascending (ISO strings, so
    * lexicographic = chronological) — an out-of-order replay would close
    * rows with a `valid_to` before their `valid_from`. Lineage is
    * truncated per step (reliable `checkpoint()` when the session has a
    * checkpoint dir, `localCheckpoint` otherwise — the
    * [[Dedup.connectedComponents]] policy): without truncation the plan
    * nests one full-outer join per snapshot and optimizer time blows up
    * long before the data does.
    */
  def scd2FoldSnapshots(dim: DataFrame, snapshots: Seq[(String, DataFrame)],
                        keys: Seq[String], tracked: Seq[String],
                        validFrom: String = "valid_from",
                        validTo: String = "valid_to",
                        closeMissing: Boolean = false): DataFrame = {
    require(snapshots.nonEmpty, "scd2FoldSnapshots needs at least one snapshot")
    val dates = snapshots.map(_._1)
    require(dates == dates.sorted && dates.distinct.size == dates.size,
      s"snapshot dates must be strictly ascending, got: ${dates.mkString(", ")}")
    val sc = dim.sparkSession.sparkContext
    // delete each superseded reliable checkpoint once its successor is
    // materialized (graft.core.Checkpoints) — a 300-snapshot backfill
    // must not leave 300 full dimension copies in the checkpoint dir
    var prevCp: Option[org.apache.hadoop.fs.Path] = None
    snapshots.foldLeft(dim) { case (acc, (date, snap)) =>
      val next = graft.core.Checkpoints.truncate(
        scd2Merge(acc, snap, keys, tracked, date, validFrom, validTo,
          closeMissing))
      graft.core.Checkpoints.delete(sc, prevCp)
      prevCp = graft.core.Checkpoints.pathOf(next)
      next
    }
  }

  /** SCD TYPE-1 upsert — last-write-wins merge with no history kept
    * (the other half of the reference's dimension-maintenance
    * territory; [[scd2Merge]] is the history-keeping half): the latest
    * change row per key (largest `orderCols`, lexicographic) replaces
    * the dimension row; keys only in the dimension pass through; keys
    * only in the changes insert.
    *
    * `orderCols` must totally order each key's change set (append a
    * unique sequence/ingest id) — with ties, "latest" would be shuffle
    * luck, so determinism is the caller's contract here exactly as in
    * [[graft.ops.Layout.stableIds]].
    *
    * Scale shape: one keyed window over the CHANGES (the small side),
    * one left-anti join against the dimension — the dimension is never
    * windowed or re-sorted, and AQE broadcasts the change keys when
    * they fit.
    */
  def scd1Upsert(dim: DataFrame, changes: DataFrame, keys: Seq[String],
                 orderCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "scd1Upsert needs at least one key column")
    require(orderCols.nonEmpty,
      "scd1Upsert needs at least one ordering column (latest-wins needs an order)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    val latest = changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
      .drop(orderCols.filterNot(dim.columns.contains): _*)
    dim.join(latest.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(latest)
  }
}
