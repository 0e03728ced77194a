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
  * Keys absent from the snapshot keep their open row (a partial snapshot
  * is not a delete — close-on-missing is a policy knob callers can apply
  * by pre-joining). Closed history rows pass through untouched.
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
                validTo: String = "valid_to"): DataFrame = {
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
      when(curPresent && (!snpPresent || !changed), array(keepOpen))
        .when(curPresent && snpPresent && changed, array(closed, fresh))
        .otherwise(array(fresh))).as("_r"))
      .select("_r.*")

    emitted.unionByName(history)
  }
}
