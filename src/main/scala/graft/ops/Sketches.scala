package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed cardinality sketches with DETERMINISTIC, engine-portable
  * results.
  *
  * `approx_count_distinct` (HLL++) answers the same question, but its
  * estimate depends on Spark's internal hash and merge order — two
  * engines (or two Spark versions) can disagree, which breaks the
  * dual-engine verification contract this library holds every operator
  * to. KMV (k-minimum-values, Bar-Yossef et al. 2002) with a portable
  * md5-derived hash gives an estimate that is a pure function of the
  * value set: same rows in, same estimate out, on any engine.
  */
object Sketches {

  /** Uniform 60-bit hash of a value — md5 hex prefix, the same
    * construction as [[Sampling.hashBucket]] (bit-identical in DuckDB via
    * `CAST('0x' || substr(md5(v), 1, 15) AS BIGINT)`).
    */
  def hash60(v: Column, salt: String = ""): Column =
    hash60Salted(v, lit(salt))

  /** [[hash60]] with a per-row Column salt (e.g. the CMS hash-row index):
    * the single home of the portable md5-conv construction.
    */
  def hash60Salted(v: Column, salt: Column): Column =
    conv(substring(md5(concat(salt.cast("string"), v.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** KMV distinct-count estimate per group: keep the `k` smallest
    * distinct hashes of `valueCol`; if a group has fewer than `k`
    * distinct values the count is EXACT, else the k-th smallest hash
    * h_(k) estimates the cardinality as `(k-1) · 2^60 / h_(k)` (the
    * k-th order statistic of uniform draws; relative error ~ 1/√(k-2)).
    *
    * Returns `(group..., n_kept, kth_hash, est_distinct)` where
    * `est_distinct` is rounded to 2 decimals.
    *
    * 100 TB shape: the distinct on (group, hash) aggregates with
    * map-side combine (the corpus-sized shuffle); the min-k selection
    * then runs in TWO window stages — first within (group, hash mod 64)
    * sub-buckets, which caps any single task's sort at the group's
    * distinct count / 64 and yields ≤ 64·k survivors per group, then the
    * final min-k over those survivors. A hot group (one key holding most
    * of the corpus) therefore never sorts its full distinct set on one
    * task — the classic window-skew trap the first stage exists to break.
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int = 64, salt: String = ""): DataFrame = {
    require(k >= 3, s"k must be >= 3 for a usable estimate, got $k")
    val g = groupCols.map(col)
    val hashed = df
      .select((g :+ hash60(col(valueCol), salt).as("_h")): _*)
      .distinct()
    val pre = Window.partitionBy((g :+ pmod(col("_h"), lit(64L))): _*)
      .orderBy(col("_h"))
    val fin = Window.partitionBy(g: _*).orderBy(col("_h"))
    val minK = hashed
      .withColumn("_rn0", row_number().over(pre)).filter(col("_rn0") <= k)
      .withColumn("_rn", row_number().over(fin)).filter(col("_rn") <= k)
    val m = math.pow(2.0, 60)
    minK.groupBy(g: _*)
      .agg(count(lit(1)).as("n_kept"), max(col("_h")).as("kth_hash"))
      .withColumn("est_distinct",
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble * m) / col("kth_hash")), 2))
  }

  /** Pairwise corpus-overlap cards: for every pair of groups (sources,
    * snapshots, shards) report the exact shingle-set overlap AND the KMV
    * bottom-k estimate of it, side by side.
    *
    * The estimate is the classic KMV set-operation trick (Beyer et al.
    * 2007): keep each group's k smallest distinct value hashes; for a
    * pair, the k smallest of the merged sets are a uniform sample of the
    * UNION, so the fraction of them present in both groups estimates
    * Jaccard. With the portable md5 [[hash60]] the estimate is a pure
    * function of the value sets — bit-replayable on any engine.
    *
    * 100 TB shape: the exact path self-joins the distinct (group, value)
    * table on value — one corpus-sized shuffle, only affordable at
    * validation scale; pass `withExact = false` in production and only
    * the sketch path runs. That path aggregates (group, hash) with
    * map-side combine, takes per-group min-k through the same two-stage
    * sub-bucketed windows as [[kmvDistinct]] (no hot-group task ever
    * sorts a full distinct set), and every pairwise stage after it works
    * on ≤ groups·k rows — for 1000 sources × k=256 that is 256k rows of
    * longs, a driver-free broadcast-grade relation, while the corpus is
    * touched exactly once.
    *
    * Output per pair (grp_a < grp_b): exact `n_a, n_b, inter, uni,
    * jaccard` (−1 sentinels when `withExact = false`) and `union_k,
    * matched_k, est_jaccard`.
    */
  def kmvOverlapCards(df: DataFrame, groupCol: String, valueCol: String,
                      k: Int = 128, withExact: Boolean = true): DataFrame = {
    require(k >= 3, s"k must be >= 3, got $k")
    val g = col(groupCol)
    val sh = df.select(g.as("_g"), col(valueCol).as("_v")).distinct()

    // per-group bottom-k distinct hashes (two-stage window, skew-capped)
    val hashed = sh.select(col("_g"), hash60(col("_v")).as("_h")).distinct()
    val pre = Window.partitionBy(col("_g"), pmod(col("_h"), lit(64L)))
      .orderBy(col("_h"))
    val fin = Window.partitionBy(col("_g")).orderBy(col("_h"))
    val mk = hashed
      .withColumn("_rn0", row_number().over(pre)).filter(col("_rn0") <= k)
      .withColumn("_rn", row_number().over(fin)).filter(col("_rn") <= k)
      .select("_g", "_h")

    val sizes = sh.groupBy(col("_g")).agg(count(lit(1)).as("_n"))
    // group-pair frame built from ONE single-row aggregate (a group list
    // is sketch-sized: even 10^5 groups is a few MB) — never a non-equi
    // self-join the planner would run as a nested-loop over row pairs
    val pairs = sizes
      .agg(sort_array(collect_list(struct(col("_g"), col("_n")))).as("_gs"))
      .select(explode(col("_gs")).as("_a"), col("_gs"))
      .select(col("_a"), explode(col("_gs")).as("_b"))
      .filter(col("_a._g") < col("_b._g"))
      .select(col("_a._g").as("grp_a"), col("_a._n").as("n_a"),
        col("_b._g").as("grp_b"), col("_b._n").as("n_b"))

    // expand each pair to its two members once -> equi-join with mk
    val members = pairs.select(col("grp_a"), col("grp_b"),
      explode(array(col("grp_a"), col("grp_b"))).as("_m"))
    val exp = mk.join(broadcast(members), col("_g") === col("_m"))
      .groupBy(col("grp_a"), col("grp_b"), col("_h"))
      .agg(max(when(col("_g") === col("grp_a"), 1L).otherwise(0L)).as("in_a"),
        max(when(col("_g") === col("grp_b"), 1L).otherwise(0L)).as("in_b"))
    val unionWin = Window.partitionBy(col("grp_a"), col("grp_b"))
      .orderBy(col("_h"))
    val est = exp
      .withColumn("_rn", row_number().over(unionWin)).filter(col("_rn") <= k)
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(count(lit(1)).as("union_k"),
        sum(col("in_a") * col("in_b")).as("matched_k"))
      .withColumn("est_jaccard",
        round(col("matched_k").cast("double") / col("union_k"), 4))

    val withEst = pairs.join(est, Seq("grp_a", "grp_b"), "left")
      .na.fill(0L, Seq("union_k", "matched_k"))
      .na.fill(0.0, Seq("est_jaccard"))
    val full =
      if (!withExact)
        withEst.withColumn("inter", lit(-1L)).withColumn("uni", lit(-1L))
          .withColumn("jaccard", lit(-1.0))
      else {
        val inter = sh.select(col("_g").as("_ga"), col("_v"))
          .join(sh.select(col("_g").as("_gb"), col("_v")),
            Seq("_v")).filter(col("_ga") < col("_gb"))
          .groupBy(col("_ga").as("grp_a"), col("_gb").as("grp_b"))
          .agg(count(lit(1)).as("inter"))
        withEst.join(inter, Seq("grp_a", "grp_b"), "left")
          .na.fill(0L, Seq("inter"))
          .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
          .withColumn("jaccard",
            round(col("inter").cast("double") / col("uni"), 4))
      }
    full.select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
      col("inter"), col("uni"), col("jaccard"),
      col("union_k"), col("matched_k"), col("est_jaccard"))
  }

  /** Row `j`'s counter bucket for value `v`: the portable [[hash60]]
    * construction salted with `j` (`md5(j || ':' || v)`), mod `width` —
    * `depth` pairwise-independent-enough hash rows from one md5.
    */
  private def cmsBucket(j: Column, v: Column, width: Int): Column =
    pmod(hash60Salted(v, concat(j.cast("string"), lit(":"))),
      lit(width.toLong))

  /** A count-min sketch handle: the `(j, bucket, cnt)` counter table
    * WITH the dimensions it was built under — [[cmsEstimate]] takes the
    * handle, so probing with mismatched depth/width (which would
    * silently invert the never-underestimate guarantee) cannot happen.
    */
  final case class CmsSketch(depth: Int, width: Int, table: DataFrame)

  /** Count-min sketch (Cormode & Muthukrishnan 2005): `depth`
    * independent md5-derived hash rows of `width` counters each, the
    * counter table at most depth·width rows. The same portable-hash
    * contract as [[kmvDistinct]]: the sketch is a pure function of the
    * value multiset, reproducible on any engine.
    *
    * 100 TB shape: the explode multiplies rows by `depth`, but map-side
    * combine collapses each task's output to ≤ depth·width rows before
    * the (tiny) shuffle — the full value column streams once and the
    * distinct key space is never exchanged (the same motivation as
    * [[heavyHitters]], for point-frequency queries instead of a top set).
    */
  def countMinSketch(df: DataFrame, valueCol: String,
                     depth: Int = 4, width: Int = 256): CmsSketch = {
    require(depth >= 1 && width >= 1, s"bad sketch dims: $depth x $width")
    val table = df.select(col(valueCol).cast("string").as("_v"))
      .filter(col("_v").isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("j"), col("_v"))
      .select(col("j"), cmsBucket(col("j"), col("_v"), width).as("bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))
    CmsSketch(depth, width, table)
  }

  /** Point-frequency estimates from a [[countMinSketch]]: for each
    * distinct key, `min` over the `depth` counters it hashes to — an
    * upper bound on the true count (collisions only inflate), within
    * `e·n/width` with probability `1 - exp(-depth)`. Keys absent from
    * the stream estimate 0 unless a collision says otherwise.
    *
    * The counter table is ≤ depth·width rows, so it broadcasts; the keys
    * side can be arbitrarily large and never shuffles.
    */
  def cmsEstimate(sketch: CmsSketch, keys: DataFrame, keyCol: String): DataFrame =
    keys.select(col(keyCol).cast("string").as("key")).distinct()
      .select(col("key"),
        explode(sequence(lit(0), lit(sketch.depth - 1))).as("j"))
      .withColumn("bucket", cmsBucket(col("j"), col("key"), sketch.width))
      .join(broadcast(sketch.table), Seq("j", "bucket"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** EXACT heavy hitters (frequency ≥ ceil(phi·n)) without shuffling the
    * full distinct key space: per-partition Misra-Gries summaries bound
    * the candidate set, then only candidates are recounted exactly.
    *
    * Why not `groupBy(value).count().filter(...)`? That shuffles one row
    * per DISTINCT value — at 100 TB of tokens that is billions of groups
    * exchanged to find the few thousand frequent ones. Here each task
    * keeps ≤ k counters (k = ⌈2/phi⌉), ships ≤ k candidate rows per
    * partition (a few MB total), and the exact recount streams the corpus
    * once more against the candidate set (AQE broadcasts it from its
    * runtime size) — no wide shuffle of the full key space ever.
    *
    * Correctness is not approximate: a partition's MG summary undercounts
    * any value by at most n_p/(k+1), so summed estimates undercount by at
    * most n/(k+1) < phi·n/2; every value with true count ≥ phi·n
    * therefore survives the candidate cut, and the final counts are exact
    * (Agarwal et al., "Mergeable Summaries", PODS 2012). Output:
    * `(valueCol, cnt)` for values with `cnt >= ceil(phi*n)`, exact and
    * deterministic — same rows in, same answer out, any partitioning.
    * The output value column is STRING regardless of the input type (the
    * sketch keys on the string form); callers needing the original type
    * join the result back against the source column.
    *
    * Three passes over the single value column: a `count()` (parquet
    * footer-cheap when the input is a bare scan; one narrow pass when it
    * is derived, e.g. exploded tokens), the sketch pass, the recount
    * pass.
    */
  /** [[heavyHitters]] per group — "the tokens above `phi` share of each
    * SOURCE/LANGUAGE", the per-slice variant every mixing report needs:
    * same exact two-pass discipline (per-partition Misra-Gries
    * candidates with a per-group summary budget, then an exact recount
    * of candidates only), with thresholds at GROUP grain. Per partition
    * the sketch holds ≤ `2/phi` entries per observed group — memory is
    * groups × k, never values — and the recount join touches only
    * candidate (group, value) pairs. Output
    * `(groupCol, valueCol, cnt, n_group)` with
    * `cnt >= ceil(phi · n_group)` exact.
    */
  def heavyHittersPerGroup(df: DataFrame, groupCol: String,
                           valueCol: String, phi: Double): DataFrame = {
    require(phi > 0 && phi < 0.5, s"phi out of (0, 0.5): $phi")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df.select(col(groupCol).cast("string").as("_g"),
        col(valueCol).cast("string").as("_v"))
      .filter(col("_g").isNotNull && col("_v").isNotNull)
    val sizes = pairs.groupBy("_g").agg(count(lit(1)).as("n_group"))
      .withColumn("_thr", ceil(lit(phi) * col("n_group")).cast("long"))
    val k = math.max(math.ceil(2.0 / phi).toInt, 2)
    val sketches = pairs.as[(String, String)].mapPartitions { it =>
      val perGroup = scala.collection.mutable
        .HashMap.empty[String, scala.collection.mutable.HashMap[String, Long]]
      it.foreach { case (g, v) =>
        val m = perGroup.getOrElseUpdate(g,
          scala.collection.mutable.HashMap.empty[String, Long])
        m.get(v) match {
          case Some(c) => m.update(v, c + 1)
          case None if m.size < k => m.update(v, 1L)
          case None =>
            val dead = scala.collection.mutable.ArrayBuffer.empty[String]
            m.foreach { case (key, c) =>
              if (c == 1L) dead += key else m.update(key, c - 1) }
            dead.foreach(m.remove)
        }
      }
      perGroup.iterator.flatMap { case (g, m) =>
        m.iterator.map { case (v, c) => (g, v, c) } }
    }.toDF("_g", "_v", "_est")
    val cands = sketches.groupBy("_g", "_v").agg(sum("_est").as("_est"))
      .join(sizes, "_g")
      // the MG undercount bound, per group (see heavyHitters); integer
      // floor-div like the global variant's n / (k + 1)
      .filter(col("_est") >= greatest(lit(1L),
        col("_thr") - (col("n_group") / lit((k + 1).toLong)).cast("long")
          - lit(1L)))
      .select("_g", "_v")
    pairs.join(cands, Seq("_g", "_v"))
      .groupBy("_g", "_v").agg(count(lit(1)).as("cnt"))
      .join(sizes, "_g")
      .filter(col("cnt") >= col("_thr"))
      .select(col("_g").as(groupCol), col("_v").as(valueCol),
        col("cnt"), col("n_group"))
  }

  def heavyHitters(df: DataFrame, valueCol: String, phi: Double): DataFrame = {
    require(phi > 0 && phi < 0.5, s"phi out of (0, 0.5): $phi")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(valueCol).cast("string").as("_v"))
      .filter(col("_v").isNotNull)
    val n = vals.count()
    val threshold = math.ceil(phi * n).toLong
    if (n == 0)
      return spark.emptyDataFrame
        .withColumn(valueCol, lit("").cast("string"))
        .withColumn("cnt", lit(0L)).limit(0)
    val k = math.max(math.ceil(2.0 / phi).toInt, 2)
    val sketches = vals.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { v =>
        m.get(v) match {
          case Some(c) => m.update(v, c + 1)
          case None if m.size < k => m.update(v, 1L)
          case None => // decrement-all; drop zeros (classic MG step)
            val dead = scala.collection.mutable.ArrayBuffer.empty[String]
            m.foreach { case (key, c) =>
              if (c == 1L) dead += key else m.update(key, c - 1) }
            dead.foreach(m.remove)
        }
      }
      m.iterator
    }.toDF("_v", "_est")
    // Summed MG estimates undercount true frequency by < n/(k+1); keep
    // every candidate whose estimate clears the threshold minus that
    // slack (the extra -1 absorbs the integer-division floor).
    val minEst = math.max(1L, threshold - n / (k + 1) - 1)
    val cands = sketches.groupBy("_v").agg(sum("_est").as("_est"))
      .filter(col("_est") >= minEst).select("_v")
    // No broadcast hint: candidates are usually tiny (≤ k rows/partition
    // pre-agg) and AQE broadcasts them from their runtime size; but a
    // pathological phi × partition-count can make them large, and then
    // the shuffle fallback must stay available.
    vals.join(cands, "_v")
      .groupBy("_v").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .select(col("_v").as(valueCol), col("cnt"))
  }
}
