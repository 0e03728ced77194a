package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-stream analytics: gap-based sessionization, ordered-step
  * funnels, and cohort retention. The reference ships these as ad-hoc SQL
  * jobs over event tables (reference `jobs/examples/ex2` wordcount/window
  * shapes, `jobs/generic/sql_job` usage); here they are first-class
  * operators with one deliberate plan shape each.
  *
  * Scale design (the part that matters at 100 TB of events):
  *   - Every operator shuffles ONCE, on the user key. All window functions
  *     share the same `partitionBy(user) orderBy(ts, id)` spec, and the
  *     follow-up `groupBy(user, ...)` is clustering-compatible with
  *     `HashPartitioning(user)` (a subset of the group keys), so Catalyst
  *     inserts no second Exchange before the session/funnel aggregate.
  *   - Window state is bounded per user: `lag` keeps one row, running
  *     `min`/`sum` keep one value. No whole-partition buffering, no
  *     driver-side collection.
  *   - Time arithmetic is exact integer microseconds (`unix_micros`), never
  *     float seconds: a 30-day span is ~2.6e12 us, far inside the 53-bit
  *     double mantissa only AFTER the subtraction — subtracting raw epoch
  *     doubles first would lose sub-second precision.
  *   - Skew: a runaway key (bot user) serializes its own partition only.
  *     Cap upstream with [[Skew]] salting or a per-user event limit if one
  *     key dominates; sessionization itself cannot be salted without
  *     splitting sessions.
  */
object Events {

  /** Gap-based sessionization: a new session starts when the user's
    * inter-event gap exceeds `gapSeconds` (strictly greater, so a gap of
    * exactly `gapSeconds` stays in-session). Rows are ordered by
    * `(tsCol, idCol)` — the id tie-break makes equal-timestamp runs
    * deterministic. Gap decisions are MICROSECOND-exact, unlike
    * [[Sessions.sessionize]] whose whole-second truncation is pinned by
    * the streaming replay contract (q47/q61); this is the session-grain
    * analytics twin, that is the event-grain labeller.
    *
    * Returns one row per session: `(user, session_id, n_events,
    * session_start, duration_us, duration_s, sum_value)` where
    * `session_id` is the 1-based session index within the user,
    * `duration_us` is the EXACT `(last - first)` microsecond span (the
    * column downstream rollups should aggregate — summing exact integers
    * is order-free, where averaging the rounded `duration_s` doubles
    * drifts at rounding boundaries), `duration_s` is the same span in
    * seconds rounded to 3 decimals, and `sum_value` sums `valueCol`
    * rounded to 2.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 idCol: String, valueCol: String,
                 gapSeconds: Long = 1800L): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val gapUs = gapSeconds * 1000000L
    events
      .withColumn("_us", us)
      .withColumn("_prev_us", lag(col("_us"), 1).over(w))
      .withColumn("_brk",
        when(col("_prev_us").isNull || col("_us") - col("_prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("_brk")).over(run))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        (max(col("_us")) - min(col("_us"))).as("duration_us"),
        round((max(col("_us")) - min(col("_us"))) / lit(1000000.0), 3)
          .as("duration_s"),
        round(sum(col(valueCol)), 2).as("sum_value"))
  }

  /** Ordered-step funnel: for each user, the earliest completion of
    * `steps` in order, where "order" is the canonical `(ts, id)` event
    * order (a later step must come at-or-after the previous step's
    * earliest occurrence in that order). Returns one row per step:
    * `(step_idx, step, n_users)` — the count of users whose events reach
    * that step in sequence.
    *
    * Implementation: chained running minima. `t1` is the running earliest
    * step-1 time; an event qualifies for step k iff its type matches and
    * the running `t(k-1)` is already set. Each chained min is a window
    * over the SAME partition+ordering, so all of them evaluate in one
    * Window stage run — one shuffle total, then a tiny per-user aggregate
    * and a 3-row driver-side unpivot.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             idCol: String, typeCol: String, steps: Seq[String]): DataFrame =
    funnelImpl(events, userCol, tsCol, idCol, typeCol, steps, None)

  /** [[funnel]] with a CONVERSION WINDOW: step i counts only when it
    * happens within `withinSeconds` of the (first-touch) completion of
    * step i-1 — the product-analytics semantics where a purchase nine
    * months after the click is not a conversion. First-touch: each
    * step's time is the EARLIEST qualifying event given the earliest
    * completion of the prefix; a user who misses the window from the
    * first prefix completion is not re-tried from later ones (the
    * standard, deterministic reading — and what keeps it one Window
    * stage instead of a per-retry self-join).
    */
  def funnelWithin(events: DataFrame, userCol: String, tsCol: String,
                   idCol: String, typeCol: String, steps: Seq[String],
                   withinSeconds: Long): DataFrame = {
    require(withinSeconds > 0, s"withinSeconds must be > 0: $withinSeconds")
    funnelImpl(events, userCol, tsCol, idCol, typeCol, steps,
      Some(withinSeconds * 1000000L))
  }

  private def funnelImpl(events: DataFrame, userCol: String, tsCol: String,
                         idCol: String, typeCol: String, steps: Seq[String],
                         withinUs: Option[Long]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros(col(tsCol).cast("timestamp"))
    var df = events.withColumn("_us", us)
    steps.zipWithIndex.foreach { case (step, i) =>
      val qualifies =
        if (i == 0) col(typeCol) === step
        else {
          val base = col(typeCol) === step && col(s"_t${i - 1}").isNotNull
          withinUs match {
            case Some(b) =>
              base && col("_us") <= col(s"_t${i - 1}") + lit(b)
            case None => base
          }
        }
      df = df.withColumn(s"_t$i",
        min(when(qualifies, col("_us"))).over(run))
    }
    val userMins = steps.indices.map(i => min(col(s"_t$i")).as(s"_t$i"))
    val perUser = df.groupBy(userCol).agg(userMins.head, userMins.tail: _*)
    val counts = steps.indices.map(i =>
      sum(when(col(s"_t$i").isNotNull, 1L).otherwise(0L)).as(s"_n$i"))
    val totals = perUser.agg(counts.head, counts.tail: _*)
    val stackExpr = steps.zipWithIndex
      .map { case (step, i) => s"${i + 1}, '$step', _n$i" }
      .mkString(s"stack(${steps.size}, ", ", ", ") AS (step_idx, step, n_users)")
    totals.selectExpr(stackExpr)
  }

  /** Rolling active users (DAU/WAU/MAU generalized to `windows`): for
    * each observed day, the count of distinct users active in the
    * trailing 1 / 7 / 30 days. Output `(day, au_1d, au_7d, au_30d, ...)`
    * with `day` a `yyyy-MM-dd` string, one `au_{w}d` column per window.
    *
    * Plan: events first collapse to DISTINCT (day, user) pairs — the
    * only full-volume shuffle, and at 100 TB that table is users × days,
    * orders of magnitude smaller than events. Each pair then explodes to
    * the `max(windows)` target days it contributes to (a bounded ×30 map
    * step on the SMALL table, never on raw events), and one aggregate
    * computes every window via conditional distinct counts. No
    * self-join, no per-window pass.
    */
  def activeUsers(events: DataFrame, userCol: String, tsCol: String,
                  windows: Seq[Int] = Seq(1, 7, 30)): DataFrame = {
    require(windows.nonEmpty && windows.forall(_ >= 1),
      s"windows must be >= 1, got $windows")
    val maxW = windows.max
    val pairs = events
      .select(to_date(col(tsCol)).as("_day"), col(userCol).as("_u"))
      .distinct()
    val days = pairs.select(col("_day")).distinct()
    val ex = pairs
      .withColumn("_i", explode(sequence(lit(0), lit(maxW - 1))))
      .select(date_add(col("_day"), col("_i")).as("_tday"),
        col("_u"), col("_i"))
    val aggs = windows.map(w =>
      count_distinct(when(col("_i") < w, col("_u"))).as(s"au_${w}d"))
    val perDay = ex.groupBy("_tday").agg(aggs.head, aggs.tail: _*)
    perDay.join(days, perDay("_tday") === days("_day"))
      .select(date_format(col("_day"), "yyyy-MM-dd").as("day") +:
        windows.map(w => col(s"au_${w}d")): _*)
  }

  /** Cohort retention: users are cohorted by their first active day;
    * `n_users` counts distinct users of each cohort active `offset_days`
    * after it. Output `(cohort, offset_days, n_users)` with `cohort` as a
    * `yyyy-MM-dd` STRING (never DATE — engines disagree on date rendering).
    *
    * The first-day lookup is a whole-partition window `min`, not a
    * self-join: one shuffle on user, then the (cohort, offset) aggregate —
    * which must reshuffle, since its key is unrelated to user. At 100 TB
    * the first stage's map-side is a plain scan; the second aggregates
    * partial counts per (cohort, offset, user) before the exchange.
    */
  /** [[activeUsers]] through KMV sketches — the 100 TB path: exact
    * rolling `count_distinct` re-touches every (day, user) pair per
    * window, and at billions of users/day the per-target-day distinct
    * becomes the dominant shuffle. Here each day collapses to its
    * bottom-`k` distinct user-hashes ONCE (the only corpus-sized
    * aggregation, map-side combined); everything after — the ×window
    * explode, the union-merge, the k-th-order-statistic estimate — runs
    * on days×k rows of longs. KMV merges exactly (bottom-k of a union =
    * bottom-k of pooled bottom-k's), windows below `k` distinct users
    * are EXACT, and the md5 hash makes the estimate a pure function of
    * the user set — engine-replayable, like every sketch in
    * [[graft.ops.Sketches]].
    *
    * Output: `(day, au_{w}d_est ...)`, estimates rounded to 2.
    */
  def activeUsersSketch(events: DataFrame, userCol: String, tsCol: String,
                        windows: Seq[Int] = Seq(1, 7, 30),
                        k: Int = 256): DataFrame = {
    require(windows.nonEmpty && windows.forall(_ >= 1),
      s"windows must be >= 1, got $windows")
    require(k >= 3, s"k must be >= 3, got $k")
    val maxW = windows.max
    val m = math.pow(2.0, 60)
    val pairs = events
      .select(to_date(col(tsCol)).as("_day"),
        graft.ops.Sketches.hash60(col(userCol)).as("_h"))
      .distinct()
    val days = pairs.select(col("_day")).distinct()
    // per-day bottom-k (two-stage, skew-capped like Sketches.kmvDistinct)
    // — THE compression step: everything below runs on days×k longs.
    // Bottom-k of a union = bottom-k of the pooled per-day bottom-k's,
    // and a pooled count below k proves no constituent day truncated,
    // so sub-k windows stay exact.
    val pre = Window.partitionBy(col("_day"), pmod(col("_h"), lit(64L)))
      .orderBy(col("_h"))
    val fin = Window.partitionBy(col("_day")).orderBy(col("_h"))
    val daily = pairs
      .withColumn("_rn0", row_number().over(pre)).filter(col("_rn0") <= k)
      .withColumn("_rn", row_number().over(fin)).filter(col("_rn") <= k)
      .select("_day", "_h")
    // per (target day, hash): the smallest lag it arrives with
    val dh = daily
      .withColumn("_i", explode(sequence(lit(0), lit(maxW - 1))))
      .select(date_add(col("_day"), col("_i")).as("_tday"), col("_h"),
        col("_i"))
      .groupBy("_tday", "_h").agg(min(col("_i")).as("_mi"))
    val perWindow = windows.map { w =>
      val win = Window.partitionBy(col("_tday")).orderBy(col("_h"))
      val ranked = dh.filter(col("_mi") < w)
        .withColumn("_rn", row_number().over(win))
        .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("_tday"))))
      ranked.groupBy("_tday")
        .agg(max(col("_n")).as("_n"),
          max(when(col("_rn") === k, col("_h"))).as("_hk"))
        .select(col("_tday"),
          round(when(col("_n") < k, col("_n").cast("double"))
            .otherwise(lit((k - 1).toDouble * m) / col("_hk")), 2)
            .as(s"au_${w}d_est"))
    }
    val joined = perWindow.reduce((a, b) => a.join(b, Seq("_tday")))
    joined.join(days, joined("_tday") === days("_day"))
      .select(date_format(col("_day"), "yyyy-MM-dd").as("day") +:
        windows.map(w => col(s"au_${w}d_est")): _*)
  }

  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val w = Window.partitionBy(userCol)
    val day = to_date(col(tsCol))
    events
      .withColumn("_day", day)
      .withColumn("_first_day", min(col("_day")).over(w))
      .select(
        date_format(col("_first_day"), "yyyy-MM-dd").as("cohort"),
        datediff(col("_day"), col("_first_day")).cast("int").as("offset_days"),
        col(userCol))
      .groupBy("cohort", "offset_days")
      .agg(count_distinct(col(userCol)).as("n_users"))
  }

  /** Item co-visitation similarity — "users who touched X also touched
    * Y", the classic collaborative-filtering neighbor table: distinct
    * (user, item) pairs self-join on the user, pair counts normalize by
    * cosine (`c_ab / sqrt(c_a · c_b)`), and each item keeps its top-k
    * neighbors.
    *
    * Scale shape: the corpus collapses ONCE to distinct (user, item);
    * `maxItemsPerUser` caps the quadratic per-user pair blowup (the
    * [[graft.ops.Dedup]] `maxBandFreq` convention — a power user's
    * 10^4 items would otherwise mint 10^8 pairs; the cap keeps each
    * USER's lowest-id items, deterministically, and is plan-pushed as
    * a WindowGroupLimit). Item totals broadcast back; per-item rank is
    * a WindowGroupLimit top-k.
    *
    * Output: `(item, neighbor, n_co, sim_micro, rank)`, `rank <= k` by
    * `(sim_micro DESC, neighbor)` per item.
    */
  def coVisitation(events: DataFrame, userCol: String, itemCol: String,
                   minPairCount: Long = 2L, k: Int = 10,
                   maxItemsPerUser: Int = 1000): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(maxItemsPerUser >= 2, s"maxItemsPerUser must be >= 2")
    val w = Window.partitionBy("_u").orderBy("_i")
    val pairs0 = events
      .select(col(userCol).as("_u"), col(itemCol).as("_i"))
      .distinct()
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= maxItemsPerUser)
      .drop("_rn")
    val itemN = pairs0.groupBy(col("_i")).agg(count(lit(1)).as("_cn"))
    val co = pairs0.as("x")
      .join(pairs0.select(col("_u"), col("_i").as("_j")), Seq("_u"))
      .filter(col("_i") < col("_j"))
      .groupBy("_i", "_j").agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= minPairCount)
    val sym = co.select(col("_i").as("item"), col("_j").as("neighbor"), col("n_co"))
      .unionByName(co.select(col("_j").as("item"), col("_i").as("neighbor"),
        col("n_co")))
    val ranked = sym
      .join(broadcast(itemN.select(col("_i").as("item"), col("_cn").as("_ca"))),
        "item")
      .join(broadcast(itemN.select(col("_i").as("neighbor"),
        col("_cn").as("_cb"))), "neighbor")
      .withColumn("sim_micro",
        round(round(col("n_co").cast("double") /
          sqrt(col("_ca").cast("double") * col("_cb")), 6) * lit(1e6), 0)
          .cast("long"))
    val rw = Window.partitionBy("item")
      .orderBy(col("sim_micro").desc, col("neighbor"))
    ranked.withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select(col("item"), col("neighbor"), col("n_co"), col("sim_micro"),
        col("rank"))
  }

  /** Cohort cumulative-value curves — [[cohortRetention]]'s revenue
    * twin: per signup cohort (first-seen day) and day offset, the
    * per-user cumulative average of `valueCol` ("how much is a January
    * user worth by day 14" — the LTV curve). Value sums quantize to
    * exact 4-decimal scaled integers at the event grain, so the
    * cumulative sums are order-free; the per-user division happens once
    * per output row.
    *
    * Scale shape: one user-window pass tags each event with its
    * cohort (shared with [[cohortRetention]]'s shape), one contraction
    * to (cohort, offset) grain, and the cumulative window runs at that
    * tiny grain partitioned BY cohort.
    *
    * Output: `(cohort, offset_days, n_users, value_sum, cum_value_sum,
    * cum_value_per_user_micro)` — `n_users` is the cohort's total
    * size and the per-user curve is integer micro-dollars (one
    * division, one rounding).
    */
  def cohortValue(events: DataFrame, userCol: String, tsCol: String,
                  valueCol: String): DataFrame = {
    val w = Window.partitionBy(userCol)
    val day = to_date(col(tsCol))
    val tagged = events
      .withColumn("_day", day)
      .withColumn("_first_day", min(col("_day")).over(w))
      .withColumn("_u",
        (col(valueCol).cast("decimal(18,4)") * lit(10000)).cast("long"))
    val cohortSize = tagged
      .select(col("_first_day"), col(userCol)).distinct()
      .groupBy("_first_day").agg(count(lit(1)).as("n_users"))
    val grid = tagged
      .groupBy(col("_first_day"),
        datediff(col("_day"), col("_first_day")).cast("int").as("offset_days"))
      .agg(sum("_u").as("_su"))
    val cum = Window.partitionBy("_first_day").orderBy("offset_days")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("_cu", sum("_su").over(cum))
      .join(broadcast(cohortSize), "_first_day")
      .select(date_format(col("_first_day"), "yyyy-MM-dd").as("cohort"),
        col("offset_days"), col("n_users"),
        round(col("_su").cast("double") / lit(1e4), 2).as("value_sum"),
        round(col("_cu").cast("double") / lit(1e4), 2).as("cum_value_sum"),
        // micro units through ONE rounding of an exactly-representable
        // rational (cu*100 is an exact integer in double range): a
        // rounded-dollars output would double-round through .005
        // boundaries where engines disagree
        round(col("_cu").cast("double") * lit(100) / col("n_users"), 0)
          .cast("long").as("cum_value_per_user_micro"))
  }

  /** RFM segmentation — recency / frequency / monetary quintile labels
    * per user (the classic CRM cut): recency in whole days behind the
    * explicit `asOf` instant (a parameter, never the wall clock —
    * [[graft.ops.Checks.freshness]]'s convention), frequency the event
    * count, monetary the exact scaled value sum. Each metric cuts at
    * its own exact interpolated quintile edges (the
    * [[graft.ops.Stats.equiDepthBins]] rule: rounded edges, ties go
    * LOW — so scores are engine-replayable), scored 1..5 with 5 best
    * (most recent / most frequent / highest value).
    *
    * One contraction to user grain, three single-row percentile
    * aggregates broadcast back, row-local scoring. With `exact = true`
    * (default) the edges come from Spark's exact `percentile` — one
    * buffer holding the full per-user value multiset, fine to ~10^8
    * users, a scale-killer past that; `exact = false` switches to
    * `approx_percentile` (GK sketch, mergeable, bounded memory,
    * ±`1/accuracy` rank error at the 4 cut points — the q126
    * convention) and the segment labels stop being engine-replayable.
    *
    * Output: `(userCol, recency_days, frequency, monetary, r_score,
    * f_score, m_score, segment)` where `segment` is the "RFM" digit
    * string.
    */
  def rfm(events: DataFrame, userCol: String, tsCol: String,
          valueCol: String, asOf: String,
          exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    val perUser = events
      .groupBy(col(userCol))
      .agg(
        // CAST first: unix_micros rejects TIMESTAMP_NTZ, which is what a
        // raw micros events parquet reads as without Tables.load — value-
        // preserving under the pinned UTC session (see project notes).
        expr(s"(unix_micros(to_timestamp('$asOf')) - " +
          s"max(unix_micros(CAST($tsCol AS TIMESTAMP))))" +
          " div 86400000000").as("recency_days"),
        count(lit(1)).as("frequency"),
        sum((col(valueCol).cast("decimal(18,4)") * lit(10000)).cast("long"))
          .as("_m_u"))
      .withColumn("monetary", round(col("_m_u").cast("double") / lit(1e4), 2))
    val pct =
      if (exact) (c: String) => s"percentile($c, array(0.2, 0.4, 0.6, 0.8))"
      else (c: String) =>
        s"approx_percentile($c, array(0.2, 0.4, 0.6, 0.8), $accuracy)"
    def edges(c: String) =
      perUser.agg(expr(
        s"transform(${pct(c)}, x -> round(x, 4))")
        .as(s"_e_$c"))
    def score(c: String, reversed: Boolean): Column = {
      // quintile index via the strict-greater edge count (ties go low)
      val idx = size(filter(col(s"_e_$c"), e => col(c) > e)) + 1
      if (reversed) lit(6) - idx else idx
    }
    perUser
      .crossJoin(broadcast(edges("recency_days")))
      .crossJoin(broadcast(edges("frequency")))
      .crossJoin(broadcast(edges("monetary")))
      .withColumn("r_score", score("recency_days", reversed = true))
      .withColumn("f_score", score("frequency", reversed = false))
      .withColumn("m_score", score("monetary", reversed = false))
      .select(col(userCol), col("recency_days"), col("frequency"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")).as("segment"))
  }

  /** Multi-touch attribution: credit each conversion's preceding
    * touchpoints under the three standard models — first-touch,
    * last-touch, linear — in one pass (the ad-hoc marketing SQL the
    * reference leaves to per-job `query()` strings,
    * `yaetos/etl_utils.py:466-471`).
    *
    * Semantics (all deterministic on the total `(ts, id)` event order):
    *  - A touch (row whose type is in `touchTypes`) attributes to the
    *    EARLIEST conversion (type == `conversionType`) at-or-after it in
    *    `(ts, id)` order for the same user, provided the conversion is
    *    within `lookbackSeconds` (inclusive, microsecond-exact).
    *  - Each conversion distributes exactly 1,000,000 micro-credits per
    *    model: all to its first touch (first_touch), all to its last
    *    (last_touch), or `1e6 div n` to each with the remainder on the
    *    first (linear) — so `sum(credit_micro) == 1e6 * conversions
    *    credited` is an exact conservation law per model.
    *  - Conversions with no in-window touches earn no rows; touches with
    *    no following conversion are dropped.
    *
    * Output: `(model, channel, touches, credit_micro)` — one row per
    * model × touch event-type, `ORDER BY model, channel` left to the
    * caller. `credit_micro` sums are order-free BIGINT arithmetic, so
    * the result is engine-replayable bit-for-bit.
    *
    * Scale shape: ONE corpus shuffle, total (plan-audited). Every
    * first-stage window expression shares the `(user, ts DESC, id DESC)`
    * sort on one user-hash Exchange (see the inline running-max trick),
    * and the per-conversion `(user, conv_rn)` windows REUSE that same
    * partitioning — user-hash satisfies the clustered-distribution
    * requirement of any key list it prefixes — so they cost a re-sort of
    * the surviving touch subset, never a second exchange. The final
    * aggregate is a handful of channel rows with a row-local `stack`
    * unpivot.
    */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String,
                  conversionType: String = "purchase",
                  touchTypes: Seq[String] = Seq("view", "click"),
                  typeCol: String = "event_type",
                  lookbackSeconds: Long = 7200L): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(conversionType),
      s"conversion type $conversionType cannot also be a touch type")
    // One ordering for every expression in the first Window stage: in
    // (ts, id)-DESC traversal, a running MAX of descending row numbers
    // identifies the EARLIEST at-or-after conversion (earlier time =
    // larger desc row number), and a running MIN of conversion
    // timestamps is that same conversion's ts — so _rn, _conv_rn and
    // _conv_us all share one (user, ts DESC, id DESC) sort and Catalyst
    // plans them in a single Window node on a single Exchange.
    val desc0 = Window.partitionBy(userCol).orderBy(col(tsCol).desc, col(idCol).desc)
    val desc = desc0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isConv = col(typeCol) === conversionType
    val touches = events
      .filter(col(typeCol).isin((conversionType +: touchTypes).map(x => x: Any): _*))
      .withColumn("_rn", row_number().over(desc0))
      .withColumn("_conv_rn", max(when(isConv, col("_rn"))).over(desc))
      .withColumn("_conv_us", min(when(isConv, unix_micros(col(tsCol).cast("timestamp")))).over(desc))
      .filter(!isConv && col("_conv_rn").isNotNull &&
        col("_conv_us") - unix_micros(col(tsCol).cast("timestamp")) <= lookbackSeconds * 1000000L)

    val grp = Window.partitionBy(userCol, "_conv_rn")
    val grpAsc = grp.orderBy(col(tsCol), col(idCol))
    val credited = touches
      .withColumn("_n", count(lit(1)).over(grp))
      .withColumn("_tn", row_number().over(grpAsc))
      .select(col(typeCol).as("channel"),
        when(col("_tn") === 1, lit(1000000L)).otherwise(lit(0L)).as("_first_m"),
        when(col("_tn") === col("_n"), lit(1000000L)).otherwise(lit(0L)).as("_last_m"),
        (expr("1000000L div _n") +
          when(col("_tn") === 1, lit(1000000L) % col("_n"))
            .otherwise(lit(0L))).as("_lin_m"))

    credited.groupBy("channel")
      .agg(count(lit(1)).as("touches"),
        sum("_first_m").as("_f"), sum("_last_m").as("_l"), sum("_lin_m").as("_n"))
      .select(expr(
        "stack(3, 'first_touch', _f, 'last_touch', _l, 'linear', _n) AS (model, credit_micro)"),
        col("channel"), col("touches"))
      .select(col("model"), col("channel"), col("touches"), col("credit_micro"))
  }

  /** Peak concurrency per day over a set of CLOSED intervals
    * `[start, end]` — "how many sessions were live at once" (capacity
    * planning's first question), computed as a DISTRIBUTED sweep line:
    *
    *  - interval edges become `(+1 at start_us, -1 at end_us + 1)`
    *    delta events, pre-summed per microsecond (map-side combined) so
    *    tie ORDER can never matter;
    *  - the running level needs a global prefix sum — the naive form is
    *    the one-task `Window.orderBy` this library bans. Instead the
    *    prefix splits: per-day running sums (hash-partitioned by day)
    *    plus a per-day carry-in offset, itself a prefix over the
    *    DAY-GRAIN net table — the one deliberately unpartitioned window
    *    here, over rows = distinct days, which no corpus size can grow
    *    past ~thousands;
    *  - a day's peak is `greatest(carry_in, max(carry_in + run))` —
    *    the carry-in term covers the midnight level when a day only
    *    ever ends sessions.
    *
    * Days with no interval EDGES are absent (a fully-spanned quiet day
    * reports through its neighbors' carry). Output:
    * `(day, carry_in, peak_concurrent)`.
    */
  def peakConcurrency(intervals: DataFrame, startCol: String,
                      endCol: String): DataFrame = {
    val deltas = intervals
      .select(explode(array(
        struct(unix_micros(col(startCol).cast("timestamp")).as("_us"), lit(1L).as("_d")),
        struct((unix_micros(col(endCol).cast("timestamp")) + 1L).as("_us"), lit(-1L).as("_d"))
      )).as("_e"))
      .select(col("_e._us").as("_us"), col("_e._d").as("_d"))
      .groupBy("_us").agg(sum("_d").as("_d"))
      .withColumn("_day",
        date_format(timestamp_micros(col("_us")), "yyyy-MM-dd"))
    val dayNet = deltas.groupBy("_day").agg(sum("_d").as("_net"))
    val wDays = Window.orderBy("_day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = dayNet
      .withColumn("carry_in", coalesce(sum("_net").over(wDays), lit(0L)))
      .select("_day", "carry_in")
    val wIn = Window.partitionBy("_day").orderBy("_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("_run", sum("_d").over(wIn))
      .join(broadcast(offsets), "_day")
      .groupBy("_day", "carry_in")
      .agg(greatest(col("carry_in"),
        max(col("_run") + col("carry_in"))).as("peak_concurrent"))
      .select(col("_day").as("day"), col("carry_in"),
        col("peak_concurrent"))
  }

  /** Conversion-latency distribution per funnel step: for users who
    * complete step k (in order — the [[funnel]] chained-minima
    * semantics), how long from their FIRST step-1 event to their first
    * ordered step-k completion. The "how fast do users convert" half
    * of the funnel card.
    *
    * One Window stage computes every chained minimum (all expressions
    * share the `(user, ts, id)` spec), one per-user contraction, then a
    * tiny long-form per-step aggregate (an explode of literal structs —
    * pure Column API, so step names are data, never SQL text, and any
    * charset is safe). Latencies are exact microsecond integers;
    * `mean_s` is an order-free integer-sum mean and p50/p90 are exact
    * interpolated percentiles over integer microseconds, all rounded to
    * 4-decimal seconds. With `exact = false` the p50/p90 switch to
    * `approx_percentile` (GK sketch, mergeable, bounded memory — the
    * q126 convention) for corpora whose per-step user counts outgrow a
    * single exact-percentile buffer (~10^8).
    *
    * Output: `(step_idx, step, n_users, mean_s, p50_s, p90_s)` for
    * steps 2..n.
    */
  def funnelLatency(events: DataFrame, userCol: String, tsCol: String,
                    idCol: String, typeCol: String,
                    steps: Seq[String],
                    exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(steps.size >= 2, "funnelLatency needs at least two steps")
    require(steps.distinct.size == steps.size, "duplicate funnel steps")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros(col(tsCol).cast("timestamp"))
    var df = events.withColumn("_us", us)
    steps.zipWithIndex.foreach { case (step, i) =>
      val cond =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step && col(s"_m${i - 1}").isNotNull
      df = df.withColumn(s"_m$i", min(when(cond, col("_us"))).over(w))
    }
    val perUser = df.groupBy(col(userCol))
      .agg(min(col("_m0")).as("_t0"),
        steps.indices.tail.map(i => min(col(s"_m$i")).as(s"_t$i")): _*)
    val rows = steps.indices.tail.map(i => struct(
      lit((i + 1).toLong).as("step_idx"),
      lit(steps(i)).as("step"),
      (col(s"_t$i") - col("_t0")).as("_lat")))
    def pct(p: String) =
      if (exact) expr(s"percentile(_lat, $p)")
      else expr(s"approx_percentile(_lat, $p, $accuracy)").cast("double")
    perUser
      .select(explode(array(rows: _*)).as("_s"))
      .select(col("_s.step_idx").as("step_idx"), col("_s.step").as("step"),
        col("_s._lat").as("_lat"))
      .filter(col("_lat").isNotNull)
      .groupBy("step_idx", "step")
      .agg(count(lit(1)).as("n_users"),
        round(sum("_lat").cast("double") / count(lit(1)) / lit(1e6), 4)
          .as("mean_s"),
        round(pct("0.5") / lit(1e6), 4).as("p50_s"),
        round(pct("0.9") / lit(1e6), 4).as("p90_s"))
  }

  /** Top-k most-travelled session paths: events sessionize (gap rule,
    * [[sessionize]] semantics), each session renders its ordered
    * event-type sequence as a `>`-joined string, and the paths rank by
    * frequency — the "what do users actually do" flow summary.
    *
    * One shuffle on the user for session labels (window), one
    * contraction to session grain (`array_sort` of (us, id, type)
    * structs keeps the in-session order deterministic), one path
    * count, TakeOrdered top-k.
    *
    * Output: `(path, n)`, top `k` by `(n DESC, path)`.
    */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
               idCol: String, typeCol: String,
               gapSeconds: Long = 1800L, k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros(col(tsCol).cast("timestamp"))
    events
      .withColumn("_us", us)
      .withColumn("_gap", col("_us") - lag(col("_us"), 1).over(w))
      .withColumn("_brk",
        when(col("_gap").isNull || col("_gap") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("_sess", sum("_brk").over(run))
      .groupBy(col(userCol), col("_sess"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("_us"), col(idCol).as("_id"),
          col(typeCol).as("_t")))),
        x => x.getField("_t")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** Rolling N-day retention: of the users active `lagDays` ago, what
    * fraction came back today (the classic growth metric — cohort
    * retention answers "how does a signup class decay", this answers
    * "is stickiness moving day over day").
    *
    * Scale shape: events collapse ONCE to distinct (day, user) — the
    * only corpus-sized shuffle, shared with [[activeUsers]]'s
    * contraction — then the retained count is a self-equi-join of that
    * pair table on `(user, day - lagDays)` and everything aggregates at
    * day grain. `rate_micro = retained / base` where `base` is the
    * lagged day's active count; days whose lagged day has no activity
    * report a null rate.
    *
    * Output: `(day, n_active, n_base, n_retained, rate_micro)`.
    */
  def rollingRetention(events: DataFrame, userCol: String, tsCol: String,
                       lagDays: Int = 7): DataFrame = {
    require(lagDays >= 1, s"lagDays must be >= 1: $lagDays")
    val pairs = events
      .select(to_date(col(tsCol)).as("_day"), col(userCol).as("_u"))
      .distinct()
    val active = pairs.groupBy("_day").agg(count(lit(1)).as("n_active"))
    val retained = pairs.as("t")
      .join(pairs.select(col("_day").as("_pday"), col("_u")), Seq("_u"))
      .filter(col("_pday") === date_sub(col("_day"), lagDays))
      .groupBy("_day").agg(count(lit(1)).as("n_retained"))
    val base = active.select(date_add(col("_day"), lagDays).as("_day"),
      col("n_active").as("n_base"))
    active
      .join(base, Seq("_day"), "left")
      .join(retained, Seq("_day"), "left")
      .select(date_format(col("_day"), "yyyy-MM-dd").as("day"),
        col("n_active"), col("n_base"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        round(round(coalesce(col("n_retained"), lit(0L)).cast("double") /
          col("n_base"), 6) * lit(1e6), 0).cast("long").as("rate_micro"))
  }

  /** Activity histogram — the power-user curve: how many users were
    * active exactly `n` distinct days. One contraction to (user,
    * n_days) then a bounded-key aggregate; the engagement-depth
    * distribution behind DAU/MAU ratios.
    */
  def activityHistogram(events: DataFrame, userCol: String,
                        tsCol: String): DataFrame =
    events
      .select(col(userCol).as("_u"), to_date(col(tsCol)).as("_day"))
      .distinct()
      .groupBy("_u").agg(count(lit(1)).as("n_days"))
      .groupBy("n_days").agg(count(lit(1)).as("n_users"))

  /** First-order Markov transition matrix of the event stream: for each
    * ordered pair of event types, how often does a user's next event
    * follow, and with what conditional probability. The behavioral-flow
    * summary (what follows an error? what precedes a purchase?) that
    * pairs with [[sessionize]] and [[funnel]].
    *
    * `p_micro` is `n / Σ_to n` in micro-units — per-FROM-type
    * conditional probability, one final IEEE division per output row on
    * order-free BIGINT counts, so the matrix is engine-replayable.
    * A user's last event has no successor and contributes no pair.
    *
    * Scale shape: ONE corpus shuffle on the user for the `lead` window;
    * the pair aggregation is map-side combined onto a key space of
    * |types|² rows, and the row-total attach is a window over that tiny
    * aggregate — nothing downstream scales with the event count.
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .withColumn("_next", lead(col(typeCol), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy("from_type")
    pairs
      .withColumn("_tot", sum("n").over(tot))
      .withColumn("p_micro",
        round(round(col("n").cast("double") / col("_tot"), 6) * lit(1e6), 0)
          .cast("long"))
      .select(col("from_type"), col("to_type"), col("n"), col("p_micro"))
  }
}
