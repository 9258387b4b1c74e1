package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-bucketed analytics over an event-stream table (ts: timestamp,
  * value: double — the driver testdata `events` shape). */
object Events {

  /** The calendar-interval ladder (smallest first) with each rung's
    * epoch-second width and its Monday-alignment offset: epoch second 0
    * is Thursday 1970-01-01 00:00 UTC, so week indexes shift by +3 days
    * before the floor division to increment at Mondays (the same
    * boundary as Spark's and DuckDB's `date_trunc('week', …)`). */
  private val LadderSecs: Seq[(String, Long, Long)] = Seq(
    ("minute", 60L, 0L),
    ("hour", 3600L, 0L),
    ("day", 86400L, 0L),
    ("week", 604800L, 3L * 86400L))

  /** Auto date histogram (the Elasticsearch `auto_date_histogram`
    * aggregation): bucket events by the SMALLEST calendar interval from
    * the minute→hour→day→week ladder whose bucket count over the data's
    * time SPAN fits `targetBuckets` — ES's own posture (interval chosen
    * from the rounded span, so the result never exceeds the target even
    * when some buckets are empty). Returns one row per non-empty bucket
    * with the chosen interval echoed in an `interval` column.
    *
    * Plan, built for scale: interval selection is ONE narrow min/max
    * aggregation (two Longs to the driver — no distinct-count, no
    * Expand), then the ladder arithmetic is integer epoch-second floor
    * division driver-side; the histogram itself is one partial+final
    * hash aggregation keyed by the truncated bucket (≤ targetBuckets
    * rows out). Timestamps are UTC (the session pins
    * spark.sql.session.timeZone=UTC), so every rung is a fixed
    * epoch-second width and the bucket rule is exact integer
    * arithmetic — bit-identical across engines and parallelism. */
  def autoDateHistogram(events: DataFrame, targetBuckets: Int): DataFrame = {
    require(targetBuckets >= 1,
      s"auto_date_histogram target must be >= 1, got $targetBuckets")
    val mm = events
      .agg(min(unix_timestamp(col("ts"))).as("lo"),
        max(unix_timestamp(col("ts"))).as("hi"))
      .head()
    if (mm.isNullAt(0)) {
      // empty input: degenerate single-rung answer, schema preserved
      return events.sparkSession.emptyDataFrame
        .withColumn("bucket", lit(null).cast("string"))
        .withColumn("interval", lit(null).cast("string"))
        .withColumn("cnt", lit(null).cast("long"))
        .withColumn("sum_value", lit(null).cast("double"))
        .limit(0)
    }
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    def spanBuckets(width: Long, shift: Long): Long =
      Math.floorDiv(hi + shift, width) - Math.floorDiv(lo + shift, width) + 1
    val unit = LadderSecs
      .collectFirst { case (u, w, s) if spanBuckets(w, s) <= targetBuckets => u }
      .getOrElse("week")
    events
      .groupBy(date_format(date_trunc(unit, col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("bucket"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_value"))
      .withColumn("interval", lit(unit))
      .select(col("bucket"), col("interval"), col("cnt"), col("sum_value"))
      .orderBy("bucket")
  }

  /** Daily-count anomaly flags (the ES `moving_fn` stddev-band alert /
    * classic 2σ control-chart rule, exact-integer form): per day, flag
    * the count anomalous iff |x − μ| > 2σ over the TRAILING window of
    * the previous `window` days (self-excluded — the tested value never
    * contaminates its own baseline). The σ comparison never touches a
    * float: with S1 = Σx, S2 = Σx² and n window days, |x−μ| > 2σ ⇔
    * (n·x − S1)² > 4·(n·S2 − S1²) — exact Long cross-multiplication
    * (safe for daily counts up to ~3·10⁹; beyond that switch the sums
    * to DECIMAL). Days with fewer than 2 trailing observations report
    * false (no baseline, pinned).
    *
    * Plan: ONE day-keyed partial+final hash agg reduces the corpus to
    * ≤ span-days rows; the trailing window, integer flag rule, and
    * ordering all run on that reduced table (the X87 regime). */
  /** Date-range aggregation (X167 — the ES `date_range` agg): named,
    * possibly half-open [from, to) ranges over epoch-DAY boundaries;
    * per range the event count and the exact-cents value sum. Unlike a
    * histogram the ranges may overlap or leave gaps — each is an
    * independent predicate — and empty ranges report 0 (a
    * deterministic row set beats ES's omit-empty default for a
    * correctness contract). One narrow pass: every range is a CASE
    * column over the same scan, aggregated partial+final; no per-range
    * jobs, no shuffle keyed by range.
    *
    * `ranges` = (key, fromDay inclusive or None, toDay exclusive or
    * None) in epoch days. Value sums are exact micro-cents Longs
    * (floor(value·100+0.5) per event) divided once at the end — the
    * order-independent money convention used across the events ops. */
  def dateRangeAgg(events: DataFrame,
                   ranges: Seq[(String, Option[Long], Option[Long])]): DataFrame = {
    require(ranges.nonEmpty, "date_range needs at least one range")
    require(ranges.map(_._1).distinct.size == ranges.size,
      "range keys must be unique")
    val day = floor(unix_timestamp(col("ts")) / lit(86400L)).cast("long")
    val cents = floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
    val aggs = ranges.flatMap { case (key, fromD, toD) =>
      val in = (fromD, toD) match {
        case (Some(a), Some(b)) => day >= a && day < b
        case (Some(a), None) => day >= a
        case (None, Some(b)) => day < b
        case (None, None) => lit(true)
      }
      Seq(
        sum(when(in, 1L).otherwise(0L)).as(s"cnt_$key"),
        sum(when(in, cents).otherwise(0L)).as(s"cents_$key"))
    }
    val one = events.agg(aggs.head, aggs.tail: _*).collect().head
    // sum() over zero input rows is SQL NULL — coalesce so an empty
    // events table still reports the full deterministic 0-row set
    def lng(i: Int): Long = if (one.isNullAt(i)) 0L else one.getLong(i)
    val spark = events.sparkSession
    import spark.implicits._
    ranges.zipWithIndex.map { case ((key, fromD, toD), i) =>
      (key, fromD.getOrElse(-1L), toD.getOrElse(-1L),
        lng(2 * i), lng(2 * i + 1) / 100.0)
    }.toDF("range_key", "from_day", "to_day", "cnt", "val_sum")
      .orderBy("range_key")
  }

  /** Rate aggregation (X168 — the ES `rate` agg inside a
    * `date_histogram`, unit = day): per (calendar month, event_type),
    * the event count and its per-day rate = count / days-in-month.
    * Exact: the day count comes from the calendar (Spark and DuckDB
    * agree on `last_day`), the division is one IEEE op from two exact
    * integers, rounded half-up at 6 dp. One hash aggregation keyed by
    * (month, type). */
  def rateAgg(events: DataFrame): DataFrame = {
    val month = date_format(col("ts"), "yyyy-MM")
    val daysInMonth = dayofmonth(last_day(col("ts"))).cast("long")
    events
      .groupBy(month.as("month"), col("event_type"),
        daysInMonth.as("days_in_month"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("month"), col("event_type"), col("cnt"),
        (floor(col("cnt").cast("double") / col("days_in_month").cast("double")
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("per_day"))
      .orderBy("month", "event_type")
  }

  /** Change-point detection, exact step form (X169 — the deterministic
    * core of the ES `change_point` agg's step/spike case): over the
    * daily count series, the day with the LARGEST absolute day-over-day
    * jump |cnt − prev_cnt|, earliest day on ties. The full ES agg layers
    * ML heuristics on top; this is the reproducible argmax every
    * implementation agrees on. The daily table is span-sized (≤ days),
    * so the unpartitioned lag window is the gap-fill regime, not a
    * corpus-scale sort. */
  def changePoint(events: DataFrame): DataFrame = {
    val day = floor(unix_timestamp(col("ts")) / lit(86400L)).cast("long")
    val daily = events.groupBy(day.as("d")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("d"))
    daily
      .withColumn("prev_cnt", lag(col("cnt"), 1).over(w))
      .filter(col("prev_cnt").isNotNull)
      .withColumn("jump", abs(col("cnt") - col("prev_cnt")))
      .orderBy(col("jump").desc, col("d").asc)
      .limit(1)
      .select(
        date_format(timestamp_seconds(col("d") * 86400L), "yyyy-MM-dd").as("day"),
        col("cnt"), col("prev_cnt"), col("jump"))
  }

  def dailyAnomaly(events: DataFrame, window: Int): DataFrame = {
    require(window >= 2, s"anomaly window must be >= 2 days, got $window")
    val day = floor(unix_timestamp(col("ts")) / lit(86400L)).cast("long")
    val daily = events.groupBy(day.as("d"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(-window.toLong, -1L)
    daily
      .withColumn("n", count(col("cnt")).over(w))
      .withColumn("s1", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("s2", coalesce(sum(col("cnt") * col("cnt")).over(w), lit(0L)))
      .withColumn("anomalous",
        col("n") >= 2 &&
          (col("n") * col("cnt") - col("s1")) * (col("n") * col("cnt") - col("s1"))
            > lit(4L) * (col("n") * col("s2") - col("s1") * col("s1")))
      .select(
        date_format(timestamp_seconds(col("d") * 86400L), "yyyy-MM-dd").as("day"),
        col("cnt"), col("n").as("n_base"), col("anomalous"))
      .orderBy("day")
  }

  /** Absence detection (the negation dual of the X115 funnel — the
    * CEP "A not followed by B" pattern behind churn/abandonment
    * analytics, cf. Flink CEP `notFollowedBy` / MATCH_RECOGNIZE
    * negation): every `aType` event with NO `bType` event of the same
    * user in [t, t + window] — inclusive on BOTH ends, pinned: a
    * same-microsecond B cancels (value-based RANGE frames see every
    * equal-timestamp row regardless of sort position, which is exactly
    * what makes this rule total-order-free and engine-portable).
    *
    * Plan: pushdown type filter to the two event types, then ONE
    * user-keyed shuffle serves a value-RANGE window counting B events
    * in the forward interval — no self-join, no per-A probe; exact
    * microsecond Long arithmetic. A hot user serializes only its own
    * window. */
  def absence(events: DataFrame, aType: String, bType: String,
              windowSecs: Long): DataFrame = {
    require(windowSecs >= 1, s"absence window must be >= 1s, got $windowSecs")
    require(aType != bType, "A and B must be distinct event types")
    val us = unix_micros(col("ts").cast("timestamp"))
    val ab = events.filter(col("event_type").isin(aType, bType))
      .select(col("event_id"), col("user_id"), col("event_type"), us.as("us"))
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(0L, windowSecs * 1000000L)
    ab.withColumn("nb",
        sum(when(col("event_type") === bType, 1L).otherwise(0L)).over(w))
      .filter(col("event_type") === aType && col("nb") === 0L)
      .select(col("event_id"), col("user_id"), col("us").as("ts_us"))
      .orderBy("event_id")
  }

  /** Gap-filled daily date histogram (ES `date_histogram` with
    * `min_doc_count: 0` + `extended_bounds`): one row for EVERY day in
    * [min(dataLo, boundLo), max(dataHi, boundHi)] — empty days report
    * cnt 0 / sum 0.0 (ES's empty-bucket sum), and explicit bounds only
    * WIDEN the span (the ES extended_bounds rule: they never shrink the
    * data's own range). The zero-fill is what makes the histogram safe
    * to difference/derive over (X87's pipeline aggs assume a dense
    * bucket axis).
    *
    * Plan: ONE day-keyed partial+final hash agg (≤ span-days rows out)
    * + ONE narrow min/max agg (two Longs to the driver); the zero-fill
    * spine is `spark.range` over the reduced day span left-joined to
    * the reduced agg — no corpus-scale work beyond the two aggs. Day
    * arithmetic is exact integer UTC epoch-day floor division, so the
    * bucket rule is bit-identical across engines and parallelism. */
  def gapFilledDaily(events: DataFrame, boundLoDay: Option[Long] = None,
                     boundHiDay: Option[Long] = None): DataFrame = {
    val spark = events.sparkSession
    boundLoDay.zip(boundHiDay).foreach { case (lo, hi) =>
      require(lo <= hi, s"extended bounds must have lo <= hi, got $lo > $hi")
    }
    val day = floor(unix_timestamp(col("ts")) / lit(86400L)).cast("long")
    val agg = events.groupBy(day.as("d"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_value"))
    val mm = events
      .agg(min(floor(unix_timestamp(col("ts")) / lit(86400L)).cast("long")),
        max(floor(unix_timestamp(col("ts")) / lit(86400L)).cast("long")))
      .head()
    val dataSpan =
      if (mm.isNullAt(0)) None else Some((mm.getLong(0), mm.getLong(1)))
    val span = (dataSpan, boundLoDay, boundHiDay) match {
      case (Some((dl, dh)), bl, bh) =>
        Some((math.min(dl, bl.getOrElse(dl)), math.max(dh, bh.getOrElse(dh))))
      case (None, Some(bl), Some(bh)) => Some((bl, bh))
      case _ => None // empty input and no complete bounds: empty result
    }
    val spine = span match {
      case Some((lo, hi)) => spark.range(lo, hi + 1).toDF("d")
      case None => spark.range(0).toDF("d")
    }
    spine.join(agg, Seq("d"), "left")
      .na.fill(0L, Seq("cnt")).na.fill(0.0, Seq("sum_value"))
      .select(
        date_format(timestamp_seconds(col("d") * 86400L), "yyyy-MM-dd").as("day"),
        col("cnt"), col("sum_value"))
      .orderBy("day")
  }

  /** Serial differencing over the gap-filled daily count series (X183
    * — ES `derivative` (lag 1) and `serial_diff` (seasonal lag)
    * pipeline aggregations in one pass): per day, the count, the
    * day-over-day derivative, and the lag-`seasonLag` seasonal
    * difference. The series rides the dense [[gapFilledDaily]] spine
    * (missing days count 0), so lags are CALENDAR lags, not row lags —
    * the distinction ES's gap_policy machinery exists to paper over.
    * The first 1 (resp. seasonLag) spine days report NULL, pinned —
    * the ES skip-gap convention of emitting nothing until the lag
    * window fills.
    *
    * Plan: one day-keyed partial+final hash agg reduces the corpus to
    * span-sized rows; the spine join and both lag windows run on that
    * reduced table (the X87/X169 regime — the unpartitioned window is
    * span-sized by construction, never corpus-sized). */
  def serialDiff(events: DataFrame, seasonLag: Int = 7): DataFrame = {
    require(seasonLag >= 1, s"seasonal lag must be >= 1, got $seasonLag")
    val w = Window.orderBy(col("day"))
    gapFilledDaily(events)
      .select(col("day"), col("cnt"),
        (col("cnt") - lag(col("cnt"), 1).over(w)).as("deriv"),
        (col("cnt") - lag(col("cnt"), seasonLag).over(w)).as("sdiff"))
      .orderBy("day")
  }

  /** Sessionization (inactivity-gap session windows — the Spark
    * `session_window` / Flink session-gap / GA-style sessions shape,
    * batch form): events of one user belong to one session while
    * consecutive gaps stay ≤ `gapSecs`; a strictly-greater gap starts a
    * new session. Returns per-session rollups with 1-based per-user
    * session ids.
    *
    * Plan: ONE shuffle (user-keyed) serves both the lag/flag window and
    * the session rollup — session ids are the running sum of
    * new-session flags inside the same keyed sort, then the groupBy
    * reuses the partitioning. Determinism: the window order is total
    * ((ts, event_id)) and the gap test is exact microsecond Long
    * arithmetic; sums round at 4 dp like every events rollup. Skew: a
    * hot user serializes its own window only. */
  def sessionize(events: DataFrame, gapSecs: Long): DataFrame = {
    require(gapSecs >= 1, s"session gap must be >= 1s, got $gapSecs")
    val ts = col("ts").cast("timestamp")
    val w = Window.partitionBy("user_id").orderBy(ts.asc, col("event_id").asc)
    val prevTs = lag(ts, 1).over(w)
    val isNew = when(prevTs.isNull ||
      unix_micros(ts) - unix_micros(prevTs) > gapSecs * 1000000L, 1L)
      .otherwise(0L)
    events
      .withColumn("session_id",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(unix_micros(ts)) - min(unix_micros(ts))).as("duration_us"),
        round(sum("value"), 4).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  /** Cohort retention (the classic retention triangle: users cohorted by
    * FIRST-activity day, then for each later day-offset the share of the
    * cohort active again): one row per (cohort_day, day_offset ≥ 1) with
    * the returning-user count and the floor-rounded retention pct.
    *
    * Plan: the X110 first-seen decomposition again — a user-keyed
    * min-agg pins each user's cohort day, joined back by user (users
    * need not fit in a broadcast). Corpus-scale exchanges: the
    * (user, day) distinct, the user-keyed min agg, and the user-keyed
    * join — all on the same user-led keys, so sort-merge reuses the
    * layout; the (cohort, offset) agg and the sizes join run on
    * reduced tables. Exact integer day arithmetic (UTC epoch-day floor
    * division); pct = one floor(x·1e6+0.5)/1e6 tree per reduced row. */
  def retention(events: DataFrame, maxOffset: Int): DataFrame = {
    require(maxOffset >= 1, s"retention offset must be >= 1, got $maxOffset")
    val day = floor(unix_timestamp(col("ts").cast("timestamp")) / lit(86400L))
      .cast("long")
    val act = events.select(col("user_id"), day.as("day")).distinct()
    val first = act.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    val sizes = first.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_users"))
    val ret = act.join(first, Seq("user_id"))
      .withColumn("day_offset", col("day") - col("cohort"))
      .filter(col("day_offset") >= 1 && col("day_offset") <= maxOffset)
      .groupBy(col("cohort"), col("day_offset"))
      .agg(count(lit(1)).as("returning"))
    ret.join(sizes, Seq("cohort"))
      .select(
        date_format(timestamp_seconds(col("cohort") * lit(86400L)),
          "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("cohort_users"), col("returning"),
        (floor(col("returning") * lit(100.0) / col("cohort_users") * lit(1e6)
          + lit(0.5)) / lit(1e6)).as("pct"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Ordered funnel analysis (the Amplitude/GA-style conversion funnel:
    * step events in order, each within `windowSecs` of the PREVIOUS
    * step): per funnel step, how many users reach it and the
    * conversion percentage relative to step 1.
    *
    * Matching rule PINNED (the X105/X109 minimized-chain posture): a
    * user reaches step k iff some step-1 occurrence's GREEDY chain —
    * earliest qualifying event per subsequent step, strictly later and
    * ≤ window after the previous step — extends to k; the user's
    * furthest step is the max over starts. (First-match-per-step from
    * every start is the funnel-product semantics; an all-chains
    * existential would differ and has no exact SQL form.)
    *
    * Plan: filter to step events (pushdown), ONE user-keyed shuffle,
    * per-user sorted step arrays walked by binary search inside
    * mapGroups (a user's funnel events fit memory — the sessionization
    * assumption), then the per-furthest counts reduce to ≤|steps| rows
    * driver-side. Determinism: exact microsecond Longs; the one float
    * per row (pct) is a fixed floor(x·1e6+0.5)/1e6 tree. */
  def funnel(events: DataFrame, steps: Seq[String],
             windowSecs: Long): DataFrame = {
    require(steps.length >= 2, "funnel needs at least two steps")
    require(steps.distinct.length == steps.length, "funnel steps must differ")
    require(windowSecs >= 1, s"funnel window must be >= 1s, got $windowSecs")
    val sess = events.sparkSession
    import sess.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val wUs = windowSecs * 1000000L
    val nSteps = steps.length
    val perUser: Array[(Int, Long)] = events
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id").cast("long"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroups { (_, it) =>
        val lists = Array.fill(nSteps)(scala.collection.mutable.ArrayBuilder
          .make[Long])
        it.foreach { case (_, t, us) => lists(stepIdx(t)) += us }
        val sorted = lists.map { b => val a = b.result(); java.util.Arrays.sort(a); a }
        var best = if (sorted(0).isEmpty) 0 else 1
        var s = 0
        while (best < nSteps && s < sorted(0).length) {
          var prev = sorted(0)(s)
          var k = 1
          var ok = true
          while (ok && k < nSteps) {
            val arr = sorted(k)
            // earliest element strictly after prev and within the window
            var i = java.util.Arrays.binarySearch(arr, prev + 1)
            if (i < 0) i = -i - 1
            if (i < arr.length && arr(i) <= prev + wUs) { prev = arr(i); k += 1 }
            else ok = false
          }
          if (k > best) best = k
          s += 1
        }
        best
      }
      .filter(_ > 0)
      .groupByKey(identity).count().collect()
    val byFurthest = perUser.toMap
    val n1 = byFurthest.values.sum
    val rows = (1 to nSteps).map { step =>
      val n = (step to nSteps).map(f => byFurthest.getOrElse(f, 0L)).sum
      val pct =
        if (n1 == 0L) 0.0
        else math.floor(n * 100.0 / n1 * 1e6 + 0.5) / 1e6
      (step.toLong, steps(step - 1), n, pct)
    }
    sess.createDataFrame(rows)
      .toDF("step", "event_type", "n_users", "pct_of_first")
  }

  /** Cumulative cardinality (the Elasticsearch `cumulative_cardinality`
    * pipeline aggregation over a daily date histogram of distinct
    * users — "total users to date", the canonical new-vs-returning
    * funnel metric): per event day, the distinct users THAT day
    * (`daily_users`), the users whose FIRST event falls on it
    * (`new_users` — ES's cumulative delta), and the cumulative distinct
    * users to date (`cum_users`).
    *
    * Plan, built for scale — EXACT without any per-day set union or
    * sketch: cumulative distinct to day D ≡ #{users whose first event
    * day ≤ D}, so the corpus-scale work is two hash aggregations (the
    * user-keyed min-day agg and the day-keyed distinct-count agg) and
    * everything after runs on the REDUCED day table (≤ #days rows —
    * the X87 pipeline-agg regime, where the unpartitioned running-sum
    * window is bucket-table-sized by construction). ES itself cannot do
    * this exactly (HLL sketches under the hood); the first-seen
    * decomposition is the classic exact equivalent. */
  def cumulativeCardinality(events: DataFrame): DataFrame = {
    val day = date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
    val daily = events.groupBy(day.as("day"))
      .agg(countDistinct(col("user_id")).as("daily_users"))
    val firstSeen = events.groupBy(col("user_id")).agg(min(day).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    // first-seen days ⊆ event days, so the left join is lossless; a day
    // whose users all returned gets new_users = 0
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(firstSeen, Seq("day"), "left")
      .na.fill(0L, Seq("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .select(col("day"), col("daily_users"), col("new_users"),
        col("cum_users"))
      .orderBy("day")
  }

  /** Band (interval-range) join: ALL same-user (A, B) event pairs with
    * B's timestamp in [A.ts − windowSecs, A.ts] — the all-pairs sibling
    * of [[AsOf.asOfPrior]] (which keeps only the latest B), and the
    * batch twin of the watermarked stream-stream interval join
    * ([[graft.streaming.StreamJoin.intervalJoin]] asserts bit-equality
    * against this on the same frame).
    *
    * Plan, built for scale — the BUCKETED band join: a bare
    * `a.user = b.user AND range` equi-join keys only on user, so one
    * power user's A×B cross product lands in one task (the classic
    * range-join skew). Instead both sides key on (user, epoch-bucket)
    * with bucket width = the window: a qualifying B is always in A's
    * bucket or the one before, so B rows are replicated exactly 2× to
    * (bucket, bucket+1) — a constant factor, independent of user skew —
    * and each task's cross product is bounded by per-user activity per
    * WINDOW, not per corpus lifetime. Exact microsecond Long arithmetic;
    * the range filter re-checks precisely after the bucket equi-join. */
  def bandJoin(events: DataFrame, aType: String, bType: String,
               windowSecs: Long): DataFrame = {
    require(windowSecs >= 1, s"band window must be >= 1s, got $windowSecs")
    val wUs = windowSecs * 1000000L
    val us = unix_micros(col("ts").cast("timestamp"))
    def side(t: String) = events.filter(col("event_type") === t)
      .select(col("event_id"), col("user_id"), us.as("us"),
        floor(us / wUs).as("bucket"))
    val a = side(aType)
      .select(col("event_id").as("a_event_id"), col("user_id"),
        col("us").as("a_us"), col("bucket"))
    val b = side(bType)
      .withColumn("bucket", explode(array(col("bucket"), col("bucket") + 1)))
      .select(col("event_id").as("b_event_id"), col("user_id"),
        col("us").as("b_us"), col("bucket"))
    a.join(b, Seq("user_id", "bucket"))
      .filter(col("b_us") >= col("a_us") - wUs && col("b_us") <= col("a_us"))
      .select(col("a_event_id"), col("b_event_id"), col("user_id"),
        (col("a_us") - col("b_us")).as("gap_us"))
      .orderBy("a_event_id", "b_event_id")
  }

  /** Rolling window-distinct actives (the product-analytics WAU/MAU
    * family: per event day, distinct users active in the trailing
    * `windowDays`-day window, current day inclusive) — the SLIDING
    * sibling of [[cumulativeCardinality]]'s cumulative form. Exact,
    * no sketches.
    *
    * Plan, built for scale: corpus-scale work is ONE distinct to the
    * (user, day) presence table (≤ users × active-days — already the
    * reduced regime); the window then materializes by exploding each
    * presence row over its `windowDays` report days — a BOUNDED
    * constant-factor expansion of the reduced table, never of the
    * event stream — and one count-distinct agg per report day.
    * Report days are restricted (semi-join) to days that actually
    * have events; the dense-spine variant composes with
    * [[gapFilledDaily]]. Day arithmetic is exact UTC epoch-day
    * integer division. */
  def rollingActiveUsers(events: DataFrame, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"window must be >= 1 day, got $windowDays")
    val day = floor(unix_timestamp(col("ts")) / lit(86400L)).cast("long")
    val pres = events.select(col("user_id"), day.as("day")).distinct()
    val days = pres.select(col("day").as("rday")).distinct()
    pres
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + lit(windowDays - 1L)))
          .as("rday"))
      .join(days, Seq("rday"), "left_semi")
      .groupBy("rday")
      .agg(countDistinct("user_id").as("active_users"))
      .select(
        date_format(from_unixtime(col("rday") * 86400), "yyyy-MM-dd").as("day"),
        col("active_users"))
      .orderBy("day")
  }

  /** Top adjacent event paths of length three (the product-analytics
    * "user flows"/Sankey view one step deeper than
    * [[transitionMatrix]]): corpus-wide counts of per-user consecutive
    * (a → b → c) triples, top `topN` by (count desc, path asc).
    *
    * Same single user-keyed window shuffle as the transition matrix
    * (two lead()s ride one sort); the count agg output is ≤ |types|³
    * rows and the top-N is a TakeOrderedAndProject on that reduced
    * table. (ts, event_id) tie-break pins sequences under any
    * parallelism. */
  def topPaths3(events: DataFrame, topN: Int): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("a"))
      .withColumn("b", lead("a", 1).over(w))
      .withColumn("c", lead("a", 2).over(w))
      .filter(col("b").isNotNull && col("c").isNotNull)
      .groupBy("a", "b", "c")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"), col("c"))
      .limit(topN)
  }

  /** First-order Markov transition matrix over per-user event
    * sequences — the "path analysis" operator next to [[funnel]]
    * (which fixes the step order) and sessionize (which cuts on gaps):
    * for every ordered adjacent pair in a user's timeline, count
    * (src_type → dst_type) transitions corpus-wide and report each
    * source's outgoing distribution.
    *
    * Plan, built for scale: ONE shuffle — the window partitionBy(user)
    * sort (per-user sequences are bounded by user activity, the same
    * skew posture every sessionization/funnel twin here shares), then a
    * type×type hash aggregation whose result is |types|² rows (tiny) —
    * the probability normalization runs on that reduced table, not the
    * corpus. Adjacent pairs tie-break equal timestamps by event_id, so
    * the sequence (and the counts) are deterministic under any
    * parallelism.
    *
    * The probability is one IEEE double division of two exact Longs,
    * rounded by the explicit half-up rule (floor(x·1e6 + 0.5)/1e6 —
    * engines disagree on round()'s tie rule, so the C3 convention
    * spells it out). */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("dst", lead("event_type", 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    val srcTotal = Window.partitionBy("src")
    trans
      .withColumn("p", floor(col("n") / sum("n").over(srcTotal) * 1e6 + 0.5) / 1e6)
      .select(col("src"), col("dst"), col("n"), col("p"))
      .orderBy("src", "dst")
  }
}
