package graft

import java.sql.Timestamp

import graft.pipeline.Events

/** Auto date histogram (ES `auto_date_histogram`): the span-bucket
  * ladder rule checked against a plain-Scala brute force on in-memory
  * event frames crafted so each rung (minute/hour/day/week) is the one
  * selected, plus boundary laws (bucket count never exceeds the target
  * unless even week overflows; empty input). */
class EventsSpec extends SparkSpec {

  private def mkEvents(epochSecs: Seq[Long]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    epochSecs.map(s => (new Timestamp(s * 1000L), s.toDouble / 10.0))
      .toDF("ts", "value")
  }

  /** Brute force: the same ladder arithmetic + per-bucket count/sum in
    * plain Scala (UTC epoch-second floor division). */
  private def brute(epochSecs: Seq[Long], target: Int): (String, Map[Long, (Long, Double)]) = {
    val ladder = Seq(("minute", 60L, 0L), ("hour", 3600L, 0L),
      ("day", 86400L, 0L), ("week", 604800L, 3L * 86400L))
    val (lo, hi) = (epochSecs.min, epochSecs.max)
    val unit = ladder.collectFirst {
      case (u, w, s) if Math.floorDiv(hi + s, w) - Math.floorDiv(lo + s, w) + 1 <= target => u
    }.getOrElse("week")
    val (_, w, s) = ladder.find(_._1 == unit).get
    val buckets = epochSecs.groupBy(e => (Math.floorDiv(e + s, w)) * w - s)
      .map { case (b, es) =>
        b -> (es.size.toLong,
          BigDecimal(es.map(_.toDouble / 10.0).sum)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    (unit, buckets)
  }

  private def fmt(epochSec: Long): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochSecond(epochSec))

  private def check(epochSecs: Seq[Long], target: Int): Unit = {
    val got = Events.autoDateHistogram(mkEvents(epochSecs), target).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val (unit, want) = brute(epochSecs, target)
    assert(got.forall(_._2 == unit), s"expected rung $unit, got ${got.map(_._2).distinct.toSeq}")
    val wantRows = want.toSeq.map { case (b, (n, sv)) => (fmt(b), unit, n, sv) }
      .sortBy(_._1)
    assert(got.toSeq == wantRows)
  }

  private val base = 1704067200L // 2024-01-01 00:00:00 UTC (a Monday)

  test("each ladder rung is selected by its span") {
    check(Seq(0L, 90L, 1500L, 2100L).map(base + _), 40) // 35 min -> minute
    check((0 until 200).map(i => base + i * 600L), 40) // ~33 h -> hour
    check((0 until 300).map(i => base + i * 8000L), 40) // ~28 d -> day
    check((0 until 400).map(i => base + i * 60000L), 40) // ~278 d -> week
  }

  test("bucket count <= target for every rung below week") {
    for (span <- Seq(3000L, 200000L, 2000000L)) {
      val es = (0 until 120).map(i => base + i * (span / 120))
      val got = Events.autoDateHistogram(mkEvents(es), 40).collect()
      assert(got.length <= 40)
    }
  }

  test("cumulative cardinality == set-union brute force + laws") {
    import spark.implicits._
    // deterministic (day, user) pattern: user u appears on day d iff
    // d % (u % 5 + 1) == 0 — returners and late first-timers both occur
    val rows = for {
      d <- 0 until 14
      u <- 0 until 23
      if d % (u % 5 + 1) == 0
    } yield (new Timestamp((base + d * 86400L + u * 37L) * 1000L), u.toLong)
    val df = rows.toDF("ts", "user_id")
    val got = graft.pipeline.Events.cumulativeCardinality(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // brute force: running set union per day, in day order
    val byDay = rows.groupBy(r => fmt(r._1.getTime / 1000L).take(10))
      .view.mapValues(_.map(_._2).toSet).toSeq.sortBy(_._1)
    var seen = Set.empty[Long]
    val want = byDay.map { case (day, users) =>
      val nu = (users -- seen).size.toLong
      seen ++= users
      (day, users.size.toLong, nu, seen.size.toLong)
    }
    assert(got.toSeq == want)
    // laws: cum nondecreasing, ends at the global distinct count,
    // new_users sums to it, and daily >= new
    assert(got.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    assert(got.last._4 == rows.map(_._2).distinct.size)
    assert(got.map(_._3).sum == got.last._4)
    assert(got.forall(r => r._2 >= r._3))
  }

  test("sessionize == brute-force gap cutting + laws") {
    import spark.implicits._
    // (user, epochSec, id, value): crafted gaps exactly AT and just
    // OVER the 100 s budget (<= stays, > cuts), multi-user
    val rows = Seq(
      (1L, 0L, 1L, 1.0), (1L, 100L, 2L, 2.0), (1L, 200L, 3L, 3.0),
      (1L, 301L, 4L, 4.0), // gap 101 > 100 -> new session
      (1L, 400L, 5L, 5.0),
      (2L, 50L, 6L, 6.0), (2L, 151L, 7L, 7.0), // gap 101 -> cut
      (3L, 9L, 8L, 8.0))
    val df = rows.map { case (u, t, i, v) =>
      (u, new Timestamp(t * 1000L), i, v) }.toDF("user_id", "ts", "event_id", "value")
    val got = graft.pipeline.Events.sessionize(df, 100L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    // brute force: sort per user, cut at gap > 100 s
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      var out = Seq(Seq(sorted.head))
      sorted.tail.foreach { e =>
        if (e._2 - out.last.last._2 > 100L) out = out :+ Seq(e)
        else out = out.init :+ (out.last :+ e)
      }
      out.zipWithIndex.map { case (ses, i) =>
        (u, (i + 1).toLong, ses.length.toLong,
          (ses.map(_._2).max - ses.map(_._2).min) * 1000000L,
          BigDecimal(ses.map(_._4).sum).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    assert(got == want)
    // laws: session ids 1..k per user; event counts preserved
    assert(got.groupBy(_._1).forall { case (_, ss) =>
      ss.map(_._2).sorted == (1L to ss.length).toSeq })
    assert(got.map(_._3).sum == rows.length)
    // the crafted cuts: user 1 -> sessions (3 events)(2 events)
    assert(got.filter(_._1 == 1L).map(_._3) == Seq(3L, 2L))
  }

  test("retention == brute-force cohort triangle + laws") {
    import spark.implicits._
    // (user, day): cohorts on day 0 and 1; varying return patterns,
    // incl. a beyond-maxOffset return that must be cut
    val rows = Seq(
      (1L, 0L), (1L, 1L), (1L, 3L), (1L, 9L), // cohort 0, returns d1,d3 (d9 > 7 cut)
      (2L, 0L), (2L, 1L), // cohort 0, returns d1
      (3L, 0L), // cohort 0, never returns
      (4L, 1L), (4L, 3L), (4L, 3L)) // cohort 1, returns offset 2 (dup day collapses)
    val df = rows.zipWithIndex.map { case ((u, d), i) =>
      (u, new Timestamp((base + d * 86400L + u) * 1000L), i.toLong, "view", 0.0)
    }.toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = graft.pipeline.Events.retention(df, 7).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    val day0 = fmt(base).take(10)
    val day1 = fmt(base + 86400L).take(10)
    def pct(n: Long, c: Long) = math.floor(n * 100.0 / c * 1e6 + 0.5) / 1e6
    val want = Seq(
      (day0, 1L, 3L, 2L, pct(2, 3)), // users 1,2 back at offset 1 of 3
      (day0, 3L, 3L, 1L, pct(1, 3)), // user 1 at offset 3
      (day1, 2L, 1L, 1L, pct(1, 1))) // user 4 at offset 2
    assert(got == want)
    // laws: returning <= cohort_users; offsets within [1, maxOffset]
    assert(got.forall(r => r._4 <= r._3 && r._2 >= 1 && r._2 <= 7))
  }

  test("funnel == brute-force per-start greedy chains + laws") {
    import spark.implicits._
    // (user, type, epochSec) — crafted so greedy-from-the-first-start
    // fails but a later start converts (the per-start rule matters),
    // plus step-2-only and full-converter users
    val rows = Seq(
      (1L, "view", 0L), (1L, "click", 60L), (1L, "view", 50L),
      (1L, "purchase", 170L), // v@0->c@60 ok, p@170 > 60+100; v@50->c@60->p@170 > 160 fail... see asserts
      (2L, "view", 0L), (2L, "click", 90L), (2L, "purchase", 150L),
      (3L, "view", 10L), (3L, "purchase", 20L), // no click: step 1 only
      (4L, "click", 5L), (4L, "purchase", 10L), // no view: outside funnel
      (5L, "view", 0L), (5L, "view", 100L), (5L, "click", 150L))
    val df = rows.zipWithIndex.map { case ((u, t, sec), i) =>
      (u, t, new Timestamp(sec * 1000L), i.toLong, 0.0)
    }.toDF("user_id", "event_type", "ts", "event_id", "value")
    val steps = Seq("view", "click", "purchase")
    val got = graft.pipeline.Events.funnel(df, steps, 100L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(_._1)
    // brute force of the PINNED rule: per start, greedy-earliest chain
    def furthest(u: Long): Int = {
      val byStep = steps.map(t => rows.collect {
        case (`u`, `t`, s) => s }.sorted)
      if (byStep.head.isEmpty) return 0
      byStep.head.map { s0 =>
        var prev = s0; var k = 1; var ok = true
        while (ok && k < steps.length) {
          byStep(k).find(t => t > prev && t <= prev + 100L) match {
            case Some(t) => prev = t; k += 1
            case None => ok = false
          }
        }
        k
      }.max
    }
    val fs = rows.map(_._1).distinct.map(u => u -> furthest(u)).toMap
    val n1 = fs.values.count(_ >= 1)
    val want = steps.indices.map { i =>
      val n = fs.values.count(_ >= i + 1).toLong
      (i + 1L, steps(i),
        n, math.floor(n * 100.0 / n1 * 1e6 + 0.5) / 1e6)
    }
    assert(got == want)
    // laws: monotone nonincreasing counts; step-1 pct is 100
    assert(got.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    assert(got.head._4 == 100.0)
    // the crafted cases: user 2 converts fully; user 1 reaches step 2
    // (v@0->c@60, p@170 outside 60+100; v@50->c@60, same p fail);
    // user 3 step 1; user 4 never enters; user 5 proves the PER-START
    // rule (v@0 finds no click in (0,100], v@100 -> c@150 does)
    assert(fs(2L) == 3 && fs(1L) == 2 && fs(3L) == 1 && fs(4L) == 0)
    assert(fs(5L) == 2)
    assert(got.map(_._3) == Seq(4L, 3L, 1L))
  }

  test("as-of prior join == brute-force strict-< argmax per key") {
    import spark.implicits._
    // interleaved fixture with equal-ts collisions (cross-side AND
    // right-right), multi-key, and no-prior lefts
    val lefts = Seq( // (key, epochSec, id)
      (1L, 100L, 10L), (1L, 200L, 11L), (1L, 200L, 12L), (1L, 50L, 13L),
      (2L, 100L, 20L), (3L, 500L, 30L))
    val rights = Seq(
      (1L, 100L, 40L), // equal-ts to left 10 — strict-< excludes it there
      (1L, 150L, 41L), (1L, 150L, 42L), // right-right tie: max id wins
      (1L, 199L, 43L), (2L, 99L, 44L), (2L, 100L, 45L))
    def df(xs: Seq[(Long, Long, Long)]) = xs
      .map { case (k, t, i) => (k, new Timestamp(t * 1000L), i) }
      .toDF("key", "ts", "id")
    val got = graft.pipeline.AsOf.asOfPrior(df(lefts), df(rights)).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
      .toSeq.sortBy(r => (r._2, r._1))
    val want = lefts.map { case (k, t, i) =>
      val prior = rights.filter(r => r._1 == k && r._2 < t)
        .sortBy(r => (r._2, r._3)).lastOption
      (i, k, prior.map(_._3).getOrElse(-1L),
        prior.map(p => (t - p._2) * 1000000L).getOrElse(-1L))
    }.sortBy(r => (r._2, r._1))
    assert(got == want)
    // every left row survives; strict gap positivity
    assert(got.length == lefts.length)
    assert(got.forall(r => r._4 == -1L || r._4 > 0L))
    // left 10 (ts 100) must NOT see the equal-ts right 40
    assert(got.find(_._1 == 10L).get._3 == -1L)
    // right-right tie at 150: left 11/12 (ts 200) see id 43 (ts 199);
    // shrink: a left at 160 would see 42 — checked via key 2's tie
    assert(got.find(_._1 == 20L).get._3 == 44L) // strict-<: 45 @100 excluded

    // ── the FORWARD form on the same fixture ──────────────────────────
    val gotN = graft.pipeline.AsOf.asOfNext(df(lefts), df(rights)).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
      .toSeq.sortBy(r => (r._2, r._1))
    val wantN = lefts.map { case (k, t, i) =>
      val next = rights.filter(r => r._1 == k && r._2 > t)
        .sortBy(r => (r._2, r._3)).headOption
      (i, k, next.map(_._3).getOrElse(-1L),
        next.map(n => (n._2 - t) * 1000000L).getOrElse(-1L))
    }.sortBy(r => (r._2, r._1))
    assert(gotN == wantN)
    assert(gotN.length == lefts.length)
    assert(gotN.forall(r => r._4 == -1L || r._4 > 0L))
    // left 10 (ts 100) must NOT see the equal-ts right 40; it sees the
    // SMALLEST-id right of the 150 tie (41, not 42)
    assert(gotN.find(_._1 == 10L).get._3 == 41L)
    // left 20 (ts 100, key 2): right 45 at the same ts is excluded and
    // nothing later exists
    assert(gotN.find(_._1 == 20L).get._3 == -1L)
  }

  test("sub-target span picks the smallest rung; empty input is empty") {
    val got = Events.autoDateHistogram(mkEvents(Seq(base, base + 30L)), 40)
      .collect()
    assert(got.forall(_.getString(1) == "minute"))
    import spark.implicits._
    val empty = Seq.empty[(Timestamp, Double)].toDF("ts", "value")
    assert(Events.autoDateHistogram(empty, 40).collect().isEmpty)
    intercept[IllegalArgumentException](Events.autoDateHistogram(empty, 0))
  }

  private def fmtDay(epochDay: Long): String =
    java.time.LocalDate.ofEpochDay(epochDay).toString

  test("daily anomaly: 2σ exact-integer rule vs brute force; spike flagged, " +
       "flat days not; <2-baseline days report false; validation") {
    // per-day counts: 7 flat days, a 3× spike, recovery, a mild bump
    val counts = Seq(10L, 11L, 10L, 9L, 10L, 11L, 10L, 30L, 10L, 13L)
    val secs = counts.zipWithIndex.flatMap { case (c, i) =>
      (0L until c).map(j => 19723L * 86400 + i * 86400L + j)
    }
    val got = Events.dailyAnomaly(mkEvents(secs), 7).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.length == counts.length)
    counts.indices.foreach { i =>
      val base = counts.slice(math.max(0, i - 7), i)
      val n = base.length.toLong
      val (s1, s2) = (base.sum, base.map(x => x * x).sum)
      val x = counts(i)
      val want = n >= 2 &&
        (n * x - s1) * (n * x - s1) > 4L * (n * s2 - s1 * s1)
      assert(got(i)._2 == x && got(i)._3 == n && got(i)._4 == want,
        s"day $i: ${got(i)} want ($x, $n, $want)")
    }
    // the spike is flagged; the flat prefix and the mild bump are not
    assert(got(7)._4 && !got(6)._4 && !got(9)._4)
    assert(!got(0)._4 && !got(1)._4) // 0- and 1-day baselines: false
    intercept[IllegalArgumentException](
      Events.dailyAnomaly(mkEvents(secs), 1))
  }

  test("absence detection: forward-only inclusive window, same-us cancel, " +
       "brute force, validation") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val w = 60L
    val evs = Seq(
      (1L, 1L, t(0), "A"), (2L, 1L, t(60), "B"),     // B at exactly t+w cancels
      (3L, 1L, t(200), "A"), (4L, 1L, t(261), "B"),  // B just outside: abandoned
      (5L, 2L, t(10), "A"), (6L, 2L, t(10), "B"),    // same-us B cancels
      (7L, 2L, t(500), "A"),                         // lone A: abandoned
      (8L, 3L, t(5), "B"), (9L, 3L, t(50), "A"),     // B BEFORE A never cancels
      (10L, 4L, t(0), "C"), (11L, 4L, t(1), "A"), (12L, 4L, t(30), "B"))
    val df = evs.toDF("event_id", "user_id", "ts", "event_type")
    val got = Events.absence(df, "A", "B", w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def us(ts: java.sql.Timestamp) = ts.getTime * 1000L
    val bs = evs.filter(_._4 == "B")
    val want = evs.filter(_._4 == "A").filterNot { a =>
      bs.exists { b =>
        val d = us(b._3) - us(a._3)
        b._2 == a._2 && d >= 0L && d <= w * 1000000L
      }
    }.map(a => (a._1, a._2, us(a._3))).sortBy(_._1)
    assert(got.toSeq == want)
    assert(got.map(_._1).toSet == Set(3L, 7L, 9L))
    intercept[IllegalArgumentException](Events.absence(df, "A", "B", 0L))
    intercept[IllegalArgumentException](Events.absence(df, "A", "A", w))
  }

  test("gap-filled daily histogram: dense spine, zero-filled gaps, " +
       "bounds only widen, empty-input postures") {
    import spark.implicits._
    // days 19723, 19725 (×2), 19730 — gaps at 19724 and 19726..19729
    val secs = Seq(19723L * 86400 + 5, 19725L * 86400 + 60,
      19725L * 86400 + 61, 19730L * 86400)
    val df = mkEvents(secs)
    def rows(g: org.apache.spark.sql.DataFrame) =
      g.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val got = rows(Events.gapFilledDaily(df))
    assert(got.map(_._1) == (19723L to 19730L).map(fmtDay))
    val brute = secs.groupBy(s => Math.floorDiv(s, 86400L)).map { case (d, es) =>
      d -> (es.size.toLong,
        BigDecimal(es.map(_.toDouble / 10.0).sum)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    got.foreach { case (day, cnt, sv) =>
      val d = java.time.LocalDate.parse(day).toEpochDay
      brute.get(d) match {
        case Some((bc, bs)) => assert(cnt == bc && sv == bs, s"$day: ($cnt,$sv)")
        case None => assert(cnt == 0L && sv == 0.0, s"$day not zero-filled")
      }
    }
    // extended bounds INSIDE the data span never shrink it (the ES rule)
    assert(rows(Events.gapFilledDaily(df, Some(19725L), Some(19726L))) == got)
    // widening bounds add zero-filled edge days
    val wide = rows(Events.gapFilledDaily(df, Some(19721L), Some(19732L)))
    assert(wide.map(_._1) == (19721L to 19732L).map(fmtDay))
    assert(wide.take(2).forall(r => r._2 == 0L && r._3 == 0.0))
    assert(wide.takeRight(2).forall(r => r._2 == 0L && r._3 == 0.0))
    assert(wide.filter(r => got.map(_._1).contains(r._1)) == got)
    // empty input: complete bounds give an all-zero spine; none give empty
    val empty = Seq.empty[(Timestamp, Double)].toDF("ts", "value")
    assert(rows(Events.gapFilledDaily(empty, Some(19723L), Some(19724L))) ==
      Seq((fmtDay(19723L), 0L, 0.0), (fmtDay(19724L), 0L, 0.0)))
    assert(Events.gapFilledDaily(empty).collect().isEmpty)
    intercept[IllegalArgumentException](
      Events.gapFilledDaily(df, Some(5L), Some(4L)))
  }

  test("rolling actives == brute-force trailing-window distinct; " +
    "only real event days report") {
    import spark.implicits._
    def ev(id: Long, day: Long, user: Long) =
      (id, new Timestamp(day * 86400L * 1000L + 3600L * 1000L), user, "view")
    // users: 1 active days 0,1; 2 active day 0 only; 3 active day 9
    val events = Seq(
      ev(1, 0, 1), ev(2, 0, 1), ev(3, 0, 2), ev(4, 1, 1), ev(5, 9, 3)
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.pipeline.Events.rollingActiveUsers(events, 7)
      .as[(String, Long)].collect().toSeq
    // day 0: {1,2}; day 1: {1,2}; day 9: {3} (window [3,9] misses 0-1);
    // days 2-8 have no events -> absent
    assert(got == Seq(("1970-01-01", 2L), ("1970-01-02", 2L),
      ("1970-01-10", 1L)), s"got $got")
    // window-1 degenerates to per-day distinct
    val got1 = graft.pipeline.Events.rollingActiveUsers(events, 1)
      .as[(String, Long)].collect().toSeq
    assert(got1 == Seq(("1970-01-01", 2L), ("1970-01-02", 1L),
      ("1970-01-10", 1L)), s"got $got1")
  }

  test("transition matrix: counts vs brute force, per-source rows sum to n, " +
    "equal-ts ties broken by event_id") {
    import spark.implicits._
    def ev(id: Long, sec: Long, user: Long, t: String) =
      (id, new Timestamp(sec * 1000L), user, t)
    val events = Seq(
      ev(1, 10, 1, "view"), ev(2, 20, 1, "click"), ev(3, 30, 1, "view"),
      ev(4, 40, 1, "click"), ev(5, 50, 1, "purchase"),
      // user 2: two events at the SAME ts — order must follow event_id
      ev(6, 10, 2, "click"), ev(7, 10, 2, "view"), ev(8, 99, 2, "click"),
      ev(9, 5, 3, "view") // single-event user: no transitions
    ).toDF("event_id", "ts", "user_id", "event_type")

    val got = Events.transitionMatrix(events)
      .as[(String, String, Long, Double)].collect().toSeq
    val counts = got.map(r => (r._1, r._2) -> r._3).toMap
    assert(counts == Map(
      ("view", "click") -> 3L,    // u1 ×2, u2 (6→7 is click→view; 7→8 view→click)
      ("click", "view") -> 2L,    // u1 2→3, u2 6→7
      ("click", "purchase") -> 1L), s"got $counts")
    // probabilities: per-source n / total, explicit half-up 6-dp
    got.foreach { case (src, _, n, p) =>
      val tot = got.filter(_._1 == src).map(_._3).sum
      assert(p == math.floor(n.toDouble / tot * 1e6 + 0.5) / 1e6)
    }
    // parallelism invariance
    val got8 = Events.transitionMatrix(events.repartition(8))
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got8 == got)

    // length-3 paths on the same fixture: u1 has (v,c,v),(c,v,c),(v,c,p);
    // u2 ordered by event_id at the tied ts has (c,v,c); u3 none
    val paths = Events.topPaths3(events, 10)
      .as[(String, String, String, Long)].collect().toSeq
    assert(paths == Seq(
      ("click", "view", "click", 2L),
      ("view", "click", "purchase", 1L),
      ("view", "click", "view", 1L)), s"got $paths")
  }

  test("serial diff: calendar lags over the dense spine == brute force; " +
    "gap days are zero-filled BEFORE differencing; first lag-k rows NULL") {
    import spark.implicits._
    // days 0,1,3,3,10 (gaps at 2 and 4..9) — lags must be calendar
    val secs = Seq(10L, 86400L + 5, 3 * 86400L + 9, 3 * 86400L + 11,
      10 * 86400L + 1)
    val out = Events.serialDiff(mkEvents(secs), 3)
      .as[(String, Long, Option[Long], Option[Long])].collect().toSeq
    val cnt = (0L to 10L).map(d => secs.count(s => s / 86400 == d).toLong)
    val want = (0 to 10).map { d =>
      (fmt(d * 86400L).take(10), cnt(d),
        if (d >= 1) Some(cnt(d) - cnt(d - 1)) else None,
        if (d >= 3) Some(cnt(d) - cnt(d - 3)) else None)
    }
    assert(out == want, s"got $out")
  }

  test("date_range agg: empty events still reports the full zeroed row " +
      "set (sum() over zero rows is SQL NULL — must coalesce, not NPE)") {
    import spark.implicits._
    val empty = mkEvents(Seq.empty)
    val out = Events.dateRangeAgg(empty,
      Seq(("early", None, Some(100L)), ("late", Some(100L), None)))
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("early", -1L, 100L, 0L, 0.0),
      ("late", 100L, -1L, 0L, 0.0)), s"got $out")
  }
}
