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

  test("sub-target span picks the smallest rung; empty input is empty") {
    val got = Events.autoDateHistogram(mkEvents(Seq(base, base + 30L)), 40)
      .collect()
    assert(got.forall(_.getString(1) == "minute"))
    import spark.implicits._
    val empty = Seq.empty[(Timestamp, Double)].toDF("ts", "value")
    assert(Events.autoDateHistogram(empty, 40).collect().isEmpty)
    intercept[IllegalArgumentException](Events.autoDateHistogram(empty, 0))
  }
}
