package graft

import java.nio.file.Files

import graft.build.BuildParams
import graft.corpus.Synthesizer
import graft.index.IndexStorage
import graft.search.MultiSearcher
import graft.streaming.{StreamIndexer, StreamStats}

/** Incremental streaming ingestion — SURVEY §2.5 "Streaming" row: one
  * segment per micro-batch via Trigger.AvailableNow + foreachBatch,
  * exactly-once through the streaming checkpoint, queryable merge-on-read. */
class StreamingSpec extends SparkSpec {

  test("AvailableNow indexes only new files per run; segments accumulate and query") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-stream-src").toString
    val idx = Files.createTempDirectory("graft-stream-idx").toString
    val params = BuildParams(numPartitions = 4, bucketSize = 64)
    val indexer = new StreamIndexer(idx, params)

    val all = Synthesizer.tiny(spark).collect()
    spark.createDataset(all.take(100).toSeq).write.mode("append").parquet(src)
    indexer.runAvailableNow(spark, src)
    assert(IndexStorage.exists(idx, 0), "first batch must create seg-00000")
    assert(!IndexStorage.exists(idx, 1))
    val seg0 = IndexStorage.read(spark, IndexStorage.segDir(idx, 0).toString)
    assert(seg0.stats.numDocs == 100)

    // second wave of files: only the delta is processed
    spark.createDataset(all.drop(100).toSeq).write.mode("append").parquet(src)
    indexer.runAvailableNow(spark, src)
    assert(IndexStorage.exists(idx, 1), "second batch must append seg-00001")
    val seg1 = IndexStorage.read(spark, IndexStorage.segDir(idx, 1).toString)
    assert(seg1.stats.numDocs == 100, s"delta only, got ${seg1.stats.numDocs}")
    // docIds globally unique, bucket-aligned base
    val ids0 = seg0.docs.select("docId").as[Long].collect().toSet
    val ids1 = seg1.docs.select("docId").as[Long].collect().toSet
    assert(ids0.intersect(ids1).isEmpty)
    assert(ids1.min % params.bucketSize == 0)

    // no new files ⇒ no new segment
    indexer.runAvailableNow(spark, src)
    assert(!IndexStorage.exists(idx, 2))

    // merge-on-read query across the streamed segments
    val multi = new MultiSearcher(spark, Seq(seg0, seg1))
    val term = seg0.dict.orderBy(org.apache.spark.sql.functions.desc("df"))
      .limit(1).collect().head.term
    val hits = multi.hits("FREE", term, 10).collect()
    assert(hits.nonEmpty && hits.map(_.rank).toSeq == (1 to hits.length))
    seg0.unpersist(); seg1.unpersist()
  }

  test("non-bucket-aligned batches never reuse docIds (high-watermark base)") {
    // regression: with bucketSize=100 and batch sizes 150, 50, 60, a base
    // derived from sum(numDocs) would put batch 3 at ceil(200/100)*100 =
    // 200 — INSIDE seg-1's [200,250) range. The watermark base must not.
    import spark.implicits._
    val src = Files.createTempDirectory("graft-stream-src2").toString
    val idx = Files.createTempDirectory("graft-stream-idx2").toString
    val params = BuildParams(numPartitions = 4, bucketSize = 100)
    val indexer = new StreamIndexer(idx, params)

    val all = Synthesizer.corpus(spark, 260L).collect()
    val waves = Seq(all.slice(0, 150), all.slice(150, 200), all.slice(200, 260))
    waves.foreach { w =>
      spark.createDataset(w.toSeq).write.mode("append").parquet(src)
      indexer.runAvailableNow(spark, src)
    }
    val segs = (0 until 3).map(i =>
      IndexStorage.read(spark, IndexStorage.segDir(idx, i.toLong).toString))
    assert(segs.map(_.stats.numDocs) == Seq(150, 50, 60))
    val idSets = segs.map(_.docs.select("docId").as[Long].collect().toSet)
    // globally unique across all three segments
    assert(idSets(0).intersect(idSets(1)).isEmpty)
    assert(idSets(0).intersect(idSets(2)).isEmpty)
    assert(idSets(1).intersect(idSets(2)).isEmpty)
    // each base bucket-aligned and above the previous segment's max id
    assert(idSets(1).min % 100 == 0 && idSets(1).min > idSets(0).max)
    assert(idSets(2).min % 100 == 0 && idSets(2).min > idSets(1).max)
    segs.foreach(_.unpersist())
  }

  test("watermarked windowed aggregation drops late events, matches batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(h: Int) = new java.sql.Timestamp(t0.getTime + h * 3600L * 1000L)
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = StreamStats.windowedCounts(events, "1 hour", "1 hour")
      .writeStream.format("memory").queryName("winagg")
      .outputMode("update").start()
    try {
      // batch 1: events in hours 0 and 1
      mem.addData((ts(0), "a", 1.0), (ts(0), "a", 2.0), (ts(1), "b", 3.0))
      q.processAllAvailable()
      // batch 2: hour 5 advances the watermark to hour 4...
      mem.addData((ts(5), "a", 1.0))
      q.processAllAvailable()
      // batch 3: ...so an hour-0 straggler is LATE and must be dropped
      mem.addData((ts(0), "a", 100.0))
      q.processAllAvailable()
      val rows = spark.table("winagg")
        .groupBy($"win_start", $"event_type")
        .agg(max($"cnt").as("cnt"), max($"sum_value").as("sum_value"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows == Set(
        ("2026-01-01 00:00:00", "a", 2L, 3.0),   // straggler NOT counted
        ("2026-01-01 01:00:00", "b", 1L, 3.0),
        ("2026-01-01 05:00:00", "a", 1L, 1.0)))
      // same operator on a bounded frame == a plain groupBy (the twin)
      val batch = StreamStats.windowedCounts(
        Seq((ts(0), "a", 1.0), (ts(0), "a", 2.0), (ts(1), "b", 3.0))
          .toDF("ts", "event_type", "value"), "1 hour", "1 hour")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(batch == Set(
        ("2026-01-01 00:00:00", "a", 2L), ("2026-01-01 01:00:00", "b", 1L)))
    } finally q.stop()
  }

  test("stream-static enrichment join equals the batch join, across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val dim = Seq((1L, "free"), (2L, "pro"), (3L, "pro"))
      .toDF("user_id", "segment")
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp, String)]
    val events = mem.toDF().toDF("event_id", "user_id", "ts", "event_type")
    val q = graft.streaming.StreamJoin.enrich(events, dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      val b1 = Seq((10L, 1L, t0, "click"), (11L, 2L, t0, "view"),
        (12L, 9L, t0, "click")) // user 9 has no dim row -> dropped
      val b2 = Seq((13L, 3L, t0, "purchase"), (14L, 1L, t0, "view"))
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("enriched")
        .as[(Long, Long, String, String)].collect().toSet
      // batch parity: same expression over the union frame
      val want = graft.streaming.StreamJoin.enrich(
          (b1 ++ b2).toDF("event_id", "user_id", "ts", "event_type"), dim)
        .as[(Long, Long, String, String)].collect().toSet
      assert(got == want && got.size == 4 && !got.exists(_._1 == 12L))
    } finally q.stop()
  }

  test("streaming dedup: first-seen-wins across micro-batches, min-id within") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamStats.streamingDedup(mem.toDS())
      .toDF("doc_id", "text")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      // batch 1: an in-batch dup (5 vs 2 — min id 2 must win) + a unique
      mem.addData((5L, "aaa bbb"), (2L, "aaa bbb"), (3L, "ccc"))
      q.processAllAvailable()
      // batch 2: cross-batch re-sends never re-emit; one genuinely new
      mem.addData((9L, "aaa bbb"), (10L, "ddd eee"), (11L, "ccc"))
      q.processAllAvailable()
      // batch 3: even a LOWER id cannot reclaim an already-seen content
      mem.addData((1L, "aaa bbb"))
      q.processAllAvailable()
      val rows = spark.table("sdedup").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set((2L, "aaa bbb"), (3L, "ccc"), (10L, "ddd eee")))
    } finally q.stop()
  }

  test("streaming CMS grid: running state after each batch == the batch " +
       "sketch of the union frame (sketch linearity = mergeability)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (depth, width) = (3, 32)
    val mem = MemoryStream[(Long, String)]
    val q = StreamStats.streamingCmsGrid(mem.toDS(), depth, width)
      .toDF("row", "bucket", "cnt")
      .writeStream.format("memory").queryName("scms")
      .outputMode("update").start()
    val b1 = Seq((1L, "fast merge sort"), (2L, "fast scan"))
    val b2 = Seq((3L, "merge merge window"), (4L, "x yy"))
    def batchGrid(docs: Seq[(Long, String)]): Map[(Int, Int), Long] =
      graft.pipeline.Cms.sketch(docs.toDF("doc_id", "text"),
          graft.pipeline.Cms.Params(depth, width))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    def latest(): Map[(Int, Int), Long] = {
      // update mode re-emits a cell per change: last emission wins
      val rows = spark.table("scms").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      rows.zipWithIndex.groupBy { case ((r, b, _), _) => (r, b) }
        .map { case (cell, xs) => cell -> xs.maxBy(_._2)._1._3 }
    }
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      assert(latest() == batchGrid(b1), "after batch 1")
      mem.addData(b2: _*)
      q.processAllAvailable()
      assert(latest() == batchGrid(b1 ++ b2), "after batch 2")
    } finally q.stop()
  }

  test("streaming sessionization matches the batch operator; in-batch " +
       "splits, cross-batch continuation, timeout closes, late-merge") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val q = StreamStats.streamingSessionize(mem.toDS(), 60L, "1 hour")
      .toDF("user_id", "session_id", "n_events", "duration_us", "sum_value")
      .writeStream.format("memory").queryName("ssess")
      .outputMode("append").start()
    def t(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val realEvents = Seq(
      (1L, 1L, t(0), 1.0), (1L, 2L, t(10), 2.0), (2L, 10L, t(5), 5.0),
      // gap exactly 60 (t70 vs t10) stays; 61 (t131 vs t70) splits in-batch
      (1L, 3L, t(70), 3.0), (1L, 4L, t(131), 4.0),
      // in-watermark late event for user 2 — merges, never retro-splits
      (2L, 11L, t(3), 1.0))
    try {
      mem.addData(realEvents.take(3): _*)
      q.processAllAvailable()
      mem.addData(realEvents.drop(3): _*)
      q.processAllAvailable()
      // flush: push the watermark far past every open session's gap,
      // then one more batch so the event-time timeouts actually fire
      mem.addData((99L, 99L, t(100000), 0.0))
      q.processAllAvailable()
      mem.addData((99L, 98L, t(200000), 0.0))
      q.processAllAvailable()
      val got = spark.table("ssess").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
        .filter(_._1 != 99L).toSet
      val want = graft.pipeline.Events.sessionize(
          realEvents.toDF("user_id", "event_id", "ts", "value"), 60L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSet
      assert(got == want, s"streaming $got vs batch $want")
      // the in-batch split emitted user 1's first session BEFORE any
      // flush batch: 2 sessions for user 1, 1 for user 2
      assert(got.count(_._1 == 1L) == 2 && got.count(_._1 == 2L) == 1)
      intercept[IllegalArgumentException](
        StreamStats.streamingSessionize(mem.toDS(), 0L))
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates per-source stats across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = StreamStats.runningSourceStats(mem.toDS())
      .toDF("source", "n_docs", "n_tokens")
      .writeStream.format("memory").queryName("srcstats")
      .outputMode("update").start()
    try {
      mem.addData(("s1", "alpha beta"), ("s1", "gamma"), ("s2", "delta epsilon zeta"))
      q.processAllAvailable()
      mem.addData(("s1", "eta theta"))
      q.processAllAvailable()
      val last = spark.table("srcstats")
        .groupBy($"source")
        .agg(org.apache.spark.sql.functions.max($"n_docs").as("d"),
          org.apache.spark.sql.functions.max($"n_tokens").as("t"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // state carried across batches: s1 = 3 docs / 5 tokens total
      assert(last == Set(("s1", 3L, 5L), ("s2", 1L, 3L)))
    } finally q.stop()
  }

  test("stream-stream interval join == bucketed batch band join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // real events: the sf0.001 purchase/click streams fed through
    // MemoryStream in two arbitrary micro-batch cuts
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"event_id".as[Long], $"user_id".as[Long],
        $"ts".as[java.sql.Timestamp], $"event_type".as[String])
      .collect()
    def rows(t: String) = ev.filter(_._4 == t).map(r => (r._1, r._2, r._3))
    val purchases = rows("purchase"); val clicks = rows("click")
    val memA = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val memB = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = graft.streaming.StreamJoin.intervalJoin(
      memA.toDF().toDF("event_id", "user_id", "ts"),
      memB.toDF().toDF("event_id", "user_id", "ts"), 3600L)
    val q = joined.writeStream.format("memory").queryName("sjoin")
      .outputMode("append").start()
    try {
      // time-aligned micro-batch cut: batch 2 carries only events after
      // the global median timestamp, so nothing in batch 2 is LATE w.r.t.
      // the batch-1 watermark — eviction then provably cannot drop a
      // pair the batch twin would keep (a batch-1 purchase evicted
      // before batch 2 has all its qualifying clicks inside batch 1)
      val cutMs = ev.map(_._3.getTime).sorted.apply(ev.length / 2)
      def cut(xs: Array[(Long, Long, java.sql.Timestamp)]) =
        xs.partition(_._3.getTime <= cutMs)
      val (a1, a2) = cut(purchases)
      val (b1, b2) = cut(clicks)
      memA.addData(a1.toSeq); memB.addData(b1.toSeq)
      q.processAllAvailable()
      memA.addData(a2.toSeq); memB.addData(b2.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("sjoin")
        .select($"a_event_id", $"b_event_id", $"user_id", $"gap_us")
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = graft.pipeline.Events.bandJoin(
          spark.read.parquet("/root/testdata/sf0.001/events.parquet"),
          "purchase", "click", 3600L)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(batch.nonEmpty, "fixture must produce pairs")
      assert(streamed == batch,
        s"stream/batch divergence: only-stream=${streamed -- batch} only-batch=${batch -- streamed}")
    } finally q.stop()
  }
}
