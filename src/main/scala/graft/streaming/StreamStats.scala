package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.tokenize.Tokenizer

/** Streaming analytics over event/document streams — the Structured
  * Streaming surface beyond ingestion (StreamIndexer): event-time
  * windowed aggregation with a watermark, and custom keyed state via
  * mapGroupsWithState.
  *
  * Both operate on UNBOUNDED streams by construction: the windowed
  * aggregation's state is bounded by the watermark (closed windows are
  * dropped from the state store), and the keyed state holds one small
  * record per key. At 100 TB/day rates, state partitions by key across
  * executors exactly like any other shuffle — nothing here is
  * driver-resident.
  */
object StreamStats {

  /** Event-time tumbling-window counts with a watermark: late events
    * beyond `watermark` are dropped, and windows finalize (in append
    * mode) once the watermark passes their end — the standard bounded-
    * state streaming aggregation. Works identically on a batch frame
    * (the watermark is a no-op there), which is what the DuckDB twin
    * checks. */
  def windowedCounts(events: DataFrame, windowDur: String = "1 day",
                     watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 4).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Keyed running state. */
  final case class SourceState(nDocs: Long, nTokens: Long)

  /** Dedup state: the doc that claimed this content hash. */
  final case class SeenState(keptDocId: Long)

  /** Streaming exact dedup — first-seen-wins across the stream's whole
    * lifetime (the online form of the exact-dedup pipeline op): a doc is
    * emitted iff its content sha256 has never been seen in ANY earlier
    * micro-batch; within a batch the lowest doc_id claims the hash
    * (deterministic regardless of arrival order). The streaming-ingest
    * counterpart a training pipeline runs in front of StreamIndexer so
    * re-crawled duplicates never reach the index. Scale: the hash is
    * computed in a narrow map BEFORE the state shuffle; state is ONE
    * small record per distinct content, key-partitioned across
    * executors by the state store exactly like any shuffle — nothing
    * driver-resident, no cross-key coordination. */
  def streamingDedup(docs: Dataset[(Long, String)]): Dataset[(Long, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.map { case (id, text) =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        val hex = md.digest(text.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (hex, id, text)
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[SeenState, (Long, String)](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(String, Long, String)],
         state: GroupState[SeenState]) =>
          if (state.exists) Iterator.empty
          else {
            var bestId = Long.MaxValue
            var bestText: String = null
            rows.foreach { case (_, id, t) =>
              if (id < bestId) { bestId = id; bestText = t }
            }
            state.update(SeenState(bestId))
            Iterator.single((bestId, bestText))
          }
      }
  }

  /** Open-session state: `nextId` numbers the user's sessions 1-based
    * (kept across closes so later sessions keep counting); n == 0 means
    * no session is open. */
  final case class SessState(nextId: Long, startUs: Long, lastUs: Long,
                             n: Long, sum: Double)

  /** Streaming sessionization — the Structured-Streaming sibling of the
    * batch `Events.sessionize` (X114), built on flatMapGroupsWithState
    * with an EVENT-TIME timeout: a user's session closes either when a
    * later event arrives with a gap strictly over the budget (in-batch
    * close — the batch rule verbatim) or when the watermark passes
    * lastEvent + gap (the timeout close that a pure batch op never
    * needs). Emits one row per CLOSED session, shaped exactly like the
    * batch rollup: (user_id, session_id, n_events, duration_us,
    * sum_value@4dp).
    *
    * Pinned contract: admitted events fold in per-batch (ts, event_id)
    * order; an in-watermark late event older than the open session's
    * last event MERGES into it (sessions never retro-split — the
    * standard streaming approximation). Under in-order delivery the
    * output is row-identical to the batch operator on the same frame —
    * the law StreamingSpec checks.
    *
    * Scale: state is ONE small record per user, partitioned by the
    * state store across executors; a hot user folds only its own
    * batch slice. Timeouts are event-time, so idle users cost nothing
    * until the watermark actually passes their gap. */
  def streamingSessionize(events: Dataset[(Long, Long, java.sql.Timestamp, Double)],
                          gapSecs: Long, watermark: String = "1 hour")
      : Dataset[(Long, Long, Long, Long, Double)] = {
    require(gapSecs >= 1, s"session gap must be >= 1s, got $gapSecs")
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSecs * 1000000L
    def micros(ts: java.sql.Timestamp): Long =
      ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    events.toDF("user_id", "event_id", "ts", "value")
      .withWatermark("ts", watermark)
      .as[(Long, Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessState, (Long, Long, Long, Long, Double)](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp, Double)],
         state: GroupState[SessState]) =>
          def close(s: SessState) =
            (user, s.nextId, s.n, s.lastUs - s.startUs, round4(s.sum))
          if (!rows.hasNext && state.hasTimedOut) {
            val s = state.get
            state.update(SessState(s.nextId + 1, 0L, 0L, 0L, 0.0))
            Iterator.single(close(s))
          } else {
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Long, Long, Long, Double)]
            var st = state.getOption.getOrElse(SessState(1L, 0L, 0L, 0L, 0.0))
            rows.toArray
              .map { case (_, eid, ts, v) => (micros(ts), eid, v) }
              .sortBy(r => (r._1, r._2))
              .foreach { case (us, _, v) =>
                if (st.n == 0L) st = SessState(st.nextId, us, us, 1L, v)
                else if (us - st.lastUs > gapUs) {
                  out += close(st)
                  st = SessState(st.nextId + 1, us, us, 1L, v)
                } else st = st.copy(
                  startUs = math.min(st.startUs, us),
                  lastUs = math.max(st.lastUs, us),
                  n = st.n + 1, sum = st.sum + v)
              }
            state.update(st)
            if (st.n > 0L)
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1L,
                st.lastUs / 1000L + gapSecs * 1000L))
            out.iterator
          }
      }
  }

  /** Per-source running document/token totals via mapGroupsWithState —
    * the custom-state primitive (SURVEY §2.5 streaming row). Each
    * micro-batch folds its rows into the keyed state and emits the
    * updated totals (update output mode). */
  def runningSourceStats(docs: Dataset[(String, String)])
      : Dataset[(String, Long, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_._1)
      .mapGroupsWithState[SourceState, (String, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[(String, String)],
         state: GroupState[SourceState]) =>
          val prev = state.getOption.getOrElse(SourceState(0L, 0L))
          var d = prev.nDocs
          var t = prev.nTokens
          rows.foreach { case (_, text) =>
            d += 1
            t += Tokenizer.tokenize(text).length
          }
          state.update(SourceState(d, t))
          (source, d, t)
      }
  }

  /** Streaming count-min sketch — the online form of [[graft.pipeline.Cms]],
    * and the demonstration that SKETCH LINEARITY IS STREAMING
    * MERGEABILITY: each micro-batch pre-reduces its token occurrences
    * to a partition-local partial grid (a plain HashMap — at most
    * depth·width partials leave a partition no matter how many tokens
    * it scanned), and keyed state ADDS partials per cell. Because
    * count-min is linear (grid(A ∪ B) = grid(A) + grid(B) cell-wise),
    * the running state after any prefix of batches is EXACTLY the
    * batch sketch of the union frame — the law StreamingSpec asserts
    * against Cms.sketch, and the reason estimates from the streaming
    * grid carry the same ε/δ guarantee as the batch one.
    *
    * Emits every updated cell per batch (update semantics); state is
    * ≤ depth·width small records, key-partitioned by the state store.
    * Same md5-portable hash family and tokenization as the batch op
    * ([[graft.pipeline.Cms.bucket]]), so the grids are comparable
    * cell-for-cell. */
  def streamingCmsGrid(docs: Dataset[(Long, String)], depth: Int, width: Int)
      : Dataset[(Int, Int, Long)] = {
    require(depth >= 1 && width >= 1, s"bad grid $depth x $width")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .mapPartitions { it =>
        val partial = scala.collection.mutable.HashMap.empty[(Int, Int), Long]
        it.foreach { case (_, text) =>
          Option(text).getOrElse("").split(" ").foreach { w =>
            if (w.length >= 2) {
              var r = 0
              while (r < depth) {
                val cell = (r, graft.pipeline.Cms.bucket(r, w, width))
                partial(cell) = partial.getOrElse(cell, 0L) + 1L
                r += 1
              }
            }
          }
        }
        partial.iterator.map { case ((r, b), c) => (r, b, c) }
      }
      .groupByKey { case (r, b, _) => (r, b) }
      .mapGroupsWithState[Long, (Int, Int, Long)](
        GroupStateTimeout.NoTimeout) {
        (cell: (Int, Int), partials: Iterator[(Int, Int, Long)],
         state: GroupState[Long]) =>
          val add = partials.map(_._3).sum
          val total = state.getOption.getOrElse(0L) + add
          state.update(total)
          (cell._1, cell._2, total)
      }
  }
}
