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
}
