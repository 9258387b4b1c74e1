package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the remaining flagship Structured
  * Streaming operator next to windowed aggregation (StreamStats),
  * keyed state (sessionize/dedup), and ingestion (StreamIndexer):
  * two UNBOUNDED streams joined on a key plus an event-time range.
  *
  * State boundedness is the whole design: both inputs carry a
  * watermark, and the join condition constrains the two event times to
  * a finite band, so Spark can prove when a buffered row can never
  * match again and evict it — without both, a stream-stream join's
  * state grows forever. State partitions by the join key across
  * executors like any shuffle; nothing is driver-resident.
  *
  * Batch/stream parity: on a bounded frame the same expression runs as
  * a plain join (watermarks are no-ops), and StreamingSpec asserts the
  * MemoryStream-driven result is row-identical to the scale-bucketed
  * batch form [[graft.pipeline.Events.bandJoin]] — three independent
  * evaluations (streaming interval join, bucketed batch join, DuckDB
  * twin of `q_band_join`) of one pinned semantics.
  */
object StreamJoin {

  /** All same-user (A, B) event pairs with B in [A.ts − windowSecs,
    * A.ts], over two (possibly streaming) frames with columns
    * (event_id, user_id, ts). Output columns match
    * [[graft.pipeline.Events.bandJoin]]. */
  def intervalJoin(aEvents: DataFrame, bEvents: DataFrame,
                   windowSecs: Long, watermark: String = "1 hour"): DataFrame = {
    require(windowSecs >= 1, s"join window must be >= 1s, got $windowSecs")
    val a = aEvents
      .select(col("event_id").as("a_event_id"),
        col("user_id").as("a_user_id"), col("ts").as("a_ts"))
      .withWatermark("a_ts", watermark)
    val b = bEvents
      .select(col("event_id").as("b_event_id"),
        col("user_id").as("b_user_id"), col("ts").as("b_ts"))
      .withWatermark("b_ts", watermark)
    a.join(b,
        col("a_user_id") === col("b_user_id") &&
          col("b_ts") >= col("a_ts") - expr(s"INTERVAL $windowSecs SECONDS") &&
          col("b_ts") <= col("a_ts"))
      .select(col("a_event_id"), col("b_event_id"),
        col("a_user_id").as("user_id"),
        (unix_micros(col("a_ts")) - unix_micros(col("b_ts"))).as("gap_us"))
  }

  /** Stream-static enrichment join (X176) — the remaining Structured
    * Streaming join shape next to [[intervalJoin]]'s stream-stream
    * form: an unbounded event stream inner-joined against a BOUNDED
    * dimension table (user → segment label here). No watermark is
    * required — the static side never grows, so there is no join state
    * to evict: each micro-batch joins against the (broadcastable)
    * dimension and emits immediately, which is why this is THE join
    * every streaming enrichment pipeline starts with.
    *
    * Batch/stream parity: on a bounded frame the same expression is a
    * plain inner join; StreamingSpec asserts the MemoryStream-driven
    * result equals the batch join row-for-row. */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"))
      .join(dim.select(col("user_id"), col("segment")), Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("segment"))
}
