package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the time-series "most recent prior fact" join (Pandas
  * `merge_asof`, DuckDB `ASOF JOIN`, kdb+ `aj`): for each LEFT row, the
  * single RIGHT row of the same key with the largest timestamp STRICTLY
  * before the left timestamp (a right row at exactly the left ts does
  * not match — the pinned strict-< rule removes cross-side tie
  * ambiguity). */
object AsOf {

  /** Spark-first plan — the union + keyed-window carry-forward form,
    * NOT a join: both sides union with a side tag, ONE shuffle
    * partitions by key, and within each key's total (ts, side, id)
    * order the latest right row carries forward through a
    * `last(…, ignoreNulls)` window ending at `1 PRECEDING`. No pair
    * expansion and no range-join blowup: cost is one sort-shuffle of
    * |L|+|R| rows however many right rows precede each left row — at
    * 100 TB this is the only as-of shape that survives (an
    * inequality join would replicate each key's right history per left
    * row). Determinism: the window order is TOTAL — (ts asc, side asc
    * with left=0 < right=1, id asc) — so strict-< falls out of the
    * frame bound (equal-ts right rows sort after the left row, outside
    * its frame), right-side ties at one ts resolve to the largest id,
    * and the two carried columns (`prior_id`, `prior_ts`) come from the
    * SAME unique last row. Skew: a hot key serializes its own window
    * only — the sort is per-partition, keys never expand.
    *
    * Inputs carry (key, ts, id) under those names; the result keeps
    * every left row (left-outer semantics) with nullable `prior_id`/
    * `prior_ts` and the exact microsecond gap `gap_us`. */
  def asOfPrior(left: DataFrame, right: DataFrame): DataFrame = {
    // NTZ sources coerce to the session (UTC-pinned) instant type so the
    // microsecond arithmetic below type-checks identically either way
    val l = left.select(col("key"), col("ts").cast("timestamp").as("ts"),
        col("id"))
      .withColumn("side", lit(0))
      .withColumn("rid", lit(null).cast("long"))
      .withColumn("rts", lit(null).cast("timestamp"))
    val r = right.select(col("key"), col("ts").cast("timestamp").as("ts"),
        col("id"))
      .withColumn("side", lit(1))
      .withColumn("rid", col("id"))
      .withColumn("rts", col("ts"))
    val w = Window.partitionBy("key")
      .orderBy(col("ts").asc, col("side").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    l.unionByName(r)
      .withColumn("prior_id", last(col("rid"), ignoreNulls = true).over(w))
      .withColumn("prior_ts", last(col("rts"), ignoreNulls = true).over(w))
      .filter(col("side") === 0)
      .select(col("id"), col("key"), col("ts"), col("prior_id"),
        col("prior_ts"),
        (unix_micros(col("ts")) - unix_micros(col("prior_ts"))).as("gap_us"))
  }

  /** The FORWARD as-of join (X164 — Pandas `merge_asof`
    * direction='forward' with allow_exact_matches=False; pandas'
    * forward DEFAULT is inclusive, this is the strict variant — kdb+
    * window-join's leading edge): for each left row, the single right
    * row of the same key with the SMALLEST timestamp strictly after
    * the left timestamp. Same union + keyed-
    * window shape and cost as [[asOfPrior]] — one |L|+|R| sort-shuffle,
    * no pair expansion. Determinism mirrors the prior form with the
    * side encoding FLIPPED (right = 0 < left = 1): an equal-ts right
    * row sorts BEFORE the left row, outside its FOLLOWING frame, so
    * strict-> falls out of the frame bound; right ties at one future
    * ts resolve to the SMALLEST id via `first`. */
  def asOfNext(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("key"), col("ts").cast("timestamp").as("ts"),
        col("id"))
      .withColumn("side", lit(1))
      .withColumn("rid", lit(null).cast("long"))
      .withColumn("rts", lit(null).cast("timestamp"))
    val r = right.select(col("key"), col("ts").cast("timestamp").as("ts"),
        col("id"))
      .withColumn("side", lit(0))
      .withColumn("rid", col("id"))
      .withColumn("rts", col("ts"))
    val w = Window.partitionBy("key")
      .orderBy(col("ts").asc, col("side").asc, col("id").asc)
      .rowsBetween(1, Window.unboundedFollowing)
    l.unionByName(r)
      .withColumn("next_id", first(col("rid"), ignoreNulls = true).over(w))
      .withColumn("next_ts", first(col("rts"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("id"), col("key"), col("ts"), col("next_id"),
        col("next_ts"),
        (unix_micros(col("next_ts")) - unix_micros(col("ts"))).as("gap_us"))
  }
}
