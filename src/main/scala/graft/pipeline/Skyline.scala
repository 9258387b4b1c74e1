package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed 2-D skyline (Pareto frontier) — the multi-objective
  * filter of Börzsönyi/Kossmann/Stocker, "The Skyline Operator"
  * (ICDE'01): keep every row not DOMINATED by another, where b
  * dominates a iff b is ≥ on the maximized dimension AND ≤ on the
  * minimized one, strictly better on at least one. Identical points do
  * not dominate each other (no strict side), so exact duplicates all
  * survive — the same reading as the `NOT EXISTS` relational twin.
  *
  * Plan, built for scale (the classic two-phase MR-skyline shape,
  * Zhang et al. "Efficient Parallel Skyline Evaluation"-lineage):
  *  - Phase 1 sorts WITHIN each partition by (maxDim desc, minDim asc)
  *    and sweeps once per partition: a size group survives iff its
  *    minimum price beats the running minimum over all strictly larger
  *    sizes. No shuffle — `sortWithinPartitions` + `mapPartitions`,
  *    and the local skyline of a partition is a superset-free pruned
  *    candidate set (local non-skyline rows are dominated by a row in
  *    the SAME partition, so they can never be global skyline).
  *  - Phase 2 repeats the identical sweep over the union of local
  *    skylines in one task. For a 2-D skyline the candidate set is
  *    bounded by Σ per-partition frontier sizes — on real (even mildly
  *    correlated) data orders of magnitude below the input; a
  *    perfectly anti-correlated adversary degrades to the input size,
  *    which is the known lower bound for ANY exact skyline, not a
  *    plan defect.
  *
  * Determinism: the sweep compares with exact (Int, Double) ordering,
  * no arithmetic is performed — output values are input values, so
  * cross-engine equality is bytewise, no rounding rule needed.
  */
object Skyline {

  /** The one-pass sweep over rows sorted by (size desc, price asc):
    * emits (id, size, price) rows whose price is strictly below every
    * strictly-larger size's minimum AND minimal within their own size
    * group. Input iterator MUST be sorted (size desc, price asc). */
  private def sweep(rows: Iterator[(Long, Int, Double)])
      : Iterator[(Long, Int, Double)] = new Iterator[(Long, Int, Double)] {
    private val it = rows.buffered
    private var runningMin = Double.PositiveInfinity
    private var pending: Iterator[(Long, Int, Double)] = Iterator.empty
    private def advance(): Unit = {
      while (!pending.hasNext && it.hasNext) {
        val size = it.head._2
        // collect the whole size group (sorted price asc ⇒ head is min)
        val group = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Double)]
        while (it.hasNext && it.head._2 == size) group += it.next()
        val groupMin = group.head._3
        if (groupMin < runningMin) {
          pending = group.iterator.takeWhile(_._3 == groupMin)
          runningMin = groupMin
        }
      }
    }
    def hasNext: Boolean = { advance(); pending.hasNext }
    def next(): (Long, Int, Double) = { advance(); pending.next() }
  }

  /** Three-criteria skyline via SFS (sort-filter-skyline, Chomicki,
    * Godfrey, Gryz & Liang ICDE'03): maximize `maxCol`, minimize both
    * `minColA` and `minColB`. Rows sorted by (max desc, minA asc,
    * minB asc) have the property that every potential dominator of a
    * row PRECEDES it (a dominator is ≥ on the sort-leading dimension,
    * and within ties ≤ on the tie-broken ones), so one scan comparing
    * each row against the CURRENT frontier — output-sensitive, never
    * all-pairs — decides membership exactly.
    *
    * Same two-phase shape as [[skyline]]: partition-local SFS (no
    * shuffle; local non-skyline rows are dominated within their own
    * partition, so they can never be global skyline), then the same
    * scan over the pruned candidate union in one task. The frontier
    * comparisons per row are bounded by the FINAL skyline size — the
    * output-sensitivity that makes SFS the standard beyond 2-D, where
    * the X141 running-minimum sweep no longer applies. */
  def skyline3(df: DataFrame, idCol: String, maxCol: String,
               minColA: String, minColB: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def dominates(b: (Long, Int, Double, Long), a: (Long, Int, Double, Long)): Boolean =
      b._2 >= a._2 && b._3 <= a._3 && b._4 <= a._4 &&
        (b._2 > a._2 || b._3 < a._3 || b._4 < a._4)
    def sfs(rows: Iterator[(Long, Int, Double, Long)])
        : Iterator[(Long, Int, Double, Long)] = {
      val frontier = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Double, Long)]
      rows.filter { r =>
        val keep = !frontier.exists(f => dominates(f, r))
        if (keep) frontier += r
        keep
      }
    }
    val typed = df.select(col(idCol).cast("long"), col(maxCol).cast("int"),
        col(minColA).cast("double"), col(minColB).cast("long"))
      .as[(Long, Int, Double, Long)]
    val local = typed
      .sortWithinPartitions(col(maxCol).desc, col(minColA).asc, col(minColB).asc)
      .mapPartitions(sfs)
    local
      .repartition(1)
      .sortWithinPartitions(col("_2").desc, col("_3").asc, col("_4").asc)
      .mapPartitions(sfs)
      .toDF(idCol, maxCol, minColA, minColB)
  }

  /** Skyline of `df`'s (idCol, maxCol: int, minCol: double) — maximize
    * `maxCol`, minimize `minCol`. Returns (id, maxCol, minCol) with the
    * input column names preserved. */
  def skyline(df: DataFrame, idCol: String, maxCol: String,
              minCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(col(idCol).cast("long"), col(maxCol).cast("int"),
      col(minCol).cast("double")).as[(Long, Int, Double)]

    val local = typed
      .sortWithinPartitions(col(maxCol).desc, col(minCol).asc)
      .mapPartitions(sweep)
    // phase 2: the reduced candidate set, one final sweep in one task
    val out = local
      .repartition(1)
      .sortWithinPartitions(col("_2").desc, col("_3").asc)
      .mapPartitions(sweep)
    out.toDF(idCol, maxCol, minCol)
  }
}
