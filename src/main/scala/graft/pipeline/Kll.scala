package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** KLL-style mergeable quantile sketch (Karnin, Lang & Liberty,
  * "Optimal quantile approximation in streams", FOCS'16; lineage back
  * to Manku-Rajagopalan-Lindsay SIGMOD'98) — the quantile member of
  * the portable sketch family (count-min = frequency, Bloom =
  * membership, KMV = distinct count, this = rank/quantile), for value
  * domains too large or continuous for the exact bounded-histogram
  * regime (X82) that the engine uses whenever the domain allows.
  *
  * Structure: a ladder of compactors; level h holds items of weight
  * 2^h. An over-full level sorts itself and promotes every other item
  * to level h+1 (halving), alternating the kept parity per compaction
  * — the DETERMINISTIC compaction variant (Lang's "KLL without
  * randomness" practice): reproducible for a fixed input order, at the
  * cost of the randomized worst-case proof; accuracy is gated
  * empirically in KllSpec instead (rank error well under 2/k on the
  * driver testdata at k=200).
  *
  * Scale shape: one `mapPartitions` builds a per-partition sketch (a
  * few KB — k doubles per level, O(log(n/k)) levels); partition
  * sketches come to the driver ORDERED BY PARTITION INDEX and fold
  * left-to-right, so the result is a pure function of (data, its
  * partitioning) — rerunning the same frame reproduces the sketch
  * bit-for-bit. At extreme partition counts the same merge runs as a
  * treeAggregate with identical error bounds (merge is the algebra's
  * own operation); the index-ordered driver fold is chosen here for
  * reproducibility, and even 10⁵ partitions ship only ~100 MB total.
  */
object Kll {

  /** `levels(h)` holds UNSORTED items of weight 2^h; `parity(h)` is the
    * alternating keep-parity for the next compaction of level h. */
  final case class Sketch(k: Int, levels: Vector[Vector[Double]],
                          parity: Vector[Boolean], count: Long) {

    def insert(x: Double): Sketch =
      copy(levels = levels.updated(0, levels(0) :+ x), count = count + 1)
        .compactIfNeeded()

    /** Compact every over-full level bottom-up. Capacity is k at every
      * level (the fixed-size compactor simplification — the classic
      * MRL shape; KLL's shrinking caps only tighten constants). */
    @annotation.tailrec
    private def compactIfNeeded(): Sketch = {
      val h = levels.indexWhere(_.length >= k)
      if (h < 0) this
      else {
        val sorted = levels(h).sorted
        val keepOdd = parity(h)
        val promoted = sorted.indices.collect {
          case i if (i % 2 == 1) == keepOdd => sorted(i)
        }.toVector
        val withNext =
          if (h + 1 < levels.length) levels
          else levels :+ Vector.empty[Double]
        val nextParity =
          if (h + 1 < parity.length) parity else parity :+ false
        copy(
          levels = withNext
            .updated(h, Vector.empty[Double])
            .updated(h + 1, withNext(h + 1) ++ promoted),
          parity = nextParity.updated(h, !keepOdd))
          .compactIfNeeded()
      }
    }

    /** Merge: concatenate level-wise, then restore capacity. The
      * algebra's own combine — associative up to compaction order,
      * with the SAME error bound (each item's weight is preserved). */
    def merge(other: Sketch): Sketch = {
      require(k == other.k, s"k mismatch: $k vs ${other.k}")
      val n = math.max(levels.length, other.levels.length)
      def lvl(s: Sketch, h: Int) =
        if (h < s.levels.length) s.levels(h) else Vector.empty[Double]
      Sketch(k,
        Vector.tabulate(n)(h => lvl(this, h) ++ lvl(other, h)),
        Vector.tabulate(n)(h =>
          (h < parity.length && parity(h)) ^
            (h < other.parity.length && other.parity(h))),
        count + other.count)
        .compactIfNeeded()
    }

    /** Estimated rank of `x`: weighted count of stored items ≤ x. */
    def rank(x: Double): Long =
      levels.zipWithIndex.map { case (items, h) =>
        items.count(_ <= x).toLong << h
      }.sum

    /** Approximate q-quantile (q in [0, 1]): the smallest stored value
      * whose estimated rank covers q·count. */
    def quantile(q: Double): Double = {
      require(q >= 0.0 && q <= 1.0, s"quantile out of range: $q")
      require(count > 0, "empty sketch")
      val weighted = levels.zipWithIndex.flatMap { case (items, h) =>
        items.map(x => (x, 1L << h))
      }.sortBy(_._1)
      val target = math.max(1L, math.ceil(q * count).toLong)
      var acc = 0L
      var i = 0
      while (i < weighted.length) {
        acc += weighted(i)._2
        if (acc >= target) return weighted(i)._1
        i += 1
      }
      weighted.last._1
    }

    /** Total stored items — the memory footprint certificate. */
    def size: Int = levels.map(_.length).sum
  }

  def empty(k: Int): Sketch = {
    require(k >= 8, s"k must be >= 8, got $k")
    Sketch(k, Vector(Vector.empty), Vector(false), 0L)
  }

  def fromIterator(k: Int, it: Iterator[Double]): Sketch =
    it.foldLeft(empty(k))(_ insert _)

  /** Sketch one numeric column of a DataFrame. Deterministic for a
    * fixed (data, partitioning) — see class doc. */
  def sketch(df: DataFrame, column: String, k: Int = 200): Sketch = {
    val ds: Dataset[Double] = {
      import df.sparkSession.implicits._
      df.select(col(column).cast("double")).na.drop().as[Double]
    }
    val parts = ds.rdd
      .mapPartitionsWithIndex { (idx, it) =>
        Iterator.single((idx, fromIterator(k, it)))
      }
      .collect()
      .sortBy(_._1)
      .map(_._2)
    parts.foldLeft(empty(k))(_ merge _)
  }
}
