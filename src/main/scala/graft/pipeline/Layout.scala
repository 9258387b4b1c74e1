package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) storage-layout clustering — the Delta Lake
  * `OPTIMIZE ZORDER BY` / Hudi clustering class of operator (Morton
  * 1966; Orenstein & Merrett PODS'84 introduced the curve for range
  * queries): interleave the bits of two rank-normalized columns so
  * rows close in EITHER dimension land close in the one-dimensional
  * layout, then cut the curve into files. Data skipping is the point:
  * per-file min/max stats over BOTH dimensions stay narrow, so a scan
  * filtered on either column prunes most files — at 100 TB the
  * difference between reading 2% and 100% of row groups.
  *
  * Determinism/portability: dimension 1 is the DENSE RANK of `source`
  * in lexical order (a reduced, broadcastable table), dimension 2 is
  * `n_chars` capped to 16 bits; the interleave is exact integer bit
  * arithmetic, so the whole layout has a byte-equal SQL twin.
  *
  * Scale posture: the z-value is a NARROW pass (the rank table is
  * |sources|-sized and broadcast); file assignment here is the
  * hierarchical bit-PREFIX rule (file = top log2(nFiles) bits of z) —
  * zero shuffles, no global sort; a production write would instead
  * `repartitionByRange($"z")` for evenly-sized files (one range
  * shuffle — exactly what Delta's OPTIMIZE pays), which preserves the
  * same curve order and therefore the same skipping behavior. The
  * per-file stats audit is one reduced aggregation.
  */
object Layout {

  /** Interleave the low 16 bits of x (even positions) and y (odd
    * positions) — the driver/test twin of the column rule. */
  def interleave16(x: Long, y: Long): Long = {
    var z = 0L
    var b = 0
    while (b < 16) {
      z |= ((x >>> b) & 1L) << (2 * b)
      z |= ((y >>> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }

  /** (doc_id, z, file) for a (doc_id, source, n_chars) table: each
    * dimension is min-max scaled to the FULL 16-bit range first (the
    * step Delta's ZORDER does with per-column range-partition ids —
    * without it low-magnitude dimensions never reach the curve's high
    * bits and every row lands in one file), then interleaved; file =
    * the top log2(nFiles) bits of z. `nFiles` must be a power of two
    * ≤ 2^16. Dimension stats are ONE reduced agg (|sources| count,
    * n_chars min/max — three Longs to the driver). */
  def zorder(docs: DataFrame, nFiles: Int): DataFrame = {
    require(nFiles >= 1 && (nFiles & (nFiles - 1)) == 0 && nFiles <= (1 << 16),
      s"nFiles must be a power of two in [1, 65536], got $nFiles")
    val spark = docs.sparkSession
    val shift = 32 - Integer.numberOfTrailingZeros(nFiles)
    val ranks = docs.select(col("source")).distinct()
      .withColumn("xr",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("source"))) - 1).cast("long"))
    val nSources = ranks.count()
    val mm = docs.agg(min(col("n_chars")), max(col("n_chars"))).head()
    if (mm.isNullAt(0)) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Long)].toDF("doc_id", "z", "file")
    }
    val (ncLo, ncHi) = (mm.getLong(0), mm.getLong(1))
    val xs =
      if (nSources > 1) expr(s"CAST(xr * 65535 div ${nSources - 1} AS BIGINT)")
      else lit(0L)
    val ys =
      if (ncHi > ncLo)
        expr(s"CAST((n_chars - $ncLo) * 65535 div ${ncHi - ncLo} AS BIGINT)")
      else lit(0L)
    val z = expr(
      """aggregate(sequence(0, 15), 0L, (acc, b) ->
        |  acc + shiftleft(shiftright(xs, b) & 1, 2 * b)
        |      + shiftleft(shiftright(ys, b) & 1, 2 * b + 1))""".stripMargin)
    docs.join(broadcast(ranks), "source")
      .withColumn("xs", xs).withColumn("ys", ys)
      .withColumn("z", z)
      .select(col("doc_id"), col("z"),
        shiftright(col("z"), shift).cast("long").as("file"))
  }

  /** Per-file skipping stats for a layout assignment joined back to the
    * dimensions: how many docs, how many distinct sources, and the
    * n_chars span each file would carry — narrow ranges = effective
    * pruning. `layout` labels the strategy so two layouts compare in
    * one table. */
  def fileStats(docs: DataFrame, assign: DataFrame, layout: String): DataFrame =
    docs.join(assign, "doc_id")
      .groupBy(col("file"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        min(col("n_chars")).as("nc_lo"), max(col("n_chars")).as("nc_hi"))
      .withColumn("layout", lit(layout))
      .select(col("layout"), col("file"), col("n_docs"), col("n_sources"),
        col("nc_lo"), col("nc_hi"))
}
