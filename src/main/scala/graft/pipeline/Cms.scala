package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch frequency estimation over the token stream
  * (Cormode & Muthukrishnan, "An improved data stream summary: the
  * count-min sketch and its applications", J. Algorithms 55(1), 2005):
  * a depth×width counter grid where every token occurrence increments
  * one counter per row (row i's counter chosen by hash h_i), and a
  * term's frequency estimate is the MINIMUM of its depth counters —
  * always ≥ the true count (collisions only add), ≤ true + εN with
  * probability 1−δ at width=⌈e/ε⌉, depth=⌈ln 1/δ⌉. The fixed-memory
  * sibling of the exact dictionary (`ft_topterms`): at 100 TB the grid
  * stays depth·width cells NO MATTER the corpus or vocabulary size.
  *
  * Scale posture: per-doc tokens form in a narrow pass (a doc's text is
  * ONE row), each occurrence emits `depth` (row, bucket) cells, and ONE
  * bounded hash agg partial+final-combines them to ≤ depth·width output
  * rows — the map-side combine means each partition ships at most
  * depth·width partials regardless of how many tokens it scanned
  * (count-min's linearity is exactly what makes it map-side
  * combinable). Estimation touches only the grid (≤ depth·width rows)
  * and the probe list (query-sized): broadcast joins, never a second
  * corpus pass.
  *
  * Everything is `org.apache.spark.sql.functions` built-ins (md5/conv/
  * substring stay inside whole-stage codegen), and the hash family is
  * the repo's md5-portable one — h_i(term) = md5("i:term") 15-hex
  * prefix mod width — so the DuckDB twin computes the IDENTICAL grid.
  */
object Cms {

  final case class Params(depth: Int = 4, width: Int = 512) {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 1, s"width must be >= 1, got $width")
  }

  /** The fulltext tokenization convention (split on ' ', drop tokens
    * shorter than 2 chars) shared with the SQL twins verbatim. */
  private def words = filter(split(col("text"), " "), w => length(w) >= 2)

  /** h_row(term) — the driver/test twin of [[bucketCol]]. */
  def bucket(row: Int, term: String, width: Int): Int =
    (PortableHash.md5HexPrefixLong(s"$row:$term", 15) % width).toInt

  private def bucketCol(row: Column, term: Column, width: Int): Column =
    (conv(substring(md5(concat(row.cast("string"), lit(":"), term)), 1, 15),
      16, 10).cast("long") % width).cast("int")

  /** The depth×width counter grid as a (row, bucket, cnt) table over a
    * (doc_id, text) corpus; absent cells are zero. */
  def sketch(docs: DataFrame, p: Params): DataFrame =
    docs.select(explode(words).as("term"))
      .select(explode(sequence(lit(0), lit(p.depth - 1))).as("row"), col("term"))
      .select(col("row"), bucketCol(col("row"), col("term"), p.width).as("bucket"))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for a probe-term table (column `term`):
    * est(t) = min over rows of grid[row][h_row(t)], a never-written
    * cell reading 0. Both join sides are tiny (grid ≤ depth·width,
    * probes query-sized). */
  def estimate(grid: DataFrame, probes: DataFrame, p: Params): DataFrame =
    probes.select(col("term"),
        explode(sequence(lit(0), lit(p.depth - 1))).as("row"))
      .withColumn("bucket", bucketCol(col("row"), col("term"), p.width))
      .join(grid, Seq("row", "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy("term").agg(min(col("cnt")).as("est"))
}
