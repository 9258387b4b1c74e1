package graft

import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation rungs, gated against their exact
  * twins (the ann_lsh posture for approximate operators):
  *
  *  - `approx_percentile` (Greenwald-Khanna) vs the exact sort-based
  *    `percentile` the q_percentile driver query oracle-checks. At 100 TB
  *    the exact form is a full sort per group; the GK sketch is one
  *    narrow pass with a mergeable bounded-size summary — the scale path.
  *  - `approx_count_distinct` (HyperLogLog++) vs exact countDistinct.
  *    Exact distinct is a corpus-scale shuffle on the key; HLL carries a
  *    fixed-size register set through a partial+final agg.
  *
  * Both sketches are deterministic for a given input (no RNG), but not
  * cross-engine-reproducible — hence scalatest error-bound gates instead
  * of DuckDB twins. */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("approx_percentile tracks exact percentile within its accuracy bound") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    // accuracy 10000 => rank error <= n/10000; testdata n is small enough
    // that the sketch should land within 1% of the exact value
    val rows = li.groupBy(col("l_returnflag")).agg(
        expr("percentile(l_extendedprice, 0.5)").as("exact"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, approx) = (r.getDouble(1), r.getDouble(2))
      val spread = r.getDouble(4) - r.getDouble(3)
      assert(math.abs(approx - exact) <= 0.01 * spread,
        s"${r.getString(0)}: approx $approx vs exact $exact (spread $spread)")
    }
  }

  test("approx_count_distinct (HLL++) within 5% of exact distinct terms") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) >= 2)
    val row = toks.agg(
        countDistinct(col("term")).as("exact"),
        approx_count_distinct(col("term"), 0.02).as("approx"))
      .collect().head
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(exact > 0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx $approx vs exact $exact")
  }
}
