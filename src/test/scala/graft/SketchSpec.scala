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

  // count-min, unlike the two sketches above, IS cross-engine-exact
  // (md5-portable hashes, integer counters) — so it gets both a DuckDB
  // twin (cms_topterms) and cell-level brute-force checks here.

  private def cmsDocs = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta beta gamma x"), // 'x' drops (len < 2)
      (2L, "alpha alpha delta epsilon"),
      (3L, "beta gamma gamma gamma zeta kappa"),
      (4L, ""))
      .toDF("doc_id", "text")
  }

  private def cmsTokens: Seq[String] =
    Seq("alpha", "beta", "beta", "gamma", "alpha", "alpha", "delta",
      "epsilon", "beta", "gamma", "gamma", "gamma", "zeta", "kappa")

  test("count-min grid equals the brute-force grid; estimates are exact " +
       "per the min-over-rows rule and never under the true count") {
    import graft.pipeline.Cms
    import spark.implicits._
    val p = Cms.Params(depth = 3, width = 8) // tiny width forces collisions
    val grid = Cms.sketch(cmsDocs, p).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val counts = cmsTokens.groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
    val bruteGrid = (for {
      i <- 0 until p.depth
      (t, c) <- counts.toSeq // toSeq: a Map here would collapse colliding cells
    } yield ((i, Cms.bucket(i, t, p.width)), c))
      .groupBy(_._1).map { case (cell, xs) => (cell, xs.map(_._2).sum) }
    assert(grid == bruteGrid)
    val est = Cms.estimate(Cms.sketch(cmsDocs, p),
        counts.keys.toSeq.toDF("term"), p)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    counts.foreach { case (t, c) =>
      val want = (0 until p.depth)
        .map(i => bruteGrid((i, Cms.bucket(i, t, p.width)))).min
      assert(est(t) == want, s"$t est ${est(t)} != brute $want")
      assert(est(t) >= c, s"$t est ${est(t)} under true $c")
    }
    // a probe absent from the corpus still answers (possibly 0)
    val miss = Cms.estimate(Cms.sketch(cmsDocs, p),
        Seq("nosuchterm").toDF("term"), p)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(miss.keySet == Set("nosuchterm") && miss("nosuchterm") >= 0L)
  }

  test("count-min is mergeable (cellwise sum) and parallelism-invariant") {
    import graft.pipeline.Cms
    val p = Cms.Params(depth = 3, width = 8)
    def gridOf(df: org.apache.spark.sql.DataFrame) =
      Cms.sketch(df, p).collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val whole = gridOf(cmsDocs)
    val a = gridOf(cmsDocs.filter(col("doc_id") <= 2))
    val b = gridOf(cmsDocs.filter(col("doc_id") > 2))
    val merged = (a.keySet ++ b.keySet)
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(whole == merged)
    assert(gridOf(cmsDocs.repartition(7)) == whole)
    intercept[IllegalArgumentException](Cms.Params(depth = 0))
    intercept[IllegalArgumentException](Cms.Params(width = 0))
  }
}
