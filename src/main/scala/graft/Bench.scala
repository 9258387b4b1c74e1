package graft

import org.apache.spark.sql.SparkSession

import graft.api.DocsIndex
import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.{DatasetCorpusSource, Synthesizer}

/** Bench main — driver contract: ONE JSON line
  * `{"metric":"total","value":sec,"unit":"sec","queries":{...},"sf":...}`
  * plus extra keys for the BASELINE.md metrics (BASELINE.json:2):
  *  - `build`: index-build report over the sfDir documents corpus
  *    (docs/sec, terms/sec, postings/sec, bytes compressed);
  *  - `synth_build`: the same over the 20k-doc synthetic code corpus
  *    (FIXTURES.md "small") — constant-size input, so two runs at
  *    different SPARK_GRAFT_CPUS measure scaling efficiency;
  *  - `query_p50_ms`/`query_p95_ms`: BM25 top-10 latency over a query
  *    mix, 20 iterations after 3 warm-ups.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    // ── headline: fresh index build over the sfDir documents corpus ──
    val (seg0, buildReport) = {
      val params = BuildParams(numPartitions = cpus.toInt, bucketSize = 1L << 12)
      SegmentBuilder.build(spark,
        DatasetCorpusSource(DocsIndex.corpus(spark, sfDir)), params)
    }
    seg0.unpersist()

    // ── headline: synthetic 20k-doc code-corpus build (scaling metric) ─
    val synthReport = {
      val params = BuildParams(numPartitions = cpus.toInt * 2, bucketSize = 1L << 12)
      val (seg, r) = SegmentBuilder.build(spark,
        DatasetCorpusSource(Synthesizer.small(spark)), params)
      seg.unpersist()
      r
    }

    // ── headline: BM25 top-10 latency over the warmed documents index ──
    val (_, searcher, _) = DocsIndex.get(spark, sfDir)
    val mix = Seq(
      ("FREE", "fast merge sort"), ("FREE", "key value hash table scan"),
      ("AND", "key AND value"), ("OR", "scan OR window OR batch"),
      ("FREE", "slow line"))
    (1 to 3).foreach(_ => mix.foreach { case (k, t) => searcher.hits(k, t, 10).collect() })
    val lats = (1 to 4).flatMap(_ => mix.map { case (k, t) =>
      val t0 = System.nanoTime()
      searcher.hits(k, t, 10).collect()
      secs(t0) * 1000.0
    }).sorted
    val p50 = lats(lats.size / 2)
    val p95 = lats(math.min(lats.size - 1, (lats.size * 95) / 100))

    // ── per-query timings (driver contract) ───────────────────────────
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> secs(t0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""sf":"$sfDir","cpus":$cpus,""" +
      s""""build":${buildReport.json},"synth_build":${synthReport.json},""" +
      s""""query_p50_ms":$p50,"query_p95_ms":$p95}""")
    spark.stop()
  }
}
