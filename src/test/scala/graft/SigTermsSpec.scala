package graft

import graft.api.DocsIndex

/** Significant-terms aggregation (DocsIndex.significantTerms): planted
  * foreground-only vocabulary ranks top, the JLH filter drops terms at
  * or below background rate, and the brute-force recomputation agrees. */
class SigTermsSpec extends SparkSpec {

  lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-sig").toString
    // docs 0-2 match "anchor"; "signal" lives ONLY in those docs (max
    // significance), "noise" is uniform everywhere (zero significance),
    // "partial" leans foreground but also appears outside it
    val rows = Seq(
      (0L, "anchor signal partial noise alpha", "en", "s0"),
      (1L, "anchor signal noise beta gamma", "en", "s0"),
      (2L, "anchor signal partial noise delta", "en", "s0"),
      (3L, "epsilon partial noise zeta eta", "en", "s0"),
      (4L, "theta iota noise kappa lambda", "en", "s0"),
      (5L, "mu nu noise xi omicron", "en", "s0"))
    rows.toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("foreground-only terms top the ranking; uniform terms drop out") {
    val got = DocsIndex.significantTerms(spark, dir, "FREE", "anchor", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val byTerm = got.map(t => t._1 -> t).toMap
    // signal: fgPct 1.0 vs bgPct 0.5 → JLH (1−0.5)·(1/0.5) = 1.0; anchor
    // scores identically (it IS the query) — ties break term-asc
    assert(got.take(2).map(_._1).toSeq == Seq("anchor", "signal"), got.toSeq)
    assert(byTerm("signal")._4 == 1.0 && byTerm("signal")._2 == 3L &&
      byTerm("signal")._3 == 3L)
    // noise appears in every doc: fgPct == bgPct == 1 → filtered out
    assert(!byTerm.contains("noise"))
    // partial: fg 2/3 vs bg 3/6 → (2/3 − 1/2)·((2/3)/(1/2)) = 2/9
    assert(byTerm("partial")._4 == math.floor(2.0 / 9.0 * 1e6 + 0.5) / 1e6)
  }

  test("brute force over the real corpus agrees") {
    val sf = "/root/testdata/sf0.001"
    val got = DocsIndex.significantTerms(spark, sf, "FREE", "fast merge", 15)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // brute force: tokenize everything driver-side (600 docs)
    val docs = DocsIndex.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> graft.tokenize.Tokenizer
        .tokenize(r.getString(1)).toSet)
    val n = docs.length.toDouble
    val fgDocs = docs.filter { case (_, ts) => ts("fast") || ts("merge") }
    val fgN = fgDocs.length.toDouble
    val bgDf = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length)
    val want = fgDocs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length).toSeq
      .map { case (t, fg) =>
        val (fp, bp) = (fg / fgN, bgDf(t) / n)
        (t, fg.toLong, bgDf(t).toLong,
          math.floor((fp - bp) * (fp / bp) * 1e6 + 0.5) / 1e6, fp > bp)
      }
      .filter(_._5).map(x => (x._1, x._2, x._3, x._4))
      .sortBy(x => (-x._4, x._1)).take(15)
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("no-match and OOV queries return the empty frame") {
    val out = DocsIndex.significantTerms(spark, dir, "FREE", "zzznothere", 10)
    assert(out.columns.toSeq == Seq("term", "fg_df", "bg_df", "sig"))
    assert(out.count() == 0L)
  }
}
