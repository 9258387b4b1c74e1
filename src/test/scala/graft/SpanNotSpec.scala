package graft

import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.{DatasetCorpusSource, Synthesizer}
import graft.search.Searcher
import graft.tokenize.Tokenizer

/** Span-not queries (Lucene SpanNotQuery, single-term form): match =
  * at least one include occurrence with no exclude occurrence within
  * the ±window; score = BM25 of the include term alone
  * (filter-doesn't-rescale). Checked against a position-level brute
  * force, the window collapse laws (0 → plain term query; ≥ doc length
  * → boolean `inc AND NOT exc`), OOV behavior, and validation. */
class SpanNotSpec extends SparkSpec {

  lazy val seg = SegmentBuilder.build(spark,
    DatasetCorpusSource(Synthesizer.tiny(spark)),
    BuildParams(numPartitions = 4, bucketSize = 64, positional = true))._1
  lazy val searcher = new Searcher(spark, seg)
  lazy val toksByDoc: Map[Long, Array[String]] = {
    import org.apache.spark.sql.functions.col
    val c = Synthesizer.tiny(spark).toDF()
      .select(col("repo"), col("path"), col("content"))
    import spark.implicits._
    seg.docs.join(c, Seq("repo", "path"))
      .select(col("docId"), col("content")).as[(Long, String)]
      .collect().map { case (d, t) => d -> Tokenizer.tokenize(t) }.toMap
  }

  /** A (inc, exc) pair that exercises all three regimes: docs with inc
    * and no exc, docs where some inc occurrence escapes the window, and
    * docs fully covered. */
  private lazy val pair: (String, String) = {
    val freq = toksByDoc.values.flatMap(_.distinct)
      .groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (t, n) => (-n, t) }
    (freq.head._1, freq(1)._1)
  }

  private def brute(inc: String, exc: String, w: Int): Set[Long] =
    toksByDoc.collect { case (d, toks)
      if {
        val ps = toks.iterator.zipWithIndex
          .collect { case (t, i) if t == inc => i + 1 }.toArray
        val qs = toks.iterator.zipWithIndex
          .collect { case (t, i) if t == exc => i + 1 }.toArray
        ps.exists(p => !qs.exists(q => q >= p - w && q <= p + w))
      } => d
    }.toSet

  test("spanNotHits == brute-force position filter of the term ranking") {
    val (inc, exc) = pair
    val termHits = searcher.hitsExhaustive("FREE", inc,
      seg.stats.numDocs.toInt).collect()
    for (w <- Seq(0, 1, 3, 10, 100000)) {
      val ok = brute(inc, exc, w)
      val want = termHits.filter(h => ok(h.docId))
        .sortBy(h => (-h.score, h.docId)).take(10)
        .map(h => (h.docId, h.score)).toSeq
      val got = searcher.spanNotHits(inc, exc, w, 10).collect()
        .map(h => (h.docId, h.score)).toSeq
      assert(got == want, s"w=$w")
    }
  }

  test("window collapse laws: 0 == plain term; huge == BOOL AND NOT") {
    val (inc, exc) = pair
    // w=0: two distinct terms never share a position -> nothing excluded
    val zero = searcher.spanNotHits(inc, exc, 0, 10).collect()
      .map(h => (h.docId, h.score)).toSeq
    val plain = searcher.hits("FREE", inc, 10).collect()
      .map(h => (h.docId, h.score)).toSeq
    assert(zero == plain && zero.nonEmpty)
    // w >= max doc length: any co-occurring doc is fully excluded
    val huge = searcher.spanNotHits(inc, exc, 1000000, 10).collect()
      .map(h => (h.docId, h.score)).toSeq
    val boolNot = searcher.hits("BOOL", s"$inc AND NOT $exc", 10).collect()
      .map(h => (h.docId, h.score)).toSeq
    assert(huge == boolNot)
    // the middle window sits strictly between the two collapses
    assert(brute(inc, exc, 1000000).subsetOf(brute(inc, exc, 3)) &&
      brute(inc, exc, 3).subsetOf(brute(inc, exc, 0)))
  }

  test("serving-tier span-not == relational span-not, bit-identical") {
    val (inc, exc) = pair
    val srv = new graft.search.ServingSearcher(spark, seg)
    try {
      for (w <- Seq(0, 3, 100000)) {
        val rel = searcher.spanNotHits(inc, exc, w, 10).collect()
          .map(h => (h.docId, h.score)).toSeq
        val got = srv.spanNotHits(inc, exc, w, 10)
          .map(h => (h.docId, h.score)).toSeq
        assert(got == rel, s"w=$w")
      }
      // OOV exclude degenerates identically on both tiers
      val relOov = searcher.spanNotHits(inc, "zzznotaterm", 3, 10).collect()
        .map(h => (h.docId, h.score)).toSeq
      assert(srv.spanNotHits(inc, "zzznotaterm", 3, 10)
        .map(h => (h.docId, h.score)).toSeq == relOov)
      assert(srv.spanNotHits("zzznotaterm", inc, 3, 10).isEmpty)
    } finally srv.close()
  }

  test("OOV: exclude degenerates to the plain query; include is empty") {
    val (inc, _) = pair
    val got = searcher.spanNotHits(inc, "zzznotaterm", 3, 10).collect()
      .map(h => (h.docId, h.score)).toSeq
    val plain = searcher.hits("FREE", inc, 10).collect()
      .map(h => (h.docId, h.score)).toSeq
    assert(got == plain)
    assert(searcher.spanNotHits("zzznotaterm", inc, 3, 10).isEmpty)
  }

  test("validation: multi-term, identical terms, window, non-positional") {
    val (inc, exc) = pair
    intercept[IllegalArgumentException] {
      searcher.spanNotHits(s"$inc $exc", exc, 3, 10)
    }
    intercept[IllegalArgumentException] {
      searcher.spanNotHits(inc, inc, 3, 10)
    }
    intercept[IllegalArgumentException] {
      searcher.spanNotHits(inc, exc, -1, 10)
    }
    val flat = SegmentBuilder.build(spark,
      DatasetCorpusSource(Synthesizer.tiny(spark)),
      BuildParams(numPartitions = 2, bucketSize = 64, positional = false))._1
    intercept[IllegalArgumentException] {
      new Searcher(spark, flat).spanNotHits(inc, exc, 3, 10)
    }
  }
}
