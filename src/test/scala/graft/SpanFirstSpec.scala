package graft

import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.{DatasetCorpusSource, Synthesizer}
import graft.search.Searcher
import graft.tokenize.Tokenizer

/** Span-first queries (Lucene SpanFirstQuery): match = every query term
  * occurs within the first n tokens of the filtered stream; score = the
  * plain conjunctive BM25 (filter-doesn't-rescale). Checked against a
  * token-level brute force and against the AND walk's scores. */
class SpanFirstSpec extends SparkSpec {

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

  private def brute(terms: Seq[String], n: Int): Set[Long] =
    toksByDoc.collect { case (d, toks)
      if terms.forall(t => toks.take(n).contains(t)) => d
    }.toSet

  test("spanFirstHits == brute-force first-n filter of the AND ranking") {
    // a pair that co-occurs somewhere, with one doc matching early and
    // (ideally) one matching only late — sweep n to exercise both sides
    val pair = toksByDoc.values.flatMap(_.distinct.take(12))
      .groupBy(identity).view.mapValues(_.size).toSeq
      .filter(_._2 >= 2).sortBy(_._1).take(2).map(_._1)
    assume(pair.length == 2)
    val q = s"${pair(0)} ${pair(1)}"
    val andHits = searcher.hitsExhaustive("AND", s"${pair(0)} AND ${pair(1)}",
      seg.stats.numDocs.toInt).collect()
    for (n <- Seq(1, 5, 20, 1000)) {
      val want = {
        val ok = brute(pair, n)
        andHits.filter(h => ok(h.docId))
          .sortBy(h => (-h.score, h.docId)).take(10)
          .map(h => (h.docId, h.score)).toSeq
      }
      val got = searcher.spanFirstHits(q, n, 10).collect()
        .map(h => (h.docId, h.score)).toSeq
      assert(got == want, s"n=$n")
    }
    // a large n degrades to plain AND bit-identically
    val all = searcher.spanFirstHits(q, 100000, 10).collect()
      .map(h => (h.docId, h.score)).toSeq
    val and10 = andHits.sortBy(h => (-h.score, h.docId)).take(10)
      .map(h => (h.docId, h.score)).toSeq
    assert(all == and10)
  }

  test("serving-tier span-first == relational span-first, bit-identical") {
    val pair = toksByDoc.values.flatMap(_.distinct.take(12))
      .groupBy(identity).view.mapValues(_.size).toSeq
      .filter(_._2 >= 2).sortBy(_._1).take(2).map(_._1)
    assume(pair.length == 2)
    val q = s"${pair(0)} ${pair(1)}"
    val srv = new graft.search.ServingSearcher(spark, seg)
    try {
      for (n <- Seq(1, 5, 20, 1000)) {
        val rel = searcher.spanFirstHits(q, n, 10).collect()
          .map(h => (h.docId, h.score)).toSeq
        val got = srv.spanFirstHits(q, n, 10).map(h => (h.docId, h.score)).toSeq
        assert(got == rel, s"n=$n")
      }
      assert(srv.spanFirstHits("zzz_not_a_term", 5, 10).isEmpty)
    } finally srv.close()
  }

  test("span-first edge cases: OOV term, n validation, non-positional") {
    assert(searcher.spanFirstHits("zzz_not_a_term", 5, 10).isEmpty)
    intercept[IllegalArgumentException] {
      searcher.spanFirstHits("fast", 0, 10)
    }
    val flat = SegmentBuilder.build(spark,
      DatasetCorpusSource(Synthesizer.tiny(spark)),
      BuildParams(numPartitions = 2, bucketSize = 64, positional = false))._1
    intercept[IllegalArgumentException] {
      new Searcher(spark, flat).spanFirstHits("fast", 5, 10)
    }
  }
}
