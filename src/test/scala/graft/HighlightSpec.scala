package graft

import org.apache.spark.sql.functions._

import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.{DatasetCorpusSource, Synthesizer}
import graft.search.Searcher
import graft.tokenize.Tokenizer

/** Snippet/highlight extraction over the positional index: matched
  * positions must equal a brute-force re-tokenization of the hit docs. */
class HighlightSpec extends SparkSpec {

  lazy val (seg, searcher) = {
    val (s, _) = SegmentBuilder.build(spark,
      DatasetCorpusSource(Synthesizer.corpus(spark, 300L)),
      BuildParams(numPartitions = 4, bucketSize = 64, positional = true))
    (s, new Searcher(spark, s))
  }

  /** docId → content, via the (repo, path, commit) identity. */
  lazy val contentByDocId: Map[Long, String] = {
    val corpus = Synthesizer.corpus(spark, 300L).collect()
      .map(r => (r.repo, r.path, r.commit) -> r.content).toMap
    seg.docs.select(col("docId"), col("repo"), col("path"), col("commit"))
      .collect()
      .map(r => r.getLong(0) -> corpus((r.getString(1), r.getString(2), r.getString(3))))
      .toMap
  }

  test("highlight positions == brute-force token positions of the hit docs") {
    val terms = seg.dict.orderBy(desc("df")).limit(2).collect().map(_.term)
    val q = s"${terms(0)} ${terms(1)}"
    val hits = searcher.hits("FREE", q, 5).collect().map(_.docId).toSet
    assert(hits.nonEmpty)
    val got = searcher.highlight("FREE", q, 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val want = (for {
      d <- hits.toSeq
      (tok, pos) <- Tokenizer.tokenize(contentByDocId(d)).zipWithIndex
      if terms.contains(tok)
    } yield (d, tok, pos)).toSet
    assert(want.nonEmpty)
    assert(got == want,
      s"missing: ${want.diff(got).take(5)}; extra: ${got.diff(want).take(5)}")
  }

  test("highlight covers BOOL queries incl. pattern-leaf expansions") {
    val vocab = seg.dict.collect().map(_.term)
    val terms = seg.dict.orderBy(desc("df")).limit(2).collect().map(_.term)
    val pre = terms(0).take(2)
    val expand = vocab.filter(_.startsWith(pre)).toSet
    assert(expand.nonEmpty)
    val q = s"($pre* OR ${terms(1)}) AND NOT zzznotaterm"
    val hits = searcher.hits("BOOL", q, 5).collect().map(_.docId).toSet
    assert(hits.nonEmpty)
    val got = searcher.highlight("BOOL", q, 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    // every EXPANDED term's occurrences must be highlighted, not just
    // the fixed terms (the pre-fix behavior dropped pattern expansions)
    val qTerms = expand + terms(1)
    val want = (for {
      d <- hits.toSeq
      (tok, pos) <- Tokenizer.tokenize(contentByDocId(d)).zipWithIndex
      if qTerms.contains(tok)
    } yield (d, tok, pos)).toSet
    assert(got == want,
      s"missing: ${want.diff(got).take(5)}; extra: ${got.diff(want).take(5)}")
    assert(got.exists { case (_, t, _) => expand.contains(t) && t != terms(1) })
  }

  test("highlight covers PHRASE queries (positions of each phrase term)") {
    // find a phrase that exists: take a doc's first two adjacent tokens
    val d0 = contentByDocId.keys.min
    val toks = Tokenizer.tokenize(contentByDocId(d0))
    val phrase = s""""${toks(0)} ${toks(1)}""""
    val hits = searcher.hits("PHRASE", phrase, 5).collect().map(_.docId).toSet
    assert(hits.nonEmpty, s"phrase $phrase must match at least doc $d0")
    val got = searcher.highlight("PHRASE", phrase, 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val qTerms = Set(toks(0), toks(1))
    val want = (for {
      d <- hits.toSeq
      (tok, pos) <- Tokenizer.tokenize(contentByDocId(d)).zipWithIndex
      if qTerms.contains(tok)
    } yield (d, tok, pos)).toSet
    assert(got == want)
  }
}
