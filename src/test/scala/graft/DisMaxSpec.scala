package graft

import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.DatasetCorpusSource
import graft.model.CorpusRow
import graft.search.Searcher

/** Disjunction-max (Searcher.disMaxHits): tie = 1 collapses to the plain
  * disjunction bit-identically, tie = 0 is the pure per-doc max, and a
  * middle tie matches a brute force assembled from single-term scores. */
class DisMaxSpec extends SparkSpec {

  private val texts = Seq(
    "fast fast fast fast nothing else",       // strong on one term
    "fast merge sort table all four once",    // weak on four terms
    "merge merge sort sort two strong",       // medium on two
    "table alone here",                       // single weak
    "no relevant words at all")

  lazy val seg = {
    import spark.implicits._
    val docs = texts.zipWithIndex
      .map { case (text, i) => CorpusRow("r0", f"f$i%03d.txt", "c0", "txt", text) }
    SegmentBuilder.build(spark, DatasetCorpusSource(docs.toDS()),
      BuildParams(numPartitions = 4, bucketSize = 64))._1
  }
  lazy val searcher = new Searcher(spark, seg)
  private val q = "fast merge sort table"
  private val terms = Seq("fast", "merge", "sort", "table")

  /** Per-doc single-term BM25 contributions keyed by term, exactly the
    * engine's own one-term scores (a one-term sum IS the contribution). */
  private lazy val contrib: Map[String, Map[Long, Double]] =
    terms.map(t =>
      t -> searcher.hits("AND", t, 10).collect()
        .map(h => h.docId -> h.score).toMap).toMap

  test("tie = 1 is the plain disjunction, bit-identically") {
    val or = searcher.hits("OR", "fast OR merge OR sort OR table", 10)
      .collect().toSeq
    assert(searcher.disMaxHits(q, 1.0, 10).collect().toSeq == or)
    assert(or.size == 4)
  }

  test("tie = 0 is the pure per-doc max over single-term scores") {
    val got = searcher.disMaxHits(q, 0.0, 10).collect()
      .map(h => h.docId -> h.score).toMap
    val want = contrib.values.flatten.groupBy(_._1)
      .map { case (d, vs) => d -> vs.map(_._2).max }
    assert(got == want, s"got=$got want=$want")
  }

  test("middle tie matches max + tie*(sum-max) from single-term scores") {
    val tie = 0.3
    // ascending-termId accumulation order = the engine's own sum order
    val tidByTerm = seg.dict.collect().map(e => e.term -> e.termId).toMap
    val ordered = terms.sortBy(tidByTerm)
    val got = searcher.disMaxHits(q, tie, 10).collect()
      .map(h => (h.rank, h.docId, h.score)).toSeq
    val docs = contrib.values.flatMap(_.keys).toSet
    val want = docs.toSeq.map { d =>
      var sum = 0.0
      var best = 0.0
      ordered.foreach { t =>
        contrib(t).get(d).foreach { c => sum += c; if (c > best) best = c }
      }
      (d, best + tie * (sum - best))
    }.sortBy { case (d, s) => (-s, d) }
      .zipWithIndex.map { case ((d, s), i) => (i + 1, d, s) }
    assert(got == want, s"got=$got want=$want")
    // the combiner actually reorders vs the plain OR: the 4-weak-terms
    // doc outranks the one-strong-term doc under OR but not under dismax
    val orRank = searcher.hits("OR", "fast OR merge OR sort OR table", 10)
      .collect().map(_.docId).toSeq
    assert(got.map(_._2) != orRank)
  }

  test("OOV terms drop out; tie outside [0,1] rejected") {
    val withOov = searcher.disMaxHits("fast merge zzz", 0.3, 10).collect().toSeq
    val noOov = searcher.disMaxHits("fast merge", 0.3, 10).collect().toSeq
    assert(withOov == noOov)
    assert(searcher.disMaxHits("zzz qqq", 0.3, 10).isEmpty)
    assert(intercept[IllegalArgumentException](
      searcher.disMaxHits(q, 1.5, 10)).getMessage.contains("tie"))
  }
}
