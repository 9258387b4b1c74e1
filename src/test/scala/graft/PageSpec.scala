package graft

import org.apache.spark.sql.functions._

import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.{DatasetCorpusSource, Synthesizer}
import graft.search.{QueryParser, Searcher, ServingSearcher, Wand}

/** search_after pagination: walking pages with a (score, docId) cursor
  * is bit-identical to slicing one deep fetch — at O(k) heap memory per
  * page instead of O(depth) (the deep-paging posture of the serving
  * tier). Ties matter: the synthetic corpus produces exact score ties,
  * and the cursor's (score desc, docId asc) order must split them
  * deterministically. */
class PageSpec extends SparkSpec {

  lazy val seg = {
    val (s, _) = SegmentBuilder.build(spark,
      DatasetCorpusSource(Synthesizer.corpus(spark, 500L)),
      BuildParams(numPartitions = 4, bucketSize = 64, positional = true))
    s
  }
  lazy val searcher = new Searcher(spark, seg)

  private def queriesUnderTest: Seq[(String, String)] = {
    val terms = seg.dict.orderBy(desc("df")).limit(3).collect().map(_.term)
    Seq(
      ("FREE", s"${terms(0)} ${terms(1)}"),
      ("AND", s"${terms(0)} AND ${terms(1)}"),
      ("OR", s"${terms(0)} OR ${terms(1)} OR ${terms(2)}"),
      ("BOOL", s"(${terms(0)} OR ${terms(1)}) AND ${terms(2)}"),
      ("PHRASE", "\"" + s"${terms(0)} ${terms(1)}" + "\""),
      ("PREFIX", terms(0).take(2) + "*"))
  }

  test("cursor pages concatenate to the deep fetch, every kind (relational)") {
    val pageSize = 7
    val pages = 4
    var checked = 0
    queriesUnderTest.foreach { case (kind, q) =>
      val deep = searcher.hits(kind, q, pageSize * pages).collect()
        .map(h => (h.docId, h.score)).toSeq
      var after: Option[(Double, Long)] = None
      val walked = Seq.newBuilder[(Long, Double)]
      var got = -1
      while (got != 0) {
        val page = (after match {
          case None => searcher.hits(kind, q, pageSize)
          case Some((s, d)) => searcher.hitsAfter(kind, q, pageSize, s, d)
        }).collect().map(h => (h.docId, h.score)).toSeq
        got = page.size
        walked ++= page
        after = page.lastOption.map { case (d, s) => (s, d) }
        if (walked.result().size >= deep.size) got = 0
      }
      val w = walked.result().take(deep.size)
      assert(w == deep, s"$kind '$q': paged walk diverges from deep fetch")
      if (deep.size == pageSize * pages) checked += 1
    }
    assert(checked >= 2, "need at least two queries deep enough to page fully")
  }

  test("a cursor mid-tie splits the tie by docId") {
    // find an exact score tie in a deep result, cursor ON the first of
    // the tied pair: the next page must start at the second
    val (kind, q) = queriesUnderTest.head
    val deep = searcher.hits(kind, q, seg.stats.numDocs.toInt).collect()
      .map(h => (h.docId, h.score)).toSeq
    val tieIdx = deep.indices.dropRight(1)
      .find(i => deep(i)._2 == deep(i + 1)._2)
    assert(tieIdx.nonEmpty, "fixture must contain an exact score tie")
    val i = tieIdx.get
    val (d0, s0) = deep(i)
    val next = searcher.hitsAfter(kind, q, 3, s0, d0).collect()
      .map(h => (h.docId, h.score)).toSeq
    assert(next == deep.slice(i + 1, i + 4))
  }

  test("serving tier pages bit-identically to the relational path") {
    val serving = new ServingSearcher(spark, seg)
    val pageSize = 5
    queriesUnderTest.foreach { case (kind, q) =>
      val first = searcher.hits(kind, q, pageSize).collect()
      if (first.length == pageSize) {
        val cur = (first.last.score, first.last.docId)
        val rel = searcher.hitsAfter(kind, q, pageSize, cur._1, cur._2)
          .collect().map(h => (h.rank, h.docId, h.score)).toSeq
        val srv = serving.hitsAfter(kind, q, pageSize, cur._1, cur._2)
          .map(h => (h.rank, h.docId, h.score)).toSeq
        assert(srv == rel, s"$kind '$q'")
      }
    }
    serving.close()
  }

  test("search_after composes with scopes and filters") {
    val lang = seg.docs.groupBy(col("lang")).count()
      .orderBy(desc("count")).limit(1).collect().head.getString(0)
    val (kind, q) = ("FREE", queriesUnderTest.head._2)
    val deep = searcher.fieldedHits(kind, q, 50, "lang", lang).collect()
      .map(h => (h.docId, h.score)).toSeq
    assert(deep.size >= 10)
    val p1 = deep.take(5)
    val cur = p1.last
    val p2 = searcher.fieldedHitsAfter(kind, q, 5, "lang", lang,
      cur._2, cur._1).collect().map(h => (h.docId, h.score)).toSeq
    assert(p2 == deep.slice(5, 10))
  }
}
