package graft

import graft.api.{DocsIndex, QuerySet}
import graft.search.ServingSearcher

/** Serving tier ≡ relational tier: for EVERY query in the committed
  * query set, ServingSearcher's hits must be bit-identical (docIds AND
  * Double scores) to the Catalyst-planned Searcher path — which is
  * itself oracle-verified. This is what licenses Bench to report the
  * serving path's latency as the engine's query latency. */
class ServingSpec extends SparkSpec {

  test("QUERIES.tsv parses: 59 queries, all kinds present") {
    val qs = QuerySet.load()
    assert(qs.size == 59)
    assert(Set("FREE", "AND", "OR", "PHRASE", "NEAR", "ONEAR", "PREFIX",
      "REGEX", "BOOL", "FUZZY", "STEM", "WILD").subsetOf(qs.map(_.kind).toSet))
    assert(qs.map(_.qid).distinct.size == 59)
  }

  test("serving hits are bit-identical to the relational path on the full query set") {
    val (seg, searcher, _) = DocsIndex.get(spark, "/root/testdata/sf0.001")
    val serving = new ServingSearcher(spark, seg)
    var nonEmpty = 0
    QuerySet.load().foreach { q =>
      val got = serving.hits(q.kind, q.text, q.k).toSeq
      val want = searcher.hits(q.kind, q.text, q.k).collect()
        .map(h => graft.model.Hit(0L, h.rank, h.docId, h.score)).toSeq
      assert(got.map(h => (h.rank, h.docId, h.score)) ==
        want.map(h => (h.rank, h.docId, h.score)),
        s"qid=${q.qid} '${q.text}': serving=${got.take(3)} relational=${want.take(3)}")
      if (got.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty >= 20, "most committed queries must return hits at sf0.001")
    serving.close()
  }

  test("scoped serving hits are bit-identical to the relational scoped path") {
    import org.apache.spark.sql.functions.{col, min, max}
    val (seg, searcher, _) = DocsIndex.get(spark, "/root/testdata/sf0.001")
    val serving = new ServingSearcher(spark, seg)
    val r = seg.docs.filter(col("repo") === "src7")
      .agg(min(col("docId")), max(col("docId"))).collect().head
    val (lo, hi) = (r.getLong(0), r.getLong(1) + 1)
    Seq(("FREE", "fast merge sort"), ("AND", "key AND value"),
      ("PHRASE", "\"part filter\"")).foreach { case (kind, text) =>
      val got = serving.scopedHits(kind, text, 10, lo, hi)
        .map(h => (h.rank, h.docId, h.score)).toSeq
      val want = searcher.scopedHits(kind, text, 10, lo, hi).collect()
        .map(h => (h.rank, h.docId, h.score)).toSeq
      assert(got == want, s"$kind '$text'")
      assert(got.nonEmpty || kind == "PHRASE", s"$kind '$text' empty in scope")
    }
    serving.close()
  }

  test("zero-hit and term-absent queries return empty through both paths") {
    val (seg, searcher, _) = DocsIndex.get(spark, "/root/testdata/sf0.001")
    val serving = new ServingSearcher(spark, seg)
    Seq(("AND", "spark AND zzzmissingterm"), ("FREE", "zzzmissingterm"),
      ("PHRASE", "\"dup zzzmissingterm\"")).foreach { case (kind, text) =>
      assert(serving.hits(kind, text, 10).isEmpty, text)
      assert(searcher.hits(kind, text, 10).count() == 0, text)
    }
    serving.close()
  }
}
