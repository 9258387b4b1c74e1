package graft

import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.DatasetCorpusSource
import graft.model.CorpusRow
import graft.pipeline.Percolator
import graft.search.{QueryParser, Searcher, ServingSearcher}

/** General wildcard queries (kind WILD, Lucene WildcardQuery): the
  * glob→regex desugar, parse classification, bit-identity with the
  * equivalent REGEX on every read tier, and the boolean wildcard atom. */
class WildcardSpec extends SparkSpec {

  /** Planted vocabulary where `s?a*` expands non-trivially. */
  lazy val seg = {
    import spark.implicits._
    val docs = Seq(
      "the scan reads every stripe",
      "a small table fits in memory",
      "spark schedules the stages",
      "slow sort spills to disk",
      "scan and small and spark together",
      "unrelated words entirely here").zipWithIndex.map { case (text, i) =>
      CorpusRow("r0", f"f$i%03d.txt", "c0", "txt", text)
    }
    SegmentBuilder.build(spark, DatasetCorpusSource(docs.toDS()),
      BuildParams(numPartitions = 4, bucketSize = 64))._1
  }
  lazy val searcher = new Searcher(spark, seg)

  test("globToRegex translation and parse classification") {
    assert(QueryParser.globToRegex("s?a*") == "s.a.*")
    assert(QueryParser.globToRegex("te?t") == "te.t")
    assert(QueryParser.globToRegex("a.b+c(d)") == "a\\.b\\+c\\(d\\)")
    assert(QueryParser.parse("s?a*")._1 == "WILD")
    assert(QueryParser.parse("te?t")._1 == "WILD")
    assert(QueryParser.parse("*fix")._1 == "WILD")
    assert(QueryParser.parse("mid*dle")._1 == "WILD")
    // the trailing-star fast path stays PREFIX (contiguous dict range)
    assert(QueryParser.parse("scan*")._1 == "PREFIX")
    // all-wildcard tokens never expand the whole dictionary
    assert(QueryParser.parse("*?")._1 == "FREE")
    assert(QueryParser.parse("**")._1 == "FREE")
  }

  test("WILD == the equivalent REGEX bit-identically; expansion is exact") {
    val entries = searcher.entriesFor("WILD", "s?a*")
    assert(entries.map(_.term).toSet ==
      Set("scan", "small", "spark", "stages"),
      entries.map(_.term).mkString(","))
    val wild = searcher.hits("WILD", "s?a*", 10).collect().toSeq
    val re = searcher.hits("REGEX", "re:s.a.*", 10).collect().toSeq
    assert(wild == re)
    assert(wild.nonEmpty)
    // `?` constrains position: te?t-style single-char hole
    assert(searcher.entriesFor("WILD", "s?an").map(_.term).toSet == Set("scan"))
    // leading wildcard works (no prefix range exists for it)
    assert(searcher.entriesFor("WILD", "*ort").map(_.term).toSet == Set("sort"))
  }

  test("facets/matchCount and batchHits accept WILD") {
    assert(searcher.matchCount("WILD", "s?a*") == 4L) // docs 0,1,2,4
    val batch = searcher.batchHits(Seq((1L, "WILD", "s?a*")), 10)
      .collect().toSeq.sortBy(h => (-h.score, h.docId))
    val direct = searcher.hits("WILD", "s?a*", 10).collect().toSeq
    assert(batch.map(h => (h.docId, h.score)) ==
      direct.map(h => (h.docId, h.score)))
  }

  test("wildcard atom inside the boolean grammar == regex-atom twin") {
    val wild = searcher.hits("BOOL", "(s?a* OR slow) AND sort", 10)
      .collect().toSeq
    val re = searcher.hits("BOOL", "(re:s.a.* OR slow) AND sort", 10)
      .collect().toSeq
    assert(wild == re)
    assert(wild.nonEmpty)
  }

  test("serving-tier and percolator parity for WILD") {
    val serving = new ServingSearcher(spark, seg)
    val sv = serving.hits("WILD", "s?a*", 10).toSeq
    val rel = searcher.hits("WILD", "s?a*", 10).collect().toSeq
    assert(sv.map(h => (h.rank, h.docId, h.score)) ==
      rel.map(h => (h.rank, h.docId, h.score)))
    assert(sv.nonEmpty)
    serving.close()
    import spark.implicits._
    val docsDf = Seq((0L, "the spark stage"), (1L, "nothing relevant"))
      .toDF("doc_id", "text")
    val got = Percolator.percolate(spark, docsDf,
      Seq(Percolator.compile("w", "WILD", "s?a*"))).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id"))).toSet
    assert(got == Set(0L))
  }
}
