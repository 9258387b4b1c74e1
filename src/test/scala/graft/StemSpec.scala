package graft

import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.DatasetCorpusSource
import graft.model.CorpusRow
import graft.search.{QueryParser, Searcher, ServingSearcher, Stem}

/** Stemmed retrieval (kind STEM, search/Stem.scala): the S-stemmer's
  * rule goldens, STEM ≡ expanded-OR bit-identity, serving parity,
  * percolation agreement, and parse recognition of `stem:` syntax. */
class StemSpec extends SparkSpec {

  /** Planted singular/plural variants so expansions are non-trivial. */
  lazy val seg = {
    import spark.implicits._
    val docs = Seq(
      "the query planner binds tables to scans",
      "two queries share one table scan",
      "a query against the table cache",
      "tables and indexes and caches",
      "merge merges merging branches",
      "unrelated words entirely here").zipWithIndex.map { case (text, i) =>
      CorpusRow("r0", f"f$i%03d.txt", "c0", "txt", text)
    }
    SegmentBuilder.build(spark, DatasetCorpusSource(docs.toDS()),
      BuildParams(numPartitions = 4, bucketSize = 64))._1
  }
  lazy val searcher = new Searcher(spark, seg)

  test("S-stemmer rule goldens (Harman 1991, ordered else-if)") {
    val cases = Seq(
      "queries" -> "query", "tables" -> "table", "indexes" -> "indexe",
      "caches" -> "cache", "merges" -> "merge", "scans" -> "scan",
      "dies" -> "dy", // ies-rule fires on any non-e/a prefix
      "eies" -> "eie", // eies blocks rule 1, falls through to the es rule
      "goes" -> "goe", // oes blocks rule 2, falls through to the s rule
      "bus" -> "bus", "less" -> "less", // us/ss never strip
      "es" -> "e", "s" -> "s", "as" -> "a", // length guards: only bare "s" survives
      "query" -> "query", "table" -> "table") // fixpoints
    cases.foreach { case (in, want) =>
      assert(Stem.sStem(in) == want, s"sStem($in)")
    }
  }

  test("STEM == the expanded OR disjunction, bit-identically") {
    val entries = searcher.dictLookupStem("queries")
    assert(entries.map(_.term).toSet == Set("query", "queries"),
      s"expansion: ${entries.map(_.term).mkString(",")}")
    val stem = searcher.hits("STEM", "queries", 10).collect().toSeq
    val or = searcher.hits("OR",
      entries.map(_.term).mkString(" OR "), 10).collect().toSeq
    assert(stem == or)
    assert(stem.nonEmpty)
    // the stem: syntax parses to the same query
    val (pk, pts) = QueryParser.parse("stem:queries")
    assert(pk == "STEM" && pts.toSeq == Seq("queries"))
    assert(searcher.hits("STEM", "stem:queries", 10).collect().toSeq == stem)
    // a singular operand reaches plural documents too
    val tabled = searcher.dictLookupStem("table").map(_.term).toSet
    assert(tabled == Set("table", "tables"))
  }

  test("serving tier stems identically; batch includes STEM") {
    val serving = new ServingSearcher(spark, seg)
    try {
      val a = serving.hits("STEM", "tables", 10).toSeq
      val b = searcher.hits("STEM", "tables", 10).collect().toSeq
      assert(a == b && a.nonEmpty)
      val batch = searcher.batchHits(Seq((9L, "STEM", "tables")), 10)
        .collect().toSeq
      assert(batch == b.map(h => h.copy(qid = 9L)))
    } finally serving.close()
  }

  test("percolation matches stemmed variants per document") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "many queries arrive"),
      (2L, "one query arrives"),
      (3L, "tables everywhere"),
      (4L, "nothing relevant")).toDF("doc_id", "text")
    val q = graft.pipeline.Percolator.compile("q1", "STEM", "query")
    val got = graft.pipeline.Percolator.percolate(spark, corpus, Seq(q))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
    // empty operand matches nothing (not everything)
    val qe = graft.pipeline.Percolator.compile("q2", "STEM", "stem:")
    assert(graft.pipeline.Percolator.percolate(spark, corpus, Seq(qe)).count() == 0)
  }

  test("empty and degenerate operands expand to nothing") {
    assert(searcher.dictLookupStem("").isEmpty)
    assert(searcher.hits("STEM", "stem:", 5).collect().isEmpty)
    assert(searcher.dictLookupStem("zzqx").isEmpty)
  }
}
