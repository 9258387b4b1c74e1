package graft

import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.DatasetCorpusSource
import graft.model.CorpusRow
import graft.search.Searcher

/** Minimum-should-match (Searcher.msmHits): the endpoints collapse to
  * OR/AND bit-identically, the middle thresholds match a brute force,
  * and OOV clauses count as unmatchable. */
class MsmSpec extends SparkSpec {

  /** Docs matching exactly 0..4 of the terms {fast, merge, sort, table}. */
  lazy val seg = {
    import spark.implicits._
    val docs = Seq(
      "fast merge sort table all four",        // 4 matches
      "fast merge sort three of them",         // 3
      "fast merge only two here",              // 2
      "fast alone just one",                   // 1
      "nothing relevant at all",               // 0
      "table sort separate pair",              // 2
      "merge table sort triple set").zipWithIndex // 3
      .map { case (text, i) => CorpusRow("r0", f"f$i%03d.txt", "c0", "txt", text) }
    SegmentBuilder.build(spark, DatasetCorpusSource(docs.toDS()),
      BuildParams(numPartitions = 4, bucketSize = 64))._1
  }
  lazy val searcher = new Searcher(spark, seg)
  private val q = "fast merge sort table"

  test("minMatch 1 == the disjunction; minMatch |q| == the conjunction") {
    val or = searcher.hits("OR", "fast OR merge OR sort OR table", 10)
      .collect().toSeq
    val and = searcher.hits("AND", "fast AND merge AND sort AND table", 10)
      .collect().toSeq
    assert(searcher.msmHits(q, 1, 10).collect().toSeq == or)
    assert(searcher.msmHits(q, 4, 10).collect().toSeq == and)
    assert(or.size == 6 && and.size == 1)
  }

  test("middle thresholds select exactly the >=t-match docs, brute-forced") {
    import spark.implicits._
    // brute force: count distinct query terms per doc over the raw text
    val terms = Set("fast", "merge", "sort", "table")
    val matchCountByDoc: Map[Long, Int] = seg.docs.collect().map { d =>
      // path round-trips the planted index i; text re-derived from it
      d.docId -> d
    }.map { case (id, d) =>
      val i = d.path.stripSuffix(".txt").stripPrefix("f").toInt
      val text = Seq(
        "fast merge sort table all four", "fast merge sort three of them",
        "fast merge only two here", "fast alone just one",
        "nothing relevant at all", "table sort separate pair",
        "merge table sort triple set")(i)
      id -> text.split(" ").count(terms)
    }.toMap
    for (t <- 1 to 4) {
      val got = searcher.msmHits(q, t, 10).collect().map(_.docId).toSet
      val want = matchCountByDoc.filter(_._2 >= t).keySet
      assert(got == want, s"t=$t got=$got want=$want")
    }
  }

  test("OOV terms are unmatchable clauses; impossible thresholds are empty") {
    // "zzz" is OOV: a doc can still reach t=2 among the in-dict terms
    val withOov = searcher.msmHits("fast merge zzz", 2, 10).collect().toSeq
    val noOov = searcher.msmHits("fast merge", 2, 10).collect().toSeq
    assert(withOov == noOov)
    // more required matches than in-dict terms: provably empty, no job
    assert(searcher.msmHits("fast zzz", 2, 10).isEmpty)
    assert(intercept[IllegalArgumentException](
      searcher.msmHits(q, 0, 10)).getMessage.contains("minMatch"))
  }

  test("commonTerms endpoints: all-rare == AND, all-common == OR, bit-identical") {
    // every planted term has df < N, so cutoff 1.0 requires them all
    val and = searcher.hits("AND", "fast AND merge AND sort AND table", 10)
      .collect().toSeq
    assert(searcher.commonTermsHits(q, 1.0, 10).collect().toSeq == and)
    // a cutoff below 1/N leaves nothing required: plain disjunction
    val or = searcher.hits("OR", "fast OR merge OR sort OR table", 10)
      .collect().toSeq
    assert(searcher.commonTermsHits(q, 1e-9, 10).collect().toSeq == or)
  }

  test("commonTerms middle cutoff: rare terms required, common ones score") {
    // dfs on the planted corpus (7 docs): fast 4, merge 4, sort 4, table 3
    // cutoff 4/7: only 'table' (df 3) is required; the others are common
    val cutoff = 4.0 / 7.0
    val got = searcher.commonTermsHits(q, cutoff, 10).collect()
      .map(h => (h.docId, h.score)).toSeq
    // brute force: the OR ranking filtered to docs containing 'table'
    val tableDocs = searcher.hits("AND", "table", 10).collect()
      .map(_.docId).toSet
    val want = searcher.hits("OR", "fast OR merge OR sort OR table", 10)
      .collect().filter(h => tableDocs(h.docId))
      .sortBy(h => (-h.score, h.docId)).map(h => (h.docId, h.score)).toSeq
    assert(got.map(_._1).toSet == tableDocs)
    assert(got == want, s"got=$got want=$want")
    // required-term docs are a strict subset of the disjunction
    assert(got.size == 3)
  }
}
