package graft

import org.apache.spark.sql.functions._

import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.{DatasetCorpusSource, Synthesizer}
import graft.search.{BoolQuery, QueryParser, Searcher, ServingSearcher, Wand}
import graft.tokenize.Tokenizer

/** Phrase atoms inside the boolean grammar: `("fast merge" OR slow) AND
  * table`. Presence of a phrase atom = the PHRASE-kind predicate
  * (consecutive positions); scoring stays BM25 over the expression's
  * present distinct terms. Verified against a token-level brute force,
  * the PHRASE-kind walk, and across all three read paths. */
class BoolPhraseSpec extends SparkSpec {

  val params: BuildParams =
    BuildParams(numPartitions = 4, bucketSize = 64, positional = true)

  lazy val seg = SegmentBuilder.build(spark,
    DatasetCorpusSource(Synthesizer.corpus(spark, 450L)), params)._1
  lazy val searcher = new Searcher(spark, seg)

  private lazy val topTerms =
    seg.dict.orderBy(desc("df")).limit(4).collect().map(_.term)

  // token-level ground truth: docId -> token array (same tokenizer)
  private lazy val tokensOf: Map[Long, Array[String]] = {
    import spark.implicits._
    val byPath = Synthesizer.corpus(spark, 450L).collect()
      .map(r => r.path -> Tokenizer.tokenize(r.content)).toMap
    seg.docs.select($"docId", $"path").as[(Long, String)].collect()
      .map { case (d, p) => d -> byPath(p) }.toMap
  }

  private def hasPhrase(toks: Array[String], ph: Seq[String]): Boolean =
    toks.indices.exists(i => i + ph.length <= toks.length &&
      ph.indices.forall(j => toks(i + j) == ph(j)))

  private def bruteBool(matches: Array[String] => Boolean,
                        queryTerms: Set[String], k: Int): Seq[(Long, Double)] = {
    val dfByTerm = seg.dict.collect().map(e => e.term -> e.df).toMap
    tokensOf.toSeq.collect { case (d, toks) if matches(toks) =>
      val present = queryTerms.filter(toks.contains).toSeq.sorted
      val dl = toks.length
      var score = 0.0
      present.foreach { t =>
        val idf = graft.model.BM25.idf(seg.stats.numDocs, dfByTerm(t))
        val tf = toks.count(_ == t)
        score += graft.model.BM25.impact(idf, tf, dl, seg.stats.avgDocLen)
      }
      (d, score)
    }.sortBy { case (d, s) => (-s, d) }.take(k)
  }

  test("parser: quoted phrases are atoms anywhere a term is") {
    val e = BoolQuery.parse("(\"fast merge\" OR slow) AND table")
    assert(e == BoolQuery.And(List(
      BoolQuery.Or(List(
        BoolQuery.Phrase(List("fast", "merge")), BoolQuery.Term("slow"))),
      BoolQuery.Term("table"))))
    // 1-token quote collapses to Term; empty quote drops out
    assert(BoolQuery.parse("\"fast\" AND slow") ==
      BoolQuery.And(List(BoolQuery.Term("fast"), BoolQuery.Term("slow"))))
    assert(BoolQuery.parse("\"\" slow") == BoolQuery.Term("slow"))
    assert(BoolQuery.terms(BoolQuery.parse("\"abc def\" OR xyz")).toSeq ==
      Seq("abc", "def", "xyz"))
    // camelCase inside a quote splits into phrase slots via the shared
    // code tokenizer, exactly like PHRASE-kind text
    assert(BoolQuery.parse("\"fastMerge\" OR slow") ==
      BoolQuery.Or(List(
        BoolQuery.Phrase(List("fast", "merge")), BoolQuery.Term("slow"))))
    intercept[IllegalArgumentException](BoolQuery.parse("\"unbalanced slow"))
    // kind routing: a pure quote stays PHRASE; mixed goes BOOL
    assert(QueryParser.parse("\"fast merge\"")._1 == "PHRASE")
    assert(QueryParser.parse("\"fast merge\" OR slow")._1 == "BOOL")
    assert(QueryParser.parse("slow \"fast merge\"")._1 == "BOOL")
  }

  test("BOOL with phrase atoms == token-level brute force") {
    val Array(a, b, c, _*) = topTerms
    val q = s""""$a $b" OR $c"""
    val got = searcher.hits("BOOL", q, 25).collect()
      .map(h => (h.docId, h.score)).toSeq
    val want = bruteBool(
      toks => hasPhrase(toks, Seq(a, b)) || toks.contains(c),
      Set(a, b, c), 25)
    assert(got.nonEmpty && got == want)

    // the AND-of-(phrase OR term) shape, with a NOT mixed in
    val Array(_, _, _, d) = topTerms
    val q2 = s"""("$a $b" OR $c) AND NOT $d"""
    val got2 = searcher.hits("BOOL", q2, 25).collect()
      .map(h => (h.docId, h.score)).toSeq
    val want2 = bruteBool(
      toks => (hasPhrase(toks, Seq(a, b)) || toks.contains(c)) && !toks.contains(d),
      Set(a, b, c, d), 25)
    assert(got2 == want2)
    // the phrase must actually discriminate: some doc has both terms but
    // not adjacent (else this spec proves nothing about positions)
    assert(tokensOf.values.exists(t =>
      t.contains(a) && t.contains(b) && !hasPhrase(t, Seq(a, b))))
  }

  test("a pure-phrase BOOL query matches exactly the PHRASE kind's doc set") {
    val Array(a, b, _*) = topTerms
    // BOOL scores over present distinct terms; PHRASE scores over the
    // phrase's distinct terms — for a pure phrase both sets coincide
    val viaBool = searcher.hits("BOOL", s"""("$a $b")""", 25).collect()
      .map(h => (h.docId, h.score)).toSeq
    val viaPhrase = searcher.hits("PHRASE", s""""$a $b"""", 25).collect()
      .map(h => (h.docId, h.score)).toSeq
    assert(viaBool.nonEmpty && viaBool == viaPhrase)
  }

  test("serving tier and multi-segment paths agree bit-for-bit") {
    val Array(a, b, c, _*) = topTerms
    val q = s"""("$a $b" OR $c) AND $a"""
    val rel = searcher.hits("BOOL", q, 20).collect()
      .map(h => (h.rank, h.docId, h.score)).toSeq
    val serving = new ServingSearcher(spark, seg)
    val srv = serving.hits("BOOL", q, 20)
      .map(h => (h.rank, h.docId, h.score)).toSeq
    serving.close()
    assert(rel.nonEmpty && srv == rel)
    // single-segment MultiSearcher must agree with the direct path
    // (global stats over one segment == its own stats)
    val multi = new graft.search.MultiSearcher(spark, Seq(seg))
    val m = multi.hits("BOOL", q, 20).collect()
      .map(h => (h.rank, h.docId, h.score)).toSeq
    assert(m == rel)
  }

  test("multi-segment BOOL no longer degrades to OR (regression)") {
    import java.nio.file.Files
    import graft.index.{ChunkedIndexer, IndexStorage}
    val dir = Files.createTempDirectory("graft-mbool").toString
    val p2 = params.copy(bucketSize = 100)
    val (dirs, _) = new ChunkedIndexer(dir, chunkDocs = 100, p2)
      .build(spark, DatasetCorpusSource(Synthesizer.tiny(spark)))
    val segs = dirs.map(d => IndexStorage.read(spark, d))
    val multi = new graft.search.MultiSearcher(spark, segs)
    val mono = SegmentBuilder.build(spark,
      DatasetCorpusSource(Synthesizer.tiny(spark)), p2)._1
    val sMono = new Searcher(spark, mono)
    val terms = mono.dict.orderBy(asc("df")).limit(2).collect().map(_.term)
    val rare = terms(0) // a LOW-df term: OR and BOOL results must differ
    val common = mono.dict.orderBy(desc("df")).limit(1).collect().head.term
    val q = s"($common OR $rare) AND $rare"
    val m = multi.hits("BOOL", q, 30).collect()
      .map(h => (h.docId, java.lang.Double.doubleToLongBits(h.score))).toSeq
    val f = sMono.hits("BOOL", q, 30).collect()
      .map(h => (h.docId, java.lang.Double.doubleToLongBits(h.score))).toSeq
    assert(m == f && m.nonEmpty)
    // and it genuinely differs from the OR reading on this fixture
    val or = sMono.hits("OR", s"$common OR $rare", 30).collect().map(_.docId).toSet
    assert(m.map(_._1).toSet != or,
      "fixture must discriminate BOOL from OR — tighten the query")
    mono.unpersist()
  }

  test("NEAR atoms: window semantics match the NEAR kind and brute force") {
    val Array(a, b, c, _*) = topTerms
    // parser: suffix window; duplicate terms deduplicate; 1-distinct = Term
    assert(BoolQuery.parse(s""""$a $b"~3 OR $c""") ==
      BoolQuery.Or(List(BoolQuery.Near(List(a, b), 3), BoolQuery.Term(c))))
    assert(BoolQuery.parse(s""""$a $a"~3 AND $c""") ==
      BoolQuery.And(List(BoolQuery.Term(a), BoolQuery.Term(c))))

    def minSpan(toks: Array[String], ts: Seq[String]): Int = {
      val occ = ts.map(t => toks.indices.filter(i => toks(i) == t))
      if (occ.exists(_.isEmpty)) Int.MaxValue
      else occ.map(_.map(p => p)).foldLeft(Seq(Seq.empty[Int]))((acc, ps) =>
        for (pre <- acc; p <- ps) yield pre :+ p)
        .map(pick => pick.max - pick.min).min
    }
    val w = 4
    val got = searcher.hits("BOOL", s""""$a $b"~$w""", 30).collect()
      .map(h => (h.docId, h.score)).toSeq
    val want = bruteBool(
      toks => minSpan(toks, Seq(a, b)) <= w, Set(a, b), 30)
    assert(got == want && got.nonEmpty)
    // a pure NEAR-atom query matches the NEAR kind's doc set and scores
    val viaNear = searcher.hits("NEAR", s"$a NEAR/$w $b", 30).collect()
      .map(h => (h.docId, h.score)).toSeq
    assert(got == viaNear)
    // the window discriminates somewhere (w vs consecutive)
    val phraseDocs = searcher.hits("BOOL", s"""("$a $b")""", 200).collect()
      .map(_.docId).toSet
    assert(got.exists(h => !phraseDocs(h._1)) || phraseDocs.isEmpty,
      "fixture must contain a within-window, non-consecutive pair")
    // serving parity for a mixed NEAR-atom expression
    val serving = new ServingSearcher(spark, seg)
    val q = s"""("$a $b"~$w OR $c) AND $a"""
    val rel = searcher.hits("BOOL", q, 20).collect()
      .map(h => (h.rank, h.docId, h.score)).toSeq
    val srv = serving.hits("BOOL", q, 20).map(h => (h.rank, h.docId, h.score)).toSeq
    serving.close()
    assert(rel.nonEmpty && srv == rel)
  }

  test("pattern atoms: prefix and regex leaves expand against the dictionary") {
    val vocab = seg.dict.collect().map(_.term).toSet
    val Array(a, b, c, _*) = topTerms
    val pre = a.take(2)
    val expand = vocab.filter(_.startsWith(pre))
    assert(expand.size >= 1)
    // parser shapes
    assert(BoolQuery.parse(s"($pre* OR $b)") ==
      BoolQuery.Or(List(BoolQuery.Pattern(pre, isRegex = false), BoolQuery.Term(b))))
    assert(BoolQuery.parse(s"re:($a|$b) AND $c") ==
      BoolQuery.And(List(BoolQuery.Pattern(s"($a|$b)", isRegex = true),
        BoolQuery.Term(c))))

    val q = s"($pre* OR $b) AND NOT $c"
    val got = searcher.hits("BOOL", q, 30).collect()
      .map(h => (h.docId, h.score)).toSeq
    val want = bruteBool(
      toks => (toks.exists(expand) || toks.contains(b)) && !toks.contains(c),
      expand ++ Set(b, c), 30)
    assert(got == want && got.nonEmpty)

    val q2 = s"re:($a|$b) AND $c"
    val got2 = searcher.hits("BOOL", q2, 30).collect()
      .map(h => (h.docId, h.score)).toSeq
    val want2 = bruteBool(
      toks => (toks.contains(a) || toks.contains(b)) && toks.contains(c),
      Set(a, b, c), 30)
    assert(got2 == want2 && got2.nonEmpty)

    // serving + multi parity for the prefix-leaf expression
    val serving = new ServingSearcher(spark, seg)
    val rel = searcher.hits("BOOL", q, 20).collect()
      .map(h => (h.rank, h.docId, h.score)).toSeq
    val srv = serving.hits("BOOL", q, 20).map(h => (h.rank, h.docId, h.score)).toSeq
    serving.close()
    assert(srv == rel)
    val multi = new graft.search.MultiSearcher(spark, Seq(seg))
    assert(multi.hits("BOOL", q, 20).collect()
      .map(h => (h.rank, h.docId, h.score)).toSeq == rel)
    // pure-negative with a pattern is still rejected
    intercept[IllegalArgumentException](
      searcher.hits("BOOL", s"NOT $pre*", 5).collect())
  }

  test("facets and matchCount honor BOOL/PHRASE/NEAR semantics (not any-term)") {
    val Array(a, b, c, _*) = topTerms
    val q = s"""("$a $b" OR $c) AND NOT zzznotaterm"""
    val wantDocs = tokensOf.collect { case (d, toks)
      if hasPhrase(toks, Seq(a, b)) || toks.contains(c) => d }.toSet
    assert(searcher.matchCount("BOOL", q) == wantDocs.size.toLong)
    // a doc with a but NOT the phrase and NOT c exists — any-term would
    // overcount, so this pins the fix (facets used to degrade to OR)
    val anyTerm = tokensOf.count { case (_, toks) =>
      toks.contains(a) || toks.contains(b) || toks.contains(c) }
    assert(anyTerm > wantDocs.size)
    // facet counts group the SAME match set by docmap lang
    import spark.implicits._
    val langOf = seg.docs.select($"docId", $"lang").as[(Long, String)]
      .collect().toMap
    val wantFacets = wantDocs.groupBy(langOf).map { case (l, ds) => l -> ds.size.toLong }
    val gotFacets = searcher.facets("BOOL", q, "lang").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotFacets == wantFacets)

    // PHRASE kind: exact consecutive-position match set
    val phq = s""""$a $b""""
    val wantPh = tokensOf.count { case (_, toks) => hasPhrase(toks, Seq(a, b)) }
    assert(searcher.matchCount("PHRASE", phq) == wantPh.toLong)
    // NEAR kind: minimal-span window
    val wantNear = tokensOf.count { case (_, toks) =>
      toks.contains(a) && toks.contains(b) && {
        val pa = toks.zipWithIndex.collect { case (t, i) if t == a => i }
        val pb = toks.zipWithIndex.collect { case (t, i) if t == b => i }
        pa.exists(i => pb.exists(j => math.abs(i - j) <= 3))
      } }
    assert(searcher.matchCount("NEAR", s"$a NEAR/3 $b") == wantNear.toLong)
    // the match set equals the full hits set (unbounded k) for BOOL
    val hitDocs = searcher.hits("BOOL", q, wantDocs.size + 10).collect()
      .map(_.docId).toSet
    assert(hitDocs == wantDocs)
    // pure-negative still rejected through the facet path
    intercept[IllegalArgumentException](searcher.matchCount("BOOL", s"NOT $a"))
  }

  test("phrase atoms page with search_after like everything else") {
    val Array(a, b, c, _*) = topTerms
    val q = s""""$a $b" OR $c"""
    val deep = searcher.hits("BOOL", q, 20).collect()
      .map(h => (h.docId, h.score)).toSeq
    if (deep.size >= 10) {
      val cur = deep(4)
      val page2 = searcher.hitsAfter("BOOL", q, 5, cur._2, cur._1).collect()
        .map(h => (h.docId, h.score)).toSeq
      assert(page2 == deep.slice(5, 10))
    } else fail("fixture too small to page")
  }
}
