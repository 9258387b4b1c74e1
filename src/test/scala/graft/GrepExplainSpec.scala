package graft

import org.apache.spark.sql.functions._

import graft.api.DocsIndex
import graft.pipeline.Ann
import graft.search.{BoolQuery, Synonyms, TrigramIndex}

/** Round-3 third-sitting operators: trigram substring index, synonym
  * rewrite, score explanation, exact kNN join. */
class GrepExplainSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // mixed-case corpus with punctuation and needles crossing "word"
  // boundaries — everything the word-aligned index cannot see
  private lazy val grepDocs = {
    val rows = Seq(
      (0L, "QuickSort beats MergeSort on small arrays; mergeSort(xs) wins at scale."),
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "merge sort merge sort merge sort"),
      (3L, "aaaaaa"),
      (4L, "x = mergeSort(ys) // MERGESORT fallback"),
      (5L, ""),
      (6L, "no needles here at all"))
    spark.createDataFrame(rows).toDF("doc_id", "text")
  }
  private lazy val grepIdx = {
    val out = java.nio.file.Files.createTempDirectory("tri-spec").toString
    TrigramIndex.build(spark, grepDocs, out,
      TrigramIndex.Params(bucketSize = 4, numPartitions = 4))
  }

  private def bruteGrep(needle: String, ci: Boolean): Map[Long, Long] =
    grepDocs.collect().map { r =>
      val hay0 = r.getString(1)
      val hay = if (ci) hay0.toLowerCase else hay0
      val ndl = if (ci) needle.toLowerCase else needle
      var n = 0L; var at = hay.indexOf(ndl)
      while (at >= 0) { n += 1; at = hay.indexOf(ndl, at + ndl.length) }
      r.getLong(0) -> n
    }.filter(_._2 > 0).toMap

  test("trigram grep equals brute-force substring search (cs + ci)") {
    val needles = Seq("merge", "Sort", "eSort(", "sort me", "aaa", "e q",
      "lazy dog", "zzz", "Sort on small", "rt(")
    for (ndl <- needles; ci <- Seq(false, true)) {
      val got = grepIdx.grep(grepDocs, ndl, ci).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == bruteGrep(ndl, ci), s"needle='$ndl' ci=$ci")
    }
  }

  test("sub-trigram needles fall back to a verification scan, still exact") {
    for (ndl <- Seq("qu", "a", "; ")) {
      val got = grepIdx.grep(grepDocs, ndl).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == bruteGrep(ndl, ci = false), s"needle='$ndl'")
    }
  }

  test("overlapping occurrences count non-overlapping (replace-all) times") {
    // "aaaaaa" contains "aaa" at 4 offsets but replace-all removes 2
    val got = grepIdx.grep(grepDocs, "aaa").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(3L) == 2L)
  }

  test("needle trigram filter is pushed down to the parquet scan") {
    val tris = TrigramIndex.trigramsOf("merge")
    val plan = grepIdx.lists.filter(col("tri").isin(tris.toSeq: _*))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("tri"), plan)
  }

  test("literalAlternatives decomposes alternation-of-literal patterns") {
    import TrigramIndex.literalAlternatives
    assert(literalAlternatives("merge (sort|scan)") ==
      Some(Seq("merge sort", "merge scan")))
    assert(literalAlternatives("fast|slow") == Some(Seq("fast", "slow")))
    assert(literalAlternatives("(?:fast|slow) table") ==
      Some(Seq("fast table", "slow table")))
    assert(literalAlternatives("(a|b) x (c|d)") ==
      Some(Seq("a x c", "a x d", "b x c", "b x d")))
    assert(literalAlternatives("merge.*sort").isEmpty) // metachar → scan
    assert(literalAlternatives("me(rg(e|a))x").isEmpty) // nested group
    assert(literalAlternatives("a+").isEmpty)
  }

  test("grepRegex equals brute-force regex search, prefilter or scan") {
    val pats = Seq("Merge(Sort| sort)", "quick|lazy", "m[ae]rge", "aaa+",
      "(?:merge|MERGE)Sort")
    for (pat <- pats) {
      val re = java.util.regex.Pattern.compile(pat)
      val want = grepDocs.collect().map { r =>
        val m = re.matcher(r.getString(1))
        var n = 0L; while (m.find()) n += 1
        r.getLong(0) -> n
      }.filter(_._2 > 0).toMap
      val got = grepIdx.grepRegex(grepDocs, pat).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"pattern='$pat'")
    }
  }

  // ── synonyms ──────────────────────────────────────────────────────
  test("synonym classes parse and close over membership") {
    val syn = Synonyms.parse(Seq("fast, quick, rapid", "# comment",
      "merge, join", "single", "multi word, table"))
    assert(syn("fast") == Seq("fast", "quick", "rapid"))
    assert(syn("rapid") == Seq("fast", "quick", "rapid"))
    assert(syn("merge") == Seq("join", "merge"))
    assert(!syn.contains("single")) // 1-member class expands nothing
    // a multi-token member is dropped, and a class thereby reduced to
    // one member expands nothing either
    assert(!syn.contains("table"))
  }

  test("synonym rewrite produces the expected BOOL text per kind") {
    val syn = Synonyms.parse(Seq("merge, join", "fast, quick"))
    assert(Synonyms.rewrite("AND", "fast AND merge", syn) ==
      ("BOOL", "((fast OR quick) AND (join OR merge))"))
    assert(Synonyms.rewrite("FREE", "fast merge", syn) ==
      ("BOOL", "(fast OR quick OR join OR merge)"))
    // no applicable synonym → untouched
    assert(Synonyms.rewrite("FREE", "sort table", syn) == ("FREE", "sort table"))
    // BOOL: structure, NOT, boosts survive; phrase leaves never expand
    assert(Synonyms.rewrite("BOOL", "(merge^2 OR \"fast sort\") AND NOT quick", syn) ==
      ("BOOL", "(((join OR merge)^2 OR \"fast sort\") AND NOT (fast OR quick))"))
  }

  test("rewritten text round-trips through the parser") {
    val syn = Synonyms.parse(Seq("merge, join", "fast, quick"))
    val (k, t) = Synonyms.rewrite("AND", "fast AND merge", syn)
    assert(k == "BOOL")
    BoolQuery.parse(t) // must not throw
  }

  test("synonym search ≡ the hand-written BOOL equivalent, bit-identical") {
    val syn = Synonyms.parse(Seq("merge, join", "fast, quick"))
    val got = DocsIndex.synonymRankedHits(spark, sf, "AND", "fast AND merge", 20, syn)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val want = DocsIndex.rankedHits(spark, sf, "BOOL",
      "((fast OR quick) AND (join OR merge))", 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  // ── explain ──────────────────────────────────────────────────────
  test("explain rows reproduce brute-force tf/dl and sum to the hit score") {
    val terms = Array("fast", "merge", "sort", "table")
    val rows = DocsIndex.explain(spark, sf, "FREE", "fast merge sort table", 10)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val hits = DocsIndex.rankedHits(spark, sf, "FREE", "fast merge sort table", 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.map(_._1).toSet == hits.keySet)
    // brute-force token stats straight off the documents table
    val docs = DocsIndex.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> graft.tokenize.Tokenizer.tokenize(r.getString(1)))
      .toMap
    rows.foreach { case (d, t, tf, dl, _, _) =>
      assert(terms.contains(t), t)
      assert(tf == docs(d).count(_ == t), s"tf of '$t' in $d")
      assert(dl == docs(d).length, s"dl of $d")
    }
    // per-doc sum of (6-dp rounded) contribs matches the (6-dp rounded)
    // score within the rounding budget
    rows.groupBy(_._1).foreach { case (d, rs) =>
      assert(math.abs(rs.map(_._6).sum - hits(d)) < 5e-6, s"doc $d")
    }
  }

  test("explain covers expansion kinds and boosted queries") {
    // PREFIX: the expanded vocabulary terms appear in the breakdown
    val pr = DocsIndex.explain(spark, sf, "PREFIX", "s*", 5).collect()
    assert(pr.nonEmpty)
    assert(pr.forall(_.getString(1).startsWith("s")), pr.map(_.getString(1)).toSeq)
    assert(pr.map(_.getString(1)).distinct.length > 1) // >1 expanded term
    // boosted FREE: Σcontrib still reproduces the boosted hit score
    val q = "fast^2 merge sort^0.5"
    val hits = DocsIndex.rankedHits(spark, sf, "FREE", q, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = DocsIndex.explain(spark, sf, "FREE", q, 10).collect()
    assert(rows.map(_.getLong(0)).toSet == hits.keySet)
    rows.groupBy(_.getLong(0)).foreach { case (d, rs) =>
      assert(math.abs(rs.map(_.getDouble(5)).sum - hits(d)) < 5e-6, s"doc $d")
    }
  }

  // ── fuzzy ────────────────────────────────────────────────────────
  test("FUZZY parses, expands by edit distance, and ranks as the OR") {
    import graft.search.QueryParser
    assert(QueryParser.parse("sow~1")._1 == "FUZZY")
    assert(QueryParser.fuzzyDist("sow~1") == 1)
    assert(QueryParser.fuzzyDist("sow~2") == 2)
    assert(QueryParser.fuzzyDist("sow") == 1) // forced-kind default
    // out-of-range distance still parses FUZZY, clamped to the cap —
    // never a silent degrade to an exact free-text search
    assert(QueryParser.parse("sow~3")._1 == "FUZZY")
    assert(QueryParser.fuzzyDist("sow~3") == 2)
    assert(QueryParser.termsFor("FUZZY", "Sow~1").toSeq == Seq("sow"))
    // quoted proximity is NOT fuzzy
    assert(QueryParser.parse("\"merge sort\"~3")._1 != "FUZZY")
    val (_, searcher, _) = DocsIndex.get(spark, sf)
    val exp = searcher.dictLookupFuzzy("sow", 1).map(_.term).toSeq
    assert(exp == Seq("row", "slow").sortBy(t =>
      searcher.dictLookup(Array(t)).head.termId), exp)
    val fz = searcher.hits("FUZZY", "sow~1", 20).collect()
      .map(h => (h.docId, h.score)).toSeq.sortBy(_._1)
    val or = searcher.hits("OR", "row OR slow", 20).collect()
      .map(h => (h.docId, h.score)).toSeq.sortBy(_._1)
    assert(fz == or) // bit-identical to the expanded disjunction
    assert(fz.nonEmpty)
    // zero-expansion queries are empty, not an error
    assert(searcher.hits("FUZZY", "qqqqqqq~1", 20).collect().isEmpty)
  }

  // ── co-occurrence ────────────────────────────────────────────────
  test("cooccurrence equals a brute-force sliding-window pair count") {
    val docs = spark.createDataFrame(Seq(
      (0L, "aa bb aa bb cc"), (1L, "bb aa aa"), (2L, "x yy zz"),
      (3L, ""), (4L, "pp qq rr ss"))).toDF("doc_id", "text")
    val got = graft.pipeline.Curation.cooccurrence(spark, docs, 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.collect().foreach { r =>
      val ts = graft.tokenize.Tokenizer.tokenize(r.getString(1))
      for {
        i <- ts.indices
        j <- (i + 1) until math.min(i + 3, ts.length)
      } want((ts(i), ts(j))) = want.getOrElse((ts(i), ts(j)), 0L) + 1L
    }
    assert(got == want.toMap, s"got=$got want=$want")
    // window bound respected, asserted directly: in doc 4 the only
    // pp→ss occurrence is at distance 3 (beyond window 2), while
    // pp→rr at distance 2 is in
    assert(!got.contains(("pp", "ss")))
    assert(got(("pp", "rr")) == 1L)
  }

  // ── kNN join ─────────────────────────────────────────────────────
  test("knnJoin equals bruteTopK run with every vector as a query") {
    import spark.implicits._
    val rnd = new java.util.SplittableRandom(99L)
    val vecs = (0L until 60L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))).toArray
    // plant an exact duplicate pair to exercise the cos-tie id order
    val planted = vecs.updated(7, (7L, vecs(3)._2.clone()))
    val ds = spark.createDataset(planted.toSeq)
    val got = Ann.knnJoin(ds, 5, numBlocks = 4)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val want = Ann.bruteTopK(ds, planted, 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.toSeq == want.toSeq)
    assert(got.count(_._1 == 7L) == 5)
  }
}
