package graft

import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.{DatasetCorpusSource, Synthesizer}
import graft.search.{QueryParser, Searcher}
import graft.tokenize.Tokenizer

/** Ordered proximity (`a BEFORE/w b`, kind ONEAR): match = one pick per
  * term, positions strictly increasing in query order, span (last−first)
  * ≤ w. Checked against token-level brute force; scores must equal the
  * unordered NEAR walk's (both are BM25 over the distinct terms); the
  * match set must be the order-constrained subset of NEAR's. */
class OnearSpec extends SparkSpec {

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

  /** Token-level brute force: all ordered picks via DP-free scan. */
  private def bruteMatches(terms: Seq[String], w: Int): Set[Long] =
    toksByDoc.collect { case (d, toks)
        if {
          val pos = terms.map(t => toks.zipWithIndex.collect {
            case (tk, i) if tk == t => i
          })
          // minimal ordered span via exhaustive picks (fixture docs are
          // small): any chain p0 < p1 < ... with last - first <= w
          def chains(lists: Seq[Array[Int]], prev: Int, first: Int): Boolean =
            lists match {
              case Nil => true
              case h +: rest =>
                h.exists(p => p > prev && (rest.nonEmpty || p - first <= w) &&
                  chains(rest, p, first))
            }
          pos.forall(_.nonEmpty) &&
            pos.head.exists(p0 => chains(pos.tail, p0, p0))
        } => d
    }.toSet

  private def pair: (String, String) = {
    // a term pair that co-occurs ordered in at least one doc
    val cand = toksByDoc.values.flatMap { toks =>
      toks.distinct.combinations(2).filter(_.length == 2).take(20)
        .map(c => (c(0), c(1)))
    }
    cand.find { case (a, b) =>
      bruteMatches(Seq(a, b), 5).nonEmpty && a != b
    }.get
  }

  test("ONEAR == token-level ordered-span brute force") {
    val (a, b) = pair
    for (w <- Seq(1, 3, 8)) {
      val got = searcher.hits("ONEAR", s"$a BEFORE/$w $b", 10000)
        .collect().map(_.docId).toSet
      assert(got == bruteMatches(Seq(a, b), w), s"'$a BEFORE/$w $b'")
    }
  }

  test("ONEAR match set ⊆ NEAR's; scores equal NEAR's on shared docs") {
    val (a, b) = pair
    val w = 5
    val on = searcher.hits("ONEAR", s"$a BEFORE/$w $b", 10000).collect()
      .map(h => h.docId -> h.score).toMap
    val near = searcher.hits("NEAR", s"$a NEAR/$w $b", 10000).collect()
      .map(h => h.docId -> h.score).toMap
    assert(on.keySet.subsetOf(near.keySet))
    assert(on.nonEmpty)
    on.foreach { case (d, s) => assert(s == near(d), s"doc $d") }
  }

  test("ONEAR is order-sensitive and rejects repeated terms") {
    val (a, b) = pair
    val fwd = searcher.hits("ONEAR", s"$a BEFORE/3 $b", 10000)
      .collect().map(_.docId).toSet
    val rev = searcher.hits("ONEAR", s"$b BEFORE/3 $a", 10000)
      .collect().map(_.docId).toSet
    assert(fwd == bruteMatches(Seq(a, b), 3))
    assert(rev == bruteMatches(Seq(b, a), 3))
    intercept[IllegalArgumentException] {
      QueryParser.termsFor("ONEAR", s"$a BEFORE/3 $a")
    }
    assert(QueryParser.parse(s"$a BEFORE/3 $b")._1 == "ONEAR")
  }

  test("ONEAR matchCount agrees with the hit walk") {
    val (a, b) = pair
    val q = s"$a BEFORE/4 $b"
    val hitDocs = searcher.hits("ONEAR", q, 10000).collect().map(_.docId).toSet
    assert(searcher.matchCount("ONEAR", q) == hitDocs.size)
  }

  test("ordered atom in the boolean grammar == kind ONEAR, composes, serves") {
    val (a, b) = pair
    // pure ordered atom ≡ the ONEAR kind
    val asKind = searcher.hits("ONEAR", s"$a BEFORE/5 $b", 10000).collect()
      .map(h => (h.docId, h.score)).toSet
    val asBool = searcher.hits("BOOL", s""""$a $b"~>5""", 10000).collect()
      .map(h => (h.docId, h.score)).toSet
    assert(asBool == asKind && asBool.nonEmpty)
    // composed: ("a b"~>5 OR zzz) AND a — same docs here (zzz unknown)
    val comp = searcher.hits("BOOL", s"""("$a $b"~>5 OR zzznotaterm) AND $a""", 10000)
      .collect().map(_.docId).toSet
    assert(comp == asKind.map(_._1))
    // serving-tier parity on the composed form
    val serving = new graft.search.ServingSearcher(spark, seg)
    try {
      val srv = serving.hits("BOOL", s"""("$a $b"~>5 OR zzznotaterm) AND $a""", 10000)
        .map(_.docId).toSet
      assert(srv == comp)
    } finally serving.close()
    // repeated terms rejected in the ordered atom
    intercept[IllegalArgumentException] {
      graft.search.BoolQuery.parse(s""""$a $a"~>3""")
    }
  }

  test("three-term ordered chain") {
    // find a doc with 3 distinct terms appearing in order within 10
    val trip = toksByDoc.values.flatMap { toks =>
      val d = toks.distinct
      if (d.length >= 3) Some((d(0), d(1), d(2))) else None
    }.find { case (a, b, c) =>
      a != b && b != c && a != c && bruteMatches(Seq(a, b, c), 30).nonEmpty
    }
    trip.foreach { case (a, b, c) =>
      val got = searcher.hits("ONEAR", s"$a BEFORE/30 $b BEFORE/30 $c", 10000)
        .collect().map(_.docId).toSet
      assert(got == bruteMatches(Seq(a, b, c), 30))
    }
    assert(trip.nonEmpty)
  }
}
