package graft

import org.apache.spark.sql.functions._

import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.{DatasetCorpusSource, Synthesizer}
import graft.search.{BoolQuery, MultiSearcher, QueryParser, Searcher, ServingSearcher}
import graft.tokenize.Tokenizer

/** Query-time term boosting (`merge^2`, `"fast merge"^1.5`, `s*^0.5`,
  * `(a OR b)^2`): matching unchanged, each term's BM25 contribution
  * multiplied by its effective weight (max across mentions, nested group
  * boosts multiply). WAND pruning stays sound because the cursor scales
  * its stored block-max bounds together with its idf. */
class BoostSpec extends SparkSpec {

  val params: BuildParams =
    BuildParams(numPartitions = 4, bucketSize = 64, positional = true)

  lazy val seg = SegmentBuilder.build(spark,
    DatasetCorpusSource(Synthesizer.corpus(spark, 450L)), params)._1
  lazy val searcher = new Searcher(spark, seg)

  private lazy val topTerms =
    seg.dict.orderBy(desc("df")).limit(4).collect().map(_.term)

  private lazy val tokensOf: Map[Long, Array[String]] = {
    import spark.implicits._
    val byPath = Synthesizer.corpus(spark, 450L).collect()
      .map(r => r.path -> Tokenizer.tokenize(r.content)).toMap
    seg.docs.select($"docId", $"path").as[(Long, String)].collect()
      .map { case (d, p) => d -> byPath(p) }.toMap
  }

  /** Weighted brute force: docs passing `matches`, scored by
    * Σ weight(t)·BM25(t) over present query terms. */
  private def bruteWeighted(matches: Array[String] => Boolean,
                            weights: Map[String, Double],
                            k: Int): Seq[(Long, Double)] = {
    val dfByTerm = seg.dict.collect().map(e => e.term -> e.df).toMap
    tokensOf.toSeq.collect { case (d, toks) if matches(toks) =>
      val present = weights.keys.filter(toks.contains).toSeq.sorted
      val dl = toks.length
      var score = 0.0
      present.foreach { t =>
        val idf = graft.model.BM25.idf(seg.stats.numDocs, dfByTerm(t))
        val tf = toks.count(_ == t)
        // same FP association as the engine: the weight scales the idf
        // BEFORE the impact product (TermCursor.idf = idf0 * boost)
        score += graft.model.BM25.impact(weights(t) * idf, tf, dl,
          seg.stats.avgDocLen)
      }
      (d, score)
    }.sortBy { case (d, s) => (-s, d) }.take(k)
  }

  test("parser: boost suffixes on words, quotes, prefixes, groups") {
    import BoolQuery._
    assert(parse("merge^2 AND slow") ==
      And(List(Boost(Term("merge"), 2.0), Term("slow"))))
    assert(parse("\"fast merge\"^1.5 OR slow") ==
      Or(List(Boost(Phrase(List("fast", "merge")), 1.5), Term("slow"))))
    assert(parse("\"merge sort\"~3^2 AND table") ==
      And(List(Boost(Near(List("merge", "sort"), 3), 2.0), Term("table"))))
    assert(parse("(s*^0.5 OR slow) AND table") ==
      And(List(Or(List(Boost(Pattern("s", isRegex = false), 0.5), Term("slow"))),
        Term("table"))))
    assert(parse("(fast OR slow)^2 AND merge") ==
      And(List(Boost(Or(List(Term("fast"), Term("slow"))), 2.0), Term("merge"))))
    // a regex atom owns its '^' — never a boost
    assert(parse("re:ab^2 AND slow") ==
      And(List(Pattern("ab^2", isRegex = true), Term("slow"))))

    // effective weights: nested boosts multiply, max across mentions,
    // unboosted mention counts 1.0 (so `a^0.5 OR a` weighs 1.0 → pruned)
    val (tm, pm) = boostMaps(parse("(fast^2 OR slow)^3 AND fast"))
    assert(tm == Map("fast" -> 6.0, "slow" -> 3.0) && pm.isEmpty)
    assert(boostMaps(parse("fast^0.5 OR fast"))._1.isEmpty)
    val (_, pm2) = boostMaps(parse("s*^2 OR slow"))
    assert(pm2 == Map(Pattern("s", isRegex = false) -> 2.0))

    // flat kinds: per-word peel; the tokenizer drops the suffix itself
    assert(QueryParser.boosts("FREE", "fast^2 merge sort^0.5") ==
      Map("fast" -> 2.0, "sort" -> 0.5))
    assert(QueryParser.boosts("AND", "fast^2 AND merge") == Map("fast" -> 2.0))
    assert(QueryParser.termsFor("FREE", "fast^2 merge sort^0.5").toSeq ==
      Seq("fast", "merge", "sort"))
    assert(QueryParser.parse("fast^2 merge")._1 == "FREE")
  }

  test("boosted FREE == weighted brute force, and WAND pruning stays sound") {
    val Array(a, b, c, _*) = topTerms
    val q = s"$a^2 $b $c^0.5"
    val weights = Map(a -> 2.0, b -> 1.0, c -> 0.5)
    val got = searcher.hits("FREE", q, 30).collect()
      .map(h => (h.docId, h.score)).toSeq
    val want = bruteWeighted(
      toks => toks.contains(a) || toks.contains(b) || toks.contains(c),
      weights, 30)
    assert(got.nonEmpty && got == want)
    // pruned (block-max WAND with scaled bounds) ≡ exhaustive
    val ex = searcher.hitsExhaustive("FREE", q, 30).collect()
      .map(h => (h.docId, h.score)).toSeq
    assert(got == ex)
    // boosting actually changed the ranking vs the unboosted query
    val plain = searcher.hits("FREE", s"$a $b $c", 30).collect()
      .map(_.docId).toSeq
    assert(got.map(_._1) != plain)
  }

  test("boosted AND == weighted brute force") {
    val Array(a, b, _*) = topTerms
    val got = searcher.hits("AND", s"$a^3 AND $b", 25).collect()
      .map(h => (h.docId, h.score)).toSeq
    val want = bruteWeighted(
      toks => toks.contains(a) && toks.contains(b),
      Map(a -> 3.0, b -> 1.0), 25)
    assert(got.nonEmpty && got == want)
  }

  test("boosted BOOL (phrase leaf + group boost) == weighted brute force") {
    val Array(a, b, c, _*) = topTerms
    def hasPhrase(toks: Array[String], ph: Seq[String]): Boolean =
      toks.indices.exists(i => i + ph.length <= toks.length &&
        ph.indices.forall(j => toks(i + j) == ph(j)))
    // phrase-leaf boost: both members weigh 2
    val q = s"""("$a $b"^2 OR $c) AND NOT zzznotaterm"""
    val got = searcher.hits("BOOL", q, 25).collect()
      .map(h => (h.docId, h.score)).toSeq
    val want = bruteWeighted(
      toks => hasPhrase(toks, Seq(a, b)) || toks.contains(c),
      Map(a -> 2.0, b -> 2.0, c -> 1.0), 25)
    assert(got.nonEmpty && got == want)
    // group boost distributes; inner boost multiplies
    val q2 = s"($a^2 OR $b)^3 AND $c"
    val got2 = searcher.hits("BOOL", q2, 25).collect()
      .map(h => (h.docId, h.score)).toSeq
    val want2 = bruteWeighted(
      toks => (toks.contains(a) || toks.contains(b)) && toks.contains(c),
      Map(a -> 6.0, b -> 3.0, c -> 1.0), 25)
    assert(got2.nonEmpty && got2 == want2)
  }

  test("boosted pattern leaf weights its whole expansion") {
    val vocab = seg.dict.collect().map(_.term).toSet
    val Array(a, b, _*) = topTerms
    val pre = a.take(2)
    val expand = vocab.filter(_.startsWith(pre))
    assert(expand.nonEmpty)
    val q = s"($pre*^2 OR $b) AND NOT zzznotaterm"
    val got = searcher.hits("BOOL", q, 25).collect()
      .map(h => (h.docId, h.score)).toSeq
    val want = bruteWeighted(
      toks => toks.exists(expand) || toks.contains(b),
      (expand.map(_ -> 2.0) + (b -> 1.0)).toMap, 25)
    assert(got.nonEmpty && got == want)
  }

  test("serving and multi-segment tiers agree bit-for-bit on boosted queries") {
    val Array(a, b, c, _*) = topTerms
    val serving = new ServingSearcher(spark, seg)
    val multi = new MultiSearcher(spark, Seq(seg))
    for (q <- Seq(s"$a^2 $b $c^0.5", s"""("$a $b"^2 OR $c) AND NOT zzznotaterm"""))
    {
      val kind = QueryParser.parse(q)._1
      val rel = searcher.hits(kind, q, 20).collect()
        .map(h => (h.rank, h.docId, h.score)).toSeq
      assert(rel.nonEmpty)
      val srv = serving.hits(kind, q, 20).map(h => (h.rank, h.docId, h.score)).toSeq
      assert(srv == rel, s"serving parity for '$q'")
      // multi-segment path re-derives global stats; ranks must agree
      // (scores equal too on a single segment: same N/df/avgdl)
      val mul = multi.hits(kind, q, 20).collect()
        .map(h => (h.rank, h.docId, h.score)).toSeq
      assert(mul == rel, s"multi parity for '$q'")
    }
    serving.close()
  }
}
