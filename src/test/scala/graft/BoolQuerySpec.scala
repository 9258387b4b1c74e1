package graft

import org.apache.spark.sql.functions._

import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.{DatasetCorpusSource, Synthesizer}
import graft.search.{BoolQuery, QueryParser, Searcher, ServingSearcher}
import graft.search.BoolQuery.{And, Or, Term}

/** Nested boolean grammar: parser precedence, evaluation equivalences
  * against the flat AND/OR paths, and serving-tier parity. */
class BoolQuerySpec extends SparkSpec {

  lazy val seg = {
    val (s, _) = SegmentBuilder.build(spark,
      DatasetCorpusSource(Synthesizer.corpus(spark, 300L)),
      BuildParams(numPartitions = 4, bucketSize = 64, positional = true))
    s
  }
  lazy val searcher = new Searcher(spark, seg)

  private def top2(t: String): Array[String] =
    seg.dict.orderBy(desc("df")).limit(4).collect().map(_.term)

  test("parser: AND binds tighter than OR; parens override") {
    assert(BoolQuery.parse("aa AND bb OR cc") ==
      Or(List(And(List(Term("aa"), Term("bb"))), Term("cc"))))
    assert(BoolQuery.parse("aa AND (bb OR cc)") ==
      And(List(Term("aa"), Or(List(Term("bb"), Term("cc"))))))
    assert(BoolQuery.parse("(aa AND bb) OR cc") ==
      Or(List(And(List(Term("aa"), Term("bb"))), Term("cc"))))
    // implicit AND between adjacent atoms
    assert(BoolQuery.parse("aa bb") == And(List(Term("aa"), Term("bb"))))
    // camelCase atom splits into an AND of its pieces
    assert(BoolQuery.parse("getValue") == And(List(Term("get"), Term("value"))))
    // a sub-MinLen atom drops out of its enclosing AND (neutral element)
    assert(BoolQuery.parse("aa AND b") == Term("aa"))
    // malformed input throws (QueryParser.parse falls back to FREE)
    intercept[IllegalArgumentException](BoolQuery.parse("(aa AND bb"))
    intercept[IllegalArgumentException](BoolQuery.parse("aa AND"))
    intercept[IllegalArgumentException](BoolQuery.parse("AND aa"))
    assert(QueryParser.parse("(fast merge")._1 == "FREE")
    assert(QueryParser.parse("(aa OR bb) AND cc")._1 == "BOOL")
    assert(QueryParser.parse("aa AND bb OR cc")._1 == "BOOL")
    assert(QueryParser.parse("aa AND bb")._1 == "AND")
  }

  test("BOOL 'a AND b' is bit-identical to flat AND; 'a OR b' to flat OR") {
    val ts = top2("")
    val a = ts(0); val b = ts(1)
    val flatAnd = searcher.hits("AND", s"$a AND $b", 15).collect()
      .map(h => (h.rank, h.docId, h.score)).toSeq
    val boolAnd = searcher.hits("BOOL", s"$a AND $b", 15).collect()
      .map(h => (h.rank, h.docId, h.score)).toSeq
    assert(flatAnd.nonEmpty && boolAnd == flatAnd)

    val flatOr = searcher.hitsExhaustive("OR", s"$a OR $b", 15).collect()
      .map(h => (h.rank, h.docId, h.score)).toSeq
    val boolOr = searcher.hits("BOOL", s"$a OR $b", 15).collect()
      .map(h => (h.rank, h.docId, h.score)).toSeq
    assert(flatOr.nonEmpty && boolOr == flatOr)
  }

  test("BOOL nested evaluation matches a relational oracle") {
    import spark.implicits._
    val ts = top2("")
    val a = ts(0); val b = ts(1); val c = ts(2)
    val got = searcher.hits("BOOL", s"($a OR $b) AND $c", 1000).collect()
      .map(_.docId).toSet
    // oracle: doc term sets from the decoded postings
    val byTerm = graft.search.ExactScorer.decodedPostings(spark, seg)
      .toDF("termId", "docId", "tf")
      .join(seg.dict.select($"termId", $"term"), "termId")
      .select($"docId", $"term").as[(Long, String)].collect()
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).toSet }
    val want = byTerm.collect {
      case (d, s) if (s(a) || s(b)) && s(c) => d
    }.toSet
    assert(want.nonEmpty, "fixture terms must co-occur")
    assert(got == want)
  }

  test("NOT: parses with highest precedence, excludes docs, rejects pure negation") {
    import graft.search.BoolQuery.Not
    assert(BoolQuery.parse("aa AND NOT bb") ==
      And(List(Term("aa"), Not(Term("bb")))))
    assert(BoolQuery.parse("aa NOT bb") == // implicit AND before NOT
      And(List(Term("aa"), Not(Term("bb")))))
    assert(BoolQuery.parse("NOT (aa OR bb) AND cc") ==
      And(List(Not(Or(List(Term("aa"), Term("bb")))), Term("cc"))))
    assert(QueryParser.parse("aa AND NOT bb")._1 == "BOOL")

    val ts = top2("")
    val a = ts(0); val b = ts(1)
    val got = searcher.hits("BOOL", s"$a AND NOT $b", 1000).collect().map(_.docId).toSet
    import spark.implicits._
    val byTerm = graft.search.ExactScorer.decodedPostings(spark, seg)
      .toDF("termId", "docId", "tf")
      .join(seg.dict.select($"termId", $"term"), "termId")
      .select($"docId", $"term").as[(Long, String)].collect()
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).toSet }
    val want = byTerm.collect { case (d, s) if s(a) && !s(b) => d }.toSet
    assert(got == want)

    // pure-negative queries reject loudly, relational AND serving path
    intercept[IllegalArgumentException](
      searcher.hits("BOOL", s"NOT $a", 10).collect())
    val serving = new ServingSearcher(spark, seg)
    intercept[IllegalArgumentException](serving.hits("BOOL", s"NOT $a", 10))
    serving.close()
  }

  test("unsatisfiable AND branch returns empty without error") {
    val ts = top2("")
    assert(searcher.hits("BOOL", s"${ts(0)} AND zzzznotaterm", 10).collect().isEmpty)
    // but an OR escape keeps it satisfiable
    assert(searcher.hits("BOOL", s"(${ts(0)} OR zzzznotaterm) AND ${ts(1)}", 10)
      .collect().nonEmpty)
  }

  test("serving tier evaluates BOOL bit-identically to the relational path") {
    val ts = top2("")
    val q = s"(${ts(0)} OR ${ts(1)}) AND ${ts(2)}"
    val rel = searcher.hits("BOOL", q, 10).collect()
      .map(h => (h.rank, h.docId, h.score)).toSeq
    val serving = new ServingSearcher(spark, seg)
    val srv = serving.hits("BOOL", q, 10).map(h => (h.rank, h.docId, h.score)).toSeq
    serving.close()
    assert(rel.nonEmpty && srv == rel)
  }

  test("print → parse round-trips 500 random ASTs") {
    import BoolQuery._
    val rnd = new scala.util.Random(42)
    val words = Array("alpha", "beta", "gamma", "delta", "omega")
    def leaf(): Expr = rnd.nextInt(8) match {
      case 0 =>
        Phrase(List.fill(2 + rnd.nextInt(2))(words(rnd.nextInt(words.length))))
      case 1 => // distinct terms: the parser deduplicates NEAR members
        val ts = rnd.shuffle(words.toList).take(2 + rnd.nextInt(2))
        val w = 1 + rnd.nextInt(9)
        // negative w = the ordered (`~>`) variant
        BoolQuery.Near(ts, if (rnd.nextBoolean()) w else -w)
      case 2 => // prefix atom: lowercase-alpha operand round-trips the tokenizer
        Pattern(words(rnd.nextInt(words.length)).take(2 + rnd.nextInt(3)),
          isRegex = false)
      case 3 => // regex atom: parens inside the pattern are owned by it
        val (a, b) = (words(rnd.nextInt(words.length)), words(rnd.nextInt(words.length)))
        Pattern(if (rnd.nextBoolean()) s"($a|$b)" else a.take(2) + ".*",
          isRegex = true)
      case _ => Term(words(rnd.nextInt(words.length)))
    }
    // boost weights as (text, parsed-double) so print→parse is exact
    val boostWs = Array("2", "3", "0.5", "1.5", "2.5").map(t => (t, t.toDouble))
    // boostable shapes: leaves (except regex — '^' is regex syntax) and
    // parenthesized groups; never Not (NOT a^2 binds the boost to a) and
    // never nested Boost (a^2^3 is not a boost chain)
    def maybeBoost(e: Expr): Expr = e match {
      case Pattern(_, true) | Not(_) | Boost(_, _) => e
      case _ if rnd.nextInt(4) == 0 =>
        val (_, w) = boostWs(rnd.nextInt(boostWs.length))
        Boost(e, w)
      case _ => e
    }
    def gen(depth: Int): Expr =
      if (depth == 0) maybeBoost(leaf())
      else rnd.nextInt(4) match {
        case 0 => maybeBoost(And(List.fill(2 + rnd.nextInt(2))(gen(depth - 1))))
        case 1 => maybeBoost(Or(List.fill(2 + rnd.nextInt(2))(gen(depth - 1))))
        case 2 => Not(gen(depth - 1)) match {
          // printable negations only: the printer wraps NOT's operand
          case n => n
        }
        case _ => maybeBoost(leaf())
      }
    // print with full parenthesization — unambiguous regardless of the
    // precedence rules, so parse(print(e)) must reproduce e exactly.
    // BoolQuery.render IS that printer (promoted to main for the synonym
    // rewrite); fuzzing through it pins the public round-trip contract.
    def print(e: Expr): String = BoolQuery.render(e)
    // normalize: the parser collapses 1-element And/Or and 1-token
    // quotes — generate only shapes it preserves (done above: ≥2
    // children, ≥2 phrase tokens), so equality is exact
    (1 to 500).foreach { _ =>
      val e = gen(1 + rnd.nextInt(3))
      val printed = print(e)
      assert(BoolQuery.parse(printed) == e, printed)
    }
  }
}
