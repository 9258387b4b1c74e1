package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tokenize.Tokenizer

class TokenizerSpec extends AnyFunSuite {

  private def tok(s: String): Seq[String] = Tokenizer.tokenize(s).toSeq

  test("golden cases from FIXTURES.md") {
    assert(tok("parseHttpRequest2") == Seq("parse", "http", "request"))
    assert(tok("snake_case_id") == Seq("snake", "case", "id"))
    assert(tok("XMLHttpRequest") == Seq("xml", "http", "request"))
    assert(tok("\"string with spaces\"") == Seq("string", "with", "spaces"))
    assert(tok("x=1") == Seq.empty)
  }

  test("separators: any non [A-Za-z0-9_] splits") {
    assert(tok("foo.bar(baz, qux); // comment") ==
      Seq("foo", "bar", "baz", "qux", "comment"))
    assert(tok("a+b-c*d") == Seq.empty) // all length-1
    assert(tok("def main(args: Array[String])") ==
      Seq("def", "main", "args", "array", "string"))
  }

  test("camel & upper-run boundaries") {
    assert(tok("HTTPServer") == Seq("http", "server"))
    assert(tok("getHTTPResponseCode") == Seq("get", "http", "response", "code"))
    assert(tok("ALLCAPS") == Seq("allcaps"))
    assert(tok("mixedCASEWord") == Seq("mixed", "case", "word"))
  }

  test("digit boundaries and pure numbers dropped") {
    assert(tok("utf8Decoder") == Seq("utf", "decoder"))
    assert(tok("v2Engine 42 1234") == Seq("engine"))
    assert(tok("sha256sum") == Seq("sha", "sum"))
  }

  test("length bounds: <2 and >64 dropped") {
    assert(tok("a ab abc") == Seq("ab", "abc"))
    val long = "x" * 65
    assert(tok(long) == Seq.empty)
    assert(tok("y" * 64) == Seq("y" * 64))
  }

  test("underscore runs and edges") {
    assert(tok("__init__") == Seq("init"))
    assert(tok("_a_b_") == Seq.empty)
    assert(tok("a__b cd__ef") == Seq("cd", "ef"))
  }

  test("null / empty safe") {
    assert(tok("") == Seq.empty)
    assert(Tokenizer.tokenize(null).isEmpty)
  }

  test("queryTerms: distinct sorted") {
    assert(Tokenizer.queryTerms("zeta alpha zeta Beta").toSeq ==
      Seq("alpha", "beta", "zeta"))
  }

  test("idempotent: tokenizing a token yields itself") {
    val tokens = Tokenizer.tokenize("parseHttpRequest2 fooBar_baz XMLHttp v8x9")
    tokens.foreach { t => assert(tok(t) == Seq(t), s"token $t not stable") }
  }

  test("QueryParser: mixed connectives route to the nested grammar, keywords never leak") {
    import graft.search.QueryParser
    val (k0, t0) = QueryParser.parse("alpha AND beta")
    assert(k0 == "AND" && t0.toSeq == Seq("alpha", "beta"))
    // since round 3 a mixed query parses with real precedence (BOOL)
    // instead of the flat safe-OR reading; the connectives are still
    // grammar, never search terms
    val (kind, terms) = QueryParser.parse("alpha AND beta OR gamma")
    assert(kind == "BOOL")
    assert(terms.toSeq == Seq("alpha", "beta", "gamma"),
      "embedded AND must not leak the term 'and': " + terms.mkString(","))
    assert(QueryParser.termsFor("OR", "alpha AND beta OR gamma").toSeq ==
      Seq("alpha", "beta", "gamma"))
    assert(QueryParser.termsFor("AND", "key AND value AND hash").toSeq ==
      Seq("hash", "key", "value"))
  }
}
