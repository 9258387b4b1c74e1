package graft.search

import graft.tokenize.Tokenizer

/** Query-time synonym expansion — the analyzer surface of Lucene's
  * SynonymGraphFilter / Solr synonyms.txt, expressed as a pure QUERY
  * REWRITE: each query term with an entry in the synonym map becomes an
  * OR-group over its equivalence class, and the rewritten query is
  * ordinary BOOL text evaluated by the existing walks. Nothing in the
  * index or the evaluators changes, so every tier (relational WAND,
  * serving, multi-segment, LSM merge-on-read) and every composition
  * (filters, scopes, pagination, boosts kept on BOOL input) inherits
  * synonyms for free — the query-rewrite posture production engines use
  * for index-independent synonyms.
  *
  * Scoring semantics: an expanded group is a disjunctive leaf whose
  * members score with their OWN corpus statistics (the same rule as
  * prefix/regex dictionary expansion, SURVEY §2.8 X6/X8) — BM25 over the
  * present distinct terms of the expression. Phrase and proximity atoms
  * are NOT expanded (per-position alternation is a graph query the
  * posting walk does not express; Lucene draws the same line at query
  * time), and a term under NOT negates its whole group — `NOT fast`
  * with fast≡quick must reject quick-docs too.
  */
object Synonyms {

  /** Equivalence classes, Solr format: one class per line, members
    * comma-separated ("fast, quick, rapid"). Members are normalized
    * through the tokenizer (a multi-token member is dropped: only
    * single-term classes are expressible as term leaves). Every member
    * maps to the full class. */
  def parse(lines: Seq[String]): Map[String, Seq[String]] = {
    val classes = lines.iterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(_.split(",").iterator.map(_.trim).flatMap { m =>
        val ts = Tokenizer.tokenize(m)
        if (ts.length == 1) Some(ts.head) else None
      }.toVector.distinct.sorted)
      .filter(_.length >= 2)
      .toVector
    classes.flatMap(c => c.map(m => m -> c)).groupBy(_._1)
      .map { case (m, vs) => m -> vs.flatMap(_._2).distinct.sorted.toSeq }
  }

  /** The OR-group for one term: its class members sorted, itself
    * included; a term with no (applicable) class stays a plain leaf. */
  private def group(t: String, syn: Map[String, Seq[String]]): BoolQuery.Expr = {
    val members = (syn.getOrElse(t, Seq.empty) :+ t).distinct.sorted
    if (members.length < 2) BoolQuery.Term(t)
    else BoolQuery.Or(members.map(BoolQuery.Term(_): BoolQuery.Expr).toList)
  }

  private def rewriteExpr(e: BoolQuery.Expr,
                          syn: Map[String, Seq[String]]): BoolQuery.Expr =
    e match {
      case BoolQuery.Term(t) => group(t, syn)
      case BoolQuery.And(cs) => BoolQuery.And(cs.map(rewriteExpr(_, syn)))
      case BoolQuery.Or(cs) => BoolQuery.Or(cs.map(rewriteExpr(_, syn)))
      case BoolQuery.Not(c) => BoolQuery.Not(rewriteExpr(c, syn))
      case BoolQuery.Boost(c, w) => BoolQuery.Boost(rewriteExpr(c, syn), w)
      case leaf => leaf // Phrase / Near / Pattern: never expanded
    }

  /** Rewrite a query to synonym-expanded BOOL text. Accepted kinds:
    * FREE/OR (any expanded term matches), AND (all groups must match),
    * BOOL (terms expand in place, structure/boosts/NOT preserved).
    * Returns (kind, text) to hand to any tier's ordinary entry point —
    * ("BOOL", rendered) when the grammar is needed, the input unchanged
    * when no term has a synonym. */
  def rewrite(kind: String, text: String,
              syn: Map[String, Seq[String]]): (String, String) = {
    def unchanged = (kind, text)
    if (syn.isEmpty) return unchanged
    kind match {
      case "FREE" | "OR" | "AND" =>
        val terms = QueryParser.termsFor(kind, text).distinct.toList
        if (terms.isEmpty || !terms.exists(syn.contains)) unchanged
        else {
          val groups = terms.map(group(_, syn))
          val ast = if (kind == "AND") {
            if (groups.length == 1) groups.head else BoolQuery.And(groups)
          } else {
            // a FREE/OR query is one flat disjunction over every
            // member — nested Or(Or(..)) and the flat form match and
            // score identically; flatten for the parser-normal shape
            val members = groups.flatMap {
              case BoolQuery.Or(cs) => cs
              case l => List(l)
            }.distinct
            if (members.length == 1) members.head else BoolQuery.Or(members)
          }
          ("BOOL", BoolQuery.render(ast))
        }
      case "BOOL" =>
        val ast = BoolQuery.parse(text)
        val rewritten = rewriteExpr(ast, syn)
        if (rewritten == ast) unchanged else ("BOOL", BoolQuery.render(rewritten))
      case _ => unchanged // PHRASE/NEAR/ONEAR/PREFIX/REGEX: no term leaves
    }
  }
}
