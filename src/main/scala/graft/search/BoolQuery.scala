package graft.search

import graft.tokenize.Tokenizer

/** Nested boolean query grammar — parens + AND/OR/NOT precedence over
  * term atoms. Semantics pinned here (the reference tree was empty at
  * survey time, SURVEY.md §0):
  *
  *   expr := and (OR and)*          -- OR binds loosest
  *   and  := atom ((AND)? atom)*    -- adjacent atoms are implicit AND
  *   atom := NOT atom | '(' expr ')' | WORD
  *
  * Pure-negative queries (satisfied by a document containing none of the
  * terms, e.g. `NOT x`) are rejected by the evaluators — their match set
  * is a corpus-sized complement; embed the negation under a positive
  * requirement (`a AND NOT x`) instead.
  *
  * A WORD atom runs through the shared code tokenizer; a word that
  * splits into several tokens (camelCase, snake_case) becomes the AND of
  * its pieces, and a word that tokenizes to nothing (too short, pure
  * number) drops out of its enclosing AND (neutral element).
  *
  * Matching: a document satisfies the expression over the predicate
  * "term t is present in the document". Scoring: standard BM25 over the
  * DISTINCT terms of the expression that are present in the matching
  * document — identical to how AND/PHRASE score, so `a AND b` evaluates
  * bit-identically through the flat and nested paths, and the DuckDB
  * twin can score relationally.
  */
object BoolQuery {

  sealed trait Expr extends Serializable
  final case class Term(t: String) extends Expr
  /** Quoted phrase atom (`"fast merge"`): present iff the document
    * contains the terms at consecutive positions (the PHRASE-kind
    * predicate), usable anywhere a term is. ≥2 tokens by construction —
    * a 1-token quote collapses to Term. Needs a positional segment. */
  final case class Phrase(ts: List[String]) extends Expr
  /** Proximity atom (`"merge sort"~3`): present iff one occurrence of
    * every DISTINCT term fits in a w-token window (the NEAR-kind
    * minimal-span predicate). Terms deduplicated at construction — a
    * repeated term would trivially satisfy any window against itself. */
  final case class Near(ts: List[String], w: Int) extends Expr
  /** Dictionary-expansion atom: a trailing-wildcard prefix (`s*`) or an
    * anchored regex (`re:pat`). Present iff ANY vocabulary term matching
    * the pattern is present — the PREFIX/REGEX-kind predicate as a leaf.
    * Expansion happens per segment against its own dictionary at query
    * time (same deterministic cap as the standalone kinds). */
  final case class Pattern(raw: String, isRegex: Boolean) extends Expr
  final case class And(cs: List[Expr]) extends Expr
  final case class Or(cs: List[Expr]) extends Expr
  final case class Not(c: Expr) extends Expr

  /** True when the text needs the nested grammar: parentheses, a NOT,
    * both flat connectives mixed in one query, or a quoted phrase
    * combined with anything else (a text that IS one quoted phrase never
    * reaches this check — QueryParser's PHRASE branch consumes it). */
  def isNested(text: String): Boolean =
    text.contains("(") || text.contains(")") || text.contains("\"") ||
      text.split("\\s+").contains("NOT") ||
      (text.split("\\s+AND\\s+").length > 1 && text.contains(" OR "))

  /** All distinct terms of the expression (including under NOT — their
    * presence must still be tested — and inside phrases), sorted. */
  def terms(e: Expr): Array[String] = {
    val out = scala.collection.mutable.SortedSet.empty[String]
    def walk(x: Expr): Unit = x match {
      case Term(t) => out += t
      case Phrase(ts) => out ++= ts
      case Near(ts, _) => out ++= ts
      case Pattern(_, _) => // expands per segment, contributes no fixed term
      case And(cs) => cs.foreach(walk)
      case Or(cs) => cs.foreach(walk)
      case Not(c) => walk(c)
    }
    walk(e)
    out.toArray
  }

  /** The distinct Pattern leaves in first-appearance order. */
  def patterns(e: Expr): Array[Pattern] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[Pattern]
    def walk(x: Expr): Unit = x match {
      case p: Pattern => out += p
      case And(cs) => cs.foreach(walk)
      case Or(cs) => cs.foreach(walk)
      case Not(c) => walk(c)
      case _ =>
    }
    walk(e)
    out.toArray
  }

  /** The distinct positional leaves of the expression in first-
    * appearance order — the slot layout of the walk's extended presence
    * vector. A Phrase is (terms-in-phrase-order, 0); a Near is
    * (distinct terms, w ≥ 1). */
  def posAtoms(e: Expr): Array[(List[String], Int)] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[(List[String], Int)]
    def walk(x: Expr): Unit = x match {
      case Phrase(ts) => out += ((ts, 0))
      case Near(ts, w) => out += ((ts, w))
      case And(cs) => cs.foreach(walk)
      case Or(cs) => cs.foreach(walk)
      case Not(c) => walk(c)
      case _ => // Term / Pattern: no positional slot
    }
    walk(e)
    out.toArray
  }

  /** Compile to a predicate over a presence vector: indices [0, |terms|)
    * are term slots (`slot`), indices [phraseBase, phraseBase+|phrases|)
    * are phrase-match slots (`phraseSlot`, laid out per [[phrases]]).
    * Atoms absent from their map (out-of-dictionary terms, phrases with
    * an out-of-dictionary member) are constant-false. */
  def compile(e: Expr, slot: Map[String, Int],
              phraseSlot: Map[(List[String], Int), Int] = Map.empty,
              phraseBase: Int = 0,
              patternSlots: Map[Pattern, Array[Int]] = Map.empty)
      : Array[Boolean] => Boolean = e match {
    case Term(t) => slot.get(t) match {
      case Some(i) => p => p(i)
      case None => _ => false
    }
    case pat: Pattern => patternSlots.get(pat) match {
      // present iff ANY expanded vocabulary term is present; an empty
      // (or absent) expansion is constant-false
      case Some(ss) if ss.nonEmpty => p => ss.exists(p(_))
      case _ => _ => false
    }
    case Phrase(ts) => phraseSlot.get((ts, 0)) match {
      case Some(j) => val i = phraseBase + j; p => p(i)
      case None => _ => false
    }
    case Near(ts, w) => phraseSlot.get((ts, w)) match {
      case Some(j) => val i = phraseBase + j; p => p(i)
      case None => _ => false
    }
    case And(cs) =>
      val fs = cs.map(compile(_, slot, phraseSlot, phraseBase, patternSlots))
      p => fs.forall(_(p))
    case Or(cs) =>
      val fs = cs.map(compile(_, slot, phraseSlot, phraseBase, patternSlots))
      p => fs.exists(_(p))
    case Not(c) =>
      val f = compile(c, slot, phraseSlot, phraseBase, patternSlots)
      p => !f(p)
  }

  /** A query satisfiable by the all-absent presence vector matches every
    * document containing NONE of its terms — a corpus-sized complement
    * no index walk can (or should) enumerate. Callers reject these
    * (`NOT x` alone); `a AND NOT x` is fine: its matches all contain a. */
  def matchesEmpty(e: Expr, slot: Map[String, Int], nSlots: Int,
                   phraseSlot: Map[(List[String], Int), Int] = Map.empty,
                   phraseBase: Int = 0,
                   patternSlots: Map[Pattern, Array[Int]] = Map.empty): Boolean =
    compile(e, slot, phraseSlot, phraseBase, patternSlots)(
      new Array[Boolean](math.max(nSlots, phraseBase + phraseSlot.size)))

  /** Can the expression be satisfied at all, given that only terms in
    * `known` can ever be present? (An AND containing an unknown term is
    * unsatisfiable; an OR survives if any branch does; a phrase needs
    * every member known.) */
  def satisfiable(e: Expr, known: Set[String]): Boolean = e match {
    case Term(t) => known.contains(t)
    case Phrase(ts) => ts.forall(known.contains)
    case Near(ts, _) => ts.forall(known.contains)
    case Pattern(_, _) => true // expansion decided per segment (conservative)
    case And(cs) => cs.forall(satisfiable(_, known))
    case Or(cs) => cs.exists(satisfiable(_, known))
    case Not(_) => true // a negation can always hold (conservative)
  }

  // ───────────────────────────── parser ───────────────────────────────

  /** Parse or throw IllegalArgumentException on malformed input
    * (unbalanced parens, dangling connective). */
  def parse(text: String): Expr = {
    val toks = lex(text)
    val p = new P(toks)
    val e = p.expr()
    require(p.eof, s"trailing input after position ${p.at}: ${toks.drop(p.at).mkString(" ")}")
    e
  }

  private def lex(text: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQuote = false
    // a `re:` atom owns its parens up to whitespace — but trailing ')'
    // beyond the pattern's own '(' count are grammar, given back (so
    // `(a AND re:x)` closes the group while `re:(a|b)` keeps its parens)
    def flush(): Unit = if (sb.nonEmpty) {
      var tok = sb.toString
      sb.clear()
      if (tok.startsWith("re:")) {
        var opens = tok.count(_ == '(')
        var closes = tok.count(_ == ')')
        var giveBack = 0
        while (closes > opens && tok.endsWith(")")) {
          tok = tok.dropRight(1); closes -= 1; giveBack += 1
        }
        out += tok
        (1 to giveBack).foreach(_ => out += ")")
      } else out += tok
    }
    def inRegex: Boolean =
      sb.length >= 3 && sb.charAt(0) == 'r' && sb.charAt(1) == 'e' && sb.charAt(2) == ':'
    text.foreach {
      case '"' if !inRegex =>
        if (inQuote) { out += "\"" + sb.toString + "\""; sb.clear() }
        else flush()
        inQuote = !inQuote
      case '(' if !inQuote && !inRegex => flush(); out += "("
      case ')' if !inQuote && !inRegex => flush(); out += ")"
      case c if c.isWhitespace && !inQuote => flush()
      case c => sb += c
    }
    require(!inQuote, "unbalanced '\"' in boolean query")
    flush()
    out.toArray
  }

  private final class P(toks: Array[String]) {
    var at = 0
    def eof: Boolean = at >= toks.length
    private def peek: String = toks(at)

    def expr(): Expr = {
      val first = and()
      val cs = scala.collection.mutable.ListBuffer(first)
      while (!eof && peek == "OR") {
        at += 1
        cs += and()
      }
      if (cs.length == 1) cs.head else Or(cs.toList)
    }

    private def and(): Expr = {
      val cs = scala.collection.mutable.ListBuffer(atom())
      var more = true
      while (more && !eof) {
        if (peek == "AND") { at += 1; cs += atom() }
        else if (peek != "OR" && peek != ")") cs += atom() // implicit AND (incl. NOT)
        else more = false
      }
      // a word that tokenized to nothing is the AND-neutral element
      val kept = cs.toList.filter(_ != And(Nil))
      kept match {
        case Nil => And(Nil) // everything dropped: vacuously true
        case single :: Nil => single
        case many => And(many)
      }
    }

    private def atom(): Expr = {
      require(!eof, "dangling connective: expected a term or '('")
      peek match {
        case "NOT" =>
          at += 1
          Not(atom()) match {
            // NOT of a dropped (sub-MinLen) atom is vacuous — drop it too
            case Not(And(Nil)) => And(Nil)
            case n => n
          }
        case "(" =>
          at += 1
          val e = expr()
          require(!eof && peek == ")", "unbalanced '('")
          at += 1
          e
        case "AND" | "OR" | ")" =>
          throw new IllegalArgumentException(s"unexpected '$peek' at position $at")
        case q if q.startsWith("\"") =>
          at += 1
          // optional proximity suffix: `"a b"~3` lexes as two tokens
          val win: Int =
            if (!eof && peek.matches("~\\d+")) {
              val w = peek.drop(1).toInt
              at += 1
              math.max(1, w)
            } else 0
          Tokenizer.tokenize(q.substring(1, q.length - 1)).toList match {
            case Nil => And(Nil) // an empty quote drops out, like a dropped word
            case t :: Nil => Term(t) // 1-token phrase/near ≡ the term
            case ts if win > 0 => ts.distinct match {
              case d :: Nil => Term(d) // one distinct term: window is vacuous
              case ds => Near(ds, win)
            }
            case ts => Phrase(ts)
          }
        case r if r.startsWith("re:") =>
          at += 1
          Pattern(r.stripPrefix("re:"), isRegex = true)
        case w if w.length > 1 && w.endsWith("*") && !w.dropRight(1).contains("*") =>
          at += 1
          // same operand normalization as the PREFIX kind: the LAST
          // unfiltered tokenizer piece is the live prefix
          val pieces = Tokenizer.tokenizeUnfiltered(w.stripSuffix("*"))
          if (pieces.isEmpty) And(Nil) else Pattern(pieces.last, isRegex = false)
        case w =>
          at += 1
          Tokenizer.tokenize(w).toList match {
            case Nil => And(Nil) // drops out of the enclosing AND
            case t :: Nil => Term(t)
            case ts => And(ts.map(Term(_)))
          }
      }
    }
  }
}
