package graft.search

import graft.tokenize.Tokenizer

/** Nested boolean query grammar — parens + AND/OR/NOT precedence over
  * term atoms. Semantics pinned here (the reference tree was empty at
  * survey time, SURVEY.md §0):
  *
  *   expr := and (OR and)*          -- OR binds loosest
  *   and  := atom ((AND)? atom)*    -- adjacent atoms are implicit AND
  *   atom := NOT atom | ('(' expr ')' | WORD) ('^' NUMBER)?
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
    * repeated term would trivially satisfy any window against itself.
    * A NEGATIVE w is the ORDERED variant (`"merge sort"~>3`, the ONEAR
    * kind as a leaf): terms must appear in list order within −w, and
    * repeated terms are rejected at parse. */
  final case class Near(ts: List[String], w: Int) extends Expr
  /** Dictionary-expansion atom: a trailing-wildcard prefix (`s*`) or an
    * anchored regex (`re:pat`). Present iff ANY vocabulary term matching
    * the pattern is present — the PREFIX/REGEX-kind predicate as a leaf.
    * Expansion happens per segment against its own dictionary at query
    * time (same deterministic cap as the standalone kinds). */
  final case class Pattern(raw: String, isRegex: Boolean) extends Expr
  /** Query-time weight (`merge^2`, `"fast merge"^1.5`, `(a OR b)^2`):
    * matching is unchanged; the wrapped subtree's terms score with their
    * BM25 contribution multiplied by `w` (nested boosts multiply; a term
    * reached through several leaves takes the MAX weight across mentions,
    * an unboosted mention counting 1.0). Regex atoms are unboostable —
    * `^` is regex syntax inside a `re:` token. */
  final case class Boost(c: Expr, w: Double) extends Expr
  final case class And(cs: List[Expr]) extends Expr
  final case class Or(cs: List[Expr]) extends Expr
  final case class Not(c: Expr) extends Expr

  /** Print an expression back to query text, fully parenthesized —
    * unambiguous under any precedence, so `parse(render(e)) == e` for
    * every parser-normal shape (≥2 children per And/Or, ≥2 phrase
    * tokens; the 500-case fuzz suite pins the round-trip). Used by
    * query REWRITES (synonym expansion) that build an AST and hand it
    * to any tier's ordinary BOOL entry point. */
  def render(e: Expr): String = e match {
    case Term(t) => t
    case Phrase(ts) => "\"" + ts.mkString(" ") + "\""
    case Near(ts, w) =>
      "\"" + ts.mkString(" ") + "\"" + (if (w < 0) "~>" + -w else "~" + w)
    case Pattern(raw, isRegex) => if (isRegex) "re:" + raw else raw + "*"
    case And(cs) => cs.map(render).mkString("(", " AND ", ")")
    case Or(cs) => cs.map(render).mkString("(", " OR ", ")")
    case Not(c) => "NOT " + render(c)
    case Boost(c, w) =>
      val ws = if (w == w.toLong.toDouble) w.toLong.toString else w.toString
      render(c) + "^" + ws
  }

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
      case Boost(c, _) => walk(c)
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
      case Boost(c, _) => walk(c)
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
      case Boost(c, _) => walk(c)
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
    case Boost(c, _) => // weights affect scoring only, never matching
      compile(c, slot, phraseSlot, phraseBase, patternSlots)
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
    case Boost(c, _) => satisfiable(c, known)
  }

  /** Effective query-time weights: per fixed term and per Pattern leaf,
    * the MAX over all mentions of (product of Boost factors on the path
    * to that mention), an unboosted mention counting 1.0. Pattern
    * weights apply to every term of that pattern's per-segment expansion
    * (max-combined with the term's own fixed-mention weight by the
    * caller). Entries at exactly 1.0 are pruned — absent means neutral. */
  def boostMaps(e: Expr): (Map[String, Double], Map[Pattern, Double]) = {
    val tm = scala.collection.mutable.Map.empty[String, Double]
    val pm = scala.collection.mutable.Map.empty[Pattern, Double]
    def rec(x: Expr, w: Double): Unit = x match {
      case Boost(c, b) => rec(c, w * b)
      case Term(t) => tm(t) = math.max(tm.getOrElse(t, 0.0), w)
      case Phrase(ts) => ts.foreach(t => tm(t) = math.max(tm.getOrElse(t, 0.0), w))
      case Near(ts, _) => ts.foreach(t => tm(t) = math.max(tm.getOrElse(t, 0.0), w))
      case p: Pattern => pm(p) = math.max(pm.getOrElse(p, 0.0), w)
      case And(cs) => cs.foreach(rec(_, w))
      case Or(cs) => cs.foreach(rec(_, w))
      case Not(c) => rec(c, w)
    }
    rec(e, 1.0)
    (tm.filter(_._2 != 1.0).toMap, pm.filter(_._2 != 1.0).toMap)
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
        // WHILE the token's ')' exceed its '(' the tail is grammar glued
        // onto the regex: give back closing parens AND group boosts
        // (`(a OR re:(x|y))^2)^1.5` → re:(x|y) › ) › ^2 › ) › ^1.5). A
        // balanced `re:ab^2` keeps its '^' — regex atoms are unboostable.
        val tail = scala.collection.mutable.ArrayBuffer.empty[String]
        var t = tok
        var done = false
        while (!done && t.count(_ == ')') > t.count(_ == '(')) {
          if (t.endsWith(")")) { t = t.dropRight(1); tail += ")" }
          else {
            val c = t.lastIndexOf('^')
            if (c > 0 && t.substring(c + 1).matches("\\d+(?:\\.\\d+)?")) {
              tail += t.substring(c); t = t.substring(0, c)
            } else done = true
          }
        }
        out += t
        tail.reverseIterator.foreach(out += _)
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

  // `~3`, `~3^2`, `^2` suffix tokens after a closing quote; `body^2`
  // word-glued boosts; standalone `^2` after a group
  private val SufRe = "(?:~(>?)(\\d+))?(?:\\^(\\d+(?:\\.\\d+)?))?".r
  private val BoostRe = "(.*)\\^(\\d+(?:\\.\\d+)?)".r
  private val BoostTokRe = "\\^(?:\\d+(?:\\.\\d+)?)".r

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
          boosted(e) // group boost: (a OR b)^2 distributes onto the leaves
        case "AND" | "OR" | ")" =>
          throw new IllegalArgumentException(s"unexpected '$peek' at position $at")
        case q if q.startsWith("\"") =>
          at += 1
          // optional suffixes: `"a b"~3` / `"a b"~3^2` / `"a b"^2` — the
          // window and boost ride in ONE whitespace-glued token after the
          // closing quote
          var win = 0
          var ordered = false
          var w = 1.0
          if (!eof) peek match {
            case SufRe(ordS, winS, bS) =>
              at += 1
              if (winS != null) { win = math.max(1, winS.toInt); ordered = ordS == ">" }
              if (bS != null) w = bS.toDouble
            case _ =>
          }
          val leaf = Tokenizer.tokenize(q.substring(1, q.length - 1)).toList match {
            case Nil => And(Nil) // an empty quote drops out, like a dropped word
            case t :: Nil => Term(t) // 1-token phrase/near ≡ the term
            case ts if win > 0 && ordered =>
              // ordered leaf keeps QUERY order; a repeated term cannot
              // pick two positions through one cursor — reject like ONEAR
              require(ts.distinct.length == ts.length,
                s"ordered proximity atom requires distinct terms: $ts")
              Near(ts, -win)
            case ts if win > 0 => ts.distinct match {
              case d :: Nil => Term(d) // one distinct term: window is vacuous
              case ds => Near(ds, win)
            }
            case ts => Phrase(ts)
          }
          if (w == 1.0) leaf else mkBoost(leaf, w)
        case r if r.startsWith("re:") =>
          at += 1
          // unboostable: '^' is regex syntax inside a re: token
          Pattern(r.stripPrefix("re:"), isRegex = true)
        case w0 =>
          at += 1
          // peel a numeric boost suffix (`merge^2`, `s*^0.5`) off the
          // token BEFORE classifying it as prefix atom or word
          val (w, b) = w0 match {
            case BoostRe(body, bS) if body.nonEmpty => (body, bS.toDouble)
            case _ => (w0, 1.0)
          }
          val leaf =
            if (w.length > 1 && w.endsWith("*") && !w.dropRight(1).contains("*")
              && !w.contains("?")) {
              // same operand normalization as the PREFIX kind: the LAST
              // unfiltered tokenizer piece is the live prefix
              val pieces = Tokenizer.tokenizeUnfiltered(w.stripSuffix("*"))
              if (pieces.isEmpty) And(Nil) else Pattern(pieces.last, isRegex = false)
            } else if (w.exists(c => c == '*' || c == '?') &&
              w.exists(c => c != '*' && c != '?'))
              // general wildcard atom (`f*st`, `te?t`): desugars to a
              // regex Pattern leaf — every tier's regex expansion serves
              // it; an all-wildcard token drops like an empty leaf
              Pattern(QueryParser.globToRegex(w.toLowerCase), isRegex = true)
            else Tokenizer.tokenize(w).toList match {
              case Nil => And(Nil) // drops out of the enclosing AND
              case t :: Nil => Term(t)
              case ts => And(ts.map(Term(_)))
            }
          if (b == 1.0) leaf else mkBoost(leaf, b)
      }
    }

    /** Optional standalone `^b` token after a group/quote — consume and
      * wrap. A dropped leaf (And(Nil)) never takes a boost. */
    private def boosted(e: Expr): Expr =
      if (!eof && BoostTokRe.matches(peek)) {
        val w = peek.drop(1).toDouble
        at += 1
        mkBoost(e, w)
      } else e

    private def mkBoost(e: Expr, w: Double): Expr = e match {
      case And(Nil) => e // nothing to weight
      case _ =>
        require(w >= 0.0, s"negative boost $w")
        Boost(e, w)
    }
  }
}
