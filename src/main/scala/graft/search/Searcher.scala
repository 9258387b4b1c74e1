package graft.search

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.build.Segment
import graft.model._
import graft.tokenize.Tokenizer

/** Flat boolean/free-text query parsing — SURVEY §2.4 Q1. Grammar pinned
  * in FIXTURES.md: `t AND t AND …`, `t OR t OR …`, else free text (bag of
  * words, BM25-ranked = OR). Query text goes through the SAME tokenizer
  * as documents (the uppercase connectives tokenize away). */
object QueryParser {
  /** Split on BOTH uppercase connectives: a mixed query like
    * `a AND b OR c` is classified OR (disjunction is the safe reading of
    * a flat grammar), and the embedded AND is grammar that must not
    * tokenize into the search term "and" — stripping only the
    * classifying connective would silently change query semantics. */
  private def operandTerms(t: String): Array[String] =
    t.split("\\s+(?:AND|OR)\\s+").flatMap(Tokenizer.tokenize).distinct.sorted

  private val NearRe = "\\s+NEAR/(\\d+)\\s+".r
  private val BeforeRe = "\\s+BEFORE/(\\d+)\\s+".r
  // any single digit: fuzzyDist clamps to 2, so `word~3` still parses
  // FUZZY (at the cap) instead of silently degrading to free text
  private val FuzzyRe = "[^\\s\"~]+~[0-9]".r

  def parse(text: String): (String, Array[String]) = {
    val t = text.trim
    if (t.length > 1 && t.startsWith("\"") && t.endsWith("\""))
      ("PHRASE", termsFor("PHRASE", t))
    else if (NearRe.findFirstIn(t).isDefined)
      ("NEAR", termsFor("NEAR", t))
    else if (BeforeRe.findFirstIn(t).isDefined)
      ("ONEAR", termsFor("ONEAR", t))
    else if (t.startsWith("re:")) // before PREFIX: a pattern may end in *
      ("REGEX", Array(t.stripPrefix("re:").trim))
    else if (t.startsWith("stem:")) // stemmed match: expansion kind STEM
      ("STEM", termsFor("STEM", t))
    else if (t.endsWith("*") && !t.dropRight(1).contains("*") &&
      !t.contains("?") && !t.contains(" "))
      ("PREFIX", termsFor("PREFIX", t))
    else if (!t.contains(" ") && t.exists(c => c == '*' || c == '?') &&
      t.exists(c => c != '*' && c != '?'))
      // general wildcard (Lucene WildcardQuery): `f*st`, `te?t`, `*fix` —
      // any glob that isn't the PREFIX fast path; an all-wildcard token
      // (`*`, `??`) falls through to free text (no whole-dict expansion)
      ("WILD", termsFor("WILD", t))
    else if (FuzzyRe.matches(t)) // one bare word + ~d (Lucene FuzzyQuery)
      ("FUZZY", termsFor("FUZZY", t))
    else if (BoolQuery.isNested(t))
      // parens or mixed AND/OR: the nested grammar (precedence: AND binds
      // tighter than OR). Malformed nesting (unbalanced parens pasted
      // from code) falls back to free text rather than erroring.
      try ("BOOL", termsFor("BOOL", t))
      catch { case _: IllegalArgumentException => ("FREE", Tokenizer.queryTerms(t)) }
    else if (t.split("\\s+AND\\s+").length > 1 && !t.contains(" OR "))
      ("AND", operandTerms(t))
    else if (t.split("\\s+OR\\s+").length > 1)
      ("OR", operandTerms(t))
    else ("FREE", Tokenizer.queryTerms(t))
  }

  private val FieldRe = "^(lang|repo|len|path):(\\S+)$".r

  /** Extract fielded atoms (`lang:v`, `repo:v`) from a query; returns
    * (fields, remaining query text). `repo:` maps to the contiguous
    * docId-range scope (X7); `lang:` to the docmap bitset filter;
    * `path:` is a glob over the docmap path (LIKE-translated, the
    * code-search `file:`/`path:` atom). A field repeated last-wins;
    * atoms can sit anywhere in the query. */
  def parseFields(text: String): (Map[String, String], String) = {
    val parts = text.trim.split("\\s+").filter(_.nonEmpty)
    val fields = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val rest = new StringBuilder
    parts.foreach {
      case FieldRe(f, v) => fields(f) = v
      case w => if (rest.nonEmpty) rest += ' '; rest ++= w
    }
    (fields.toMap, rest.toString)
  }

  /** Default NEAR window when kind "NEAR" is forced on text that has no
    * `NEAR/w` connective (e.g. a Query fixture) — adjacent-token span. */
  final val DefaultNearWindow = 1

  /** Edit-distance bound of a FUZZY query (`sow~1`): the trailing `~d`
    * digit, clamped to [0, 2] (the Lucene FuzzyQuery cap — wider bounds
    * expand to most of the vocabulary and stop meaning "typo").
    * Defaults to 1 when kind "FUZZY" is forced on suffix-free text. */
  def fuzzyDist(text: String): Int = {
    val m = "~([0-9])\\s*$".r.findFirstMatchIn(text.trim)
    m.map(x => math.min(2, x.group(1).toInt)).getOrElse(1)
  }

  /** Window of a NEAR query: the max w over `NEAR/w` connectives (flat
    * grammar — one window governs the whole term set). Falls back to
    * [[DefaultNearWindow]] instead of throwing on connective-free text. */
  def nearWindow(text: String): Int = {
    val ws = NearRe.findAllMatchIn(text).map(_.group(1).toInt)
    if (ws.isEmpty) DefaultNearWindow else ws.max
  }

  /** Window of an ordered-proximity query (`a BEFORE/w b`): max w over
    * `BEFORE/w` connectives, same default rule as [[nearWindow]]. */
  def orderedWindow(text: String): Int = {
    val ws = BeforeRe.findAllMatchIn(text).map(_.group(1).toInt)
    if (ws.isEmpty) DefaultNearWindow else ws.max
  }

  /** Terms of a query whose kind is already known: the uppercase
    * connective is grammar, not a term, and must never be tokenized into
    * one (an AND query would otherwise short-circuit to ∅ on the
    * out-of-vocabulary token "and"). PHRASE terms keep document order
    * and duplicates — they are position slots, not a bag. */
  private val BoostSufRe = "(.*)\\^(\\d+(?:\\.\\d+)?)".r

  /** Peel a numeric `^b` boost suffix off one query word (`merge^2` →
    * ("merge", 2.0)); words without one weigh 1.0. The tokenizer already
    * DROPS the suffix from term extraction (`^` is a separator and the
    * number a filtered piece), so only weight extraction lives here. */
  def splitBoost(w: String): (String, Double) = w match {
    case BoostSufRe(body, b) if body.nonEmpty && !body.startsWith("re:") =>
      (body, b.toDouble)
    case _ => (w, 1.0)
  }

  /** Query-time term weights (`merge^2 sort^0.5`) for the kinds that
    * support them: FREE/AND/OR peel per-word suffixes (every tokenizer
    * piece of a boosted word inherits its weight); BOOL delegates to the
    * grammar's [[BoolQuery.boostMaps]] fixed-term map (pattern-leaf
    * weights need per-segment expansion — callers combine those
    * separately). A term mentioned several times takes the MAX weight,
    * an unboosted mention counting 1.0; entries at exactly 1.0 are
    * pruned, so an empty map means "no boosts". */
  def boosts(kind: String, text: String): Map[String, Double] = kind match {
    case "FREE" | "AND" | "OR" =>
      // per-WORD suffixes (boost binds to the preceding word, not to a
      // whole multi-word operand); the uppercase connectives are grammar
      val words = text.trim.split("\\s+").filter(w => w != "AND" && w != "OR")
      val m = scala.collection.mutable.Map.empty[String, Double]
      words.foreach { w0 =>
        val (body, b) = splitBoost(w0.trim)
        Tokenizer.tokenize(body).foreach(t =>
          m(t) = math.max(m.getOrElse(t, 0.0), b))
      }
      m.filter(_._2 != 1.0).toMap
    case "BOOL" => BoolQuery.boostMaps(BoolQuery.parse(text))._1
    case _ => Map.empty
  }

  /** Ordered intervals slots with `any_of` alternatives: slots are
    * whitespace-separated, alternatives within a slot are separated by
    * `|` (the Lucene intervals `any_of` combinator), each alternative
    * normalized through the tokenizer and required to stay ONE term
    * (an alternative is a dictionary atom, not a phrase). Duplicate
    * alternatives within a slot collapse. */
  def intervalsAnySlots(text: String): Array[Array[String]] =
    text.trim.split("\\s+").filter(_.nonEmpty).map { slot =>
      val alts = slot.split('|').filter(_.nonEmpty).map { alt =>
        val ts = Tokenizer.tokenize(alt)
        require(ts.length == 1,
          s"intervals any_of alternative must be one term, got '$alt'")
        ts.head
      }.distinct
      require(alts.nonEmpty, s"empty any_of slot in '$text'")
      alts
    }

  def termsFor(kind: String, text: String): Array[String] = kind match {
    case "AND" | "OR" => operandTerms(text)
    case "PHRASE" => Tokenizer.tokenize(text.trim.stripPrefix("\"").stripSuffix("\""))
    case "NEAR" =>
      text.trim.split("\\s+NEAR/\\d+\\s+").flatMap(Tokenizer.tokenize).distinct.sorted
    case "ONEAR" =>
      // ordered proximity: operand ORDER is the match constraint — never
      // sorted; a repeated term is rejected (slots must pick distinct
      // positions, which the one-cursor-per-term walk cannot express)
      val ts = text.trim.split("\\s+BEFORE/\\d+\\s+").flatMap(Tokenizer.tokenize)
      require(ts.distinct.length == ts.length,
        s"ONEAR requires distinct terms, got ${ts.mkString(" ")}")
      ts
    case "PREFIX" =>
      // normalize through the tokenizer's boundary rules: dictionary
      // terms are post-split lowercase pieces, so a prefix containing
      // split chars (underscores, camel humps, digit boundaries) could
      // never match raw — the LAST unfiltered piece is the live prefix
      // (e.g. `get_val*` expands terms starting with "val")
      val pieces = Tokenizer.tokenizeUnfiltered(text.trim.stripSuffix("*"))
      Array(if (pieces.isEmpty) "" else pieces.last)
    case "REGEX" => Array(text.trim.stripPrefix("re:").trim)
    case "WILD" =>
      // wildcard desugars to an anchored regex (Lucene WildcardQuery runs
      // the same automaton as RegexpQuery over the translated glob):
      // `*` → `.*`, `?` → `.`, everything else quoted. The operand stays
      // raw-lowercase like REGEX — glob metachars make tokenizer-boundary
      // normalization ambiguous, so the pattern matches post-split
      // dictionary terms as written.
      Array(QueryParser.globToRegex(text.trim.toLowerCase))
    case "FUZZY" =>
      // same normalization rule as PREFIX: dictionary terms are
      // post-split lowercase pieces, so the operand must be one too
      val body = text.trim.replaceAll("~[0-9]\\s*$", "")
      val pieces = Tokenizer.tokenizeUnfiltered(body)
      Array(if (pieces.isEmpty) "" else pieces.last)
    case "STEM" =>
      // PREFIX/FUZZY normalization: the operand must be a post-split
      // lowercase piece before it can stem against dictionary terms
      val body = text.trim.stripPrefix("stem:")
      val pieces = Tokenizer.tokenizeUnfiltered(body)
      Array(if (pieces.isEmpty) "" else pieces.last)
    case "BOOL" => BoolQuery.terms(BoolQuery.parse(text))
    case _ => Tokenizer.queryTerms(text)
  }

  /** Glob → anchored-regex translation: `*` → `.*`, `?` → `.`, every
    * other character regex-quoted. One shared rewrite so WILD rides the
    * REGEX machinery identically on every read tier (relational,
    * serving, multi-segment, percolator, boolean atoms). */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder(glob.length + 8)
    glob.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append('.')
      case c if "\\^$.|+()[]{}".indexOf(c.toInt) >= 0 =>
        sb.append('\\').append(c)
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Glob → SQL LIKE pattern (`*`→`%`, `?`→`_`, LIKE metacharacters
    * escaped with `\`) — the `path:` atom's docmap predicate, shared
    * with the DuckDB twin so both engines filter identically. */
  def globToLike(glob: String): String = {
    val sb = new StringBuilder(glob.length + 8)
    glob.foreach {
      case '*' => sb.append('%')
      case '?' => sb.append('_')
      case c if c == '%' || c == '_' || c == '\\' =>
        sb.append('\\').append(c)
      case c => sb.append(c)
    }
    sb.toString
  }
}

/** Query evaluation over one built segment — SURVEY.md §3 EP2.
  *
  * Plan shape: postings scan filtered to the query's termIds (parquet
  * predicate pushdown when the segment is on disk) → collect the touched
  * bucket ids (tiny job) → cogroup with ONLY those buckets' doc-length
  * blocks → per-bucket block-max WAND / intersection walk emitting ≤k
  * hits → global `orderBy(score desc, docId).limit(k)` which Catalyst
  * plans as TakeOrderedAndProject. The heavy posting bytes never shuffle:
  * only ≤|q| posting rows per touched bucket move.
  */
// NOT Serializable on purpose: it holds a SparkSession, and the walk
// lambdas below close over locals only — the marker would invite an
// accidental whole-object capture later.
final class Searcher(spark: SparkSession, segment: Segment,
                     residentDoclens: Boolean = true) {
  import spark.implicits._

  private val stats: CorpusStats = segment.stats

  /** Vocabularies up to this size are cached driver-side so repeated
    * queries skip the dict-scan job entirely (a serving-layer would hold
    * the term dictionary resident; 2^20 entries ≈ tens of MB). */
  private val DictCacheLimit = 1L << 20
  private lazy val dictCache: Option[Map[String, DictEntry]] =
    if (stats.numTerms <= DictCacheLimit)
      Some(segment.dict.collect().map(e => e.term -> e).toMap)
    else None

  /** Dict lookup for query terms: cached map, or a filtered scan
    * returning ≤|q| rows (broadcast-join equivalent at this cardinality). */
  def dictLookup(terms: Array[String]): Array[DictEntry] =
    if (terms.isEmpty) Array.empty
    else dictCache match {
      case Some(m) => terms.flatMap(m.get).sortBy(_.termId)
      case None =>
        segment.dict.filter($"term".isin(terms.toSeq: _*)).collect().sortBy(_.termId)
    }

  /** Prefix expansion: every dictionary term starting with `prefix`,
    * capped DETERMINISTICALLY at `maxExpansion` in term (= termId) sort
    * order — at corpus scale an unbounded wildcard could expand to
    * millions of lists. The dict is term-sorted, so the uncached scan is
    * a contiguous range (parquet min/max prunes it). */
  def dictLookupPrefix(prefix: String, maxExpansion: Int = Searcher.MaxExpansion): Array[DictEntry] =
    if (prefix.isEmpty) Array.empty // `*` alone must not expand the whole dict
    else (dictCache match {
      case Some(m) => m.valuesIterator.filter(_.term.startsWith(prefix)).toArray
      case None => segment.dict.filter($"term".startsWith(prefix)).collect()
    }).sortBy(_.termId).take(maxExpansion)

  /** Term-range expansion (Lucene TermRangeQuery, `[lo TO hi]`
    * inclusive): every vocabulary term in the string interval. The
    * dictionary is term-sorted with termIds dense in term order (I1),
    * so this is a CONTIGUOUS dictionary range scan like PREFIX — and
    * the same deterministic cap in termId order applies. */
  def dictLookupRange(lo: String, hi: String,
                      maxExpansion: Int = Searcher.MaxExpansion): Array[DictEntry] = {
    require(lo <= hi, s"term range needs lo <= hi, got [$lo, $hi]")
    (dictCache match {
      case Some(m) => m.valuesIterator
        .filter(e => e.term >= lo && e.term <= hi).toArray
      case None => segment.dict.filter($"term" >= lo && $"term" <= hi).collect()
    }).sortBy(_.termId).take(maxExpansion)
  }

  /** Regex expansion (anchored full-term match), same deterministic cap
    * as prefix. Unlike prefix there is no contiguous dict range — the
    * uncached path is a full dictionary scan (dictionary-sized, not
    * corpus-sized: the vocabulary is the small artifact by design). */
  def dictLookupRegex(pattern: String, maxExpansion: Int = Searcher.MaxExpansion): Array[DictEntry] = {
    val re = java.util.regex.Pattern.compile(pattern)
    (dictCache match {
      case Some(m) => m.valuesIterator.filter(e => re.matcher(e.term).matches()).toArray
      case None => segment.dict.filter($"term".rlike("^(?:" + pattern + ")$")).collect()
    }).sortBy(_.termId).take(maxExpansion)
  }

  /** Fuzzy expansion (Lucene FuzzyQuery): every vocabulary term within
    * `maxDist` Levenshtein edits of `word`, capped DETERMINISTICALLY at
    * `maxExpansion` in termId order like prefix/regex expansion. A
    * dictionary-sized scan with a length-band prefilter before any DP
    * runs — the vocabulary is the small artifact by design. */
  def dictLookupFuzzy(word: String, maxDist: Int,
                      maxExpansion: Int = Searcher.MaxExpansion): Array[DictEntry] = {
    val w = word.trim.toLowerCase
    if (w.isEmpty) return Array.empty
    val vocab = dictCache match {
      case Some(m) => m.valuesIterator
      case None => segment.dict
        .filter(abs(length($"term") - lit(w.length)) <= maxDist)
        .collect().iterator
    }
    Searcher.fuzzyExpand(vocab, w, maxDist, maxExpansion)
  }

  /** Stemmed expansion (kind STEM): vocabulary terms sharing the
    * operand's S-stem, capped like every expansion. A dictionary-sized
    * scan (the vocabulary is the small artifact by design); the uncached
    * path can prune to terms within 3 chars of the stem's length — an
    * S-stem changes length by at most 2. */
  def dictLookupStem(word: String,
                     maxExpansion: Int = Searcher.MaxExpansion): Array[DictEntry] = {
    val w = word.trim.toLowerCase
    if (w.isEmpty) return Array.empty
    val target = Stem.sStem(w)
    val vocab = dictCache match {
      case Some(m) => m.valuesIterator
      case None => segment.dict
        .filter(abs(length($"term") - lit(target.length)) <= 3)
        .collect().iterator
    }
    Stem.expand(vocab, w, maxExpansion)
  }

  /** "Did you mean": vocabulary terms within `maxDist` Levenshtein edit
    * distance of `word`, ranked (df desc, term asc) — the zero-hit
    * recovery surface. A dictionary-sized scan like regex expansion
    * (the vocabulary is the small artifact by design); a length band
    * prunes before any distance is computed, and the DP itself
    * early-exits when a row's minimum exceeds the bound. */
  def suggest(word: String, k: Int, maxDist: Int = 1): Array[(String, Long)] =
    suggestEntries(word, k, maxDist).map(e => e.term -> e.df)

  private def suggestEntries(word: String, k: Int,
                             maxDist: Int): Array[DictEntry] = {
    val w = word.trim.toLowerCase
    if (w.isEmpty) return Array.empty
    val band = (e: DictEntry) => math.abs(e.term.length - w.length) <= maxDist
    val cands = (dictCache match {
      case Some(m) => m.valuesIterator.filter(band).toArray
      case None => segment.dict
        .filter(abs(length($"term") - lit(w.length)) <= maxDist).collect()
    }).filter(e => Searcher.editDistance(e.term, w, maxDist) <= maxDist)
    cands.sortBy(e => (-e.df, e.term)).take(k)
  }

  /** Total corpus token count Σcf — equal to ΣdocLen by the build
    * invariant, computed exactly (Long) from the dictionary. */
  private lazy val totalCf: Long = dictCache match {
    case Some(m) => m.valuesIterator.map(_.cf).sum
    case None => segment.dict.agg(sum($"cf")).collect().head.getLong(0)
  }

  /** Phrase suggester (the Elasticsearch phrase-suggest surface —
    * multi-word "did you mean"): per query token, the top `perTok`
    * vocabulary candidates within edit distance `maxDist` ranked by the
    * [[suggest]] contract (df desc, term asc; a token with no candidate
    * survives as itself — the JM smoothing prices its absence); the
    * cartesian candidate phrases are then ranked by their log-likelihood
    * under the Jelinek-Mercer-smoothed unigram corpus LM (the
    * Curation.lmPerplexity model over the INDEX dictionary's cf):
    * score = Σ ln(λ·cf(t)/Σcf + (1−λ)/V), floor-rounded at 6 dp, ties
    * broken by suggestion text. Everything is dictionary-sized
    * driver-side work — the X22 suggest regime; the candidate space is
    * bounded by perTok^|q| (|q| capped at 8, perTok at 4).
    *
    * The edit metric is DuckDB's `levenshtein` and the LM is portable
    * arithmetic over exact integers, so the twin is exact. */
  def suggestPhrase(text: String, n: Int, maxDist: Int = 1,
                    perTok: Int = 3, lambda: Double = 0.9)
      : Array[(String, Double)] = {
    require(perTok >= 1 && perTok <= 4 && n >= 1, "phrase-suggest bounds")
    val toks = Tokenizer.tokenize(text)
    if (toks.isEmpty) return Array.empty
    require(toks.length <= 8,
      s"phrase suggestions are for short queries (got ${toks.length} tokens)")
    val total = totalCf.toDouble
    val v = segment.stats.numTerms.toDouble
    def lnP(cf: Long): Double =
      math.log(lambda * cf / total + (1.0 - lambda) / v)
    val cands: Array[Array[(String, Long)]] = toks.map { t =>
      val es = suggestEntries(t, perTok, maxDist)
      if (es.isEmpty) Array(t -> 0L) else es.map(e => e.term -> e.cf)
    }
    val phrases = cands.foldLeft(Array(("", 0.0))) { (acc, cs) =>
      for { (p, s) <- acc; (t, cf) <- cs }
        yield (if (p.isEmpty) t else s"$p $t", s + lnP(cf))
    }
    phrases
      .map { case (p, s) => (p, math.floor(s * 1e6 + 0.5) / 1e6) }
      .sortBy { case (p, s) => (-s, p) }
      .take(n)
  }

  /** Autocomplete (the search-box typeahead surface): vocabulary terms
    * starting with `prefix`, ranked (df desc, term asc) — most-used
    * completions first, the inverse of suggest's recovery ranking but
    * the same popularity contract. The operand normalizes through the
    * tokenizer's boundary rules exactly like PREFIX queries (dictionary
    * terms are post-split lowercase pieces — the LAST unfiltered piece
    * is the live prefix, so `get_val` completes "val"). Scale: the dict
    * is term-sorted, so the uncached scan is a contiguous range (parquet
    * min/max prunes it); dictionary-sized at worst, never corpus-sized. */
  def complete(prefix: String, k: Int): Array[(String, Long)] = {
    val pieces = graft.tokenize.Tokenizer.tokenizeUnfiltered(prefix.trim.stripSuffix("*"))
    val p = if (pieces.isEmpty) "" else pieces.last
    if (p.isEmpty) return Array.empty // bare `*` must not rank the whole dict
    val cands = dictCache match {
      case Some(m) => m.valuesIterator.filter(_.term.startsWith(p)).toArray
      case None => segment.dict.filter($"term".startsWith(p)).collect()
    }
    cands.sortBy(e => (-e.df, e.term)).take(k).map(e => e.term -> e.df)
  }

  /** More-like-this term selection (the Lucene MoreLikeThis family): the
    * `m` most informative in-vocabulary terms of `seedText`, ordered by
    * (tf/df desc, term asc). The selection weight is deliberately tf/df,
    * NOT tf·idf: a ratio of two small exact integers is a correctly
    * rounded IEEE division and therefore BIT-IDENTICAL in every engine,
    * whereas ln() may differ at the last ulp across libms and flip a
    * boundary tie — and df is a monotone inverse of idf, so for equal tf
    * the ordering is the tf·idf ordering anyway. Out-of-vocabulary seed
    * terms carry no signal and are dropped. The caller runs the returned
    * terms as a FREE query (BM25-ranked disjunction), excluding the seed
    * document itself. */
  def mltTerms(seedText: String, m: Int): Array[String] = {
    // raw token stream, NOT queryTerms: queryTerms dedupes (a query has
    // no use for repeats), but MLT's whole signal is the seed's tf
    val toks = graft.tokenize.Tokenizer.tokenize(seedText)
    val tf = toks.groupBy(identity).map { case (t, g) => t -> g.length }
    dictLookup(tf.keys.toArray.sorted)
      .map(e => (tf(e.term).toDouble / e.df, e.term))
      .sortBy { case (w, t) => (-w, t) }
      .take(m).map(_._2)
  }

  /** Per-bucket docId bitsets for a docmap field predicate — the
    * fielded-query filter (`lang:scala`). Built once per (field, value)
    * and broadcast; bucket-local bitsets are computed executor-side in a
    * mapGroups, then collected as ≤ bucketSize/8-byte blocks (driver
    * residency is numDocs/8 bytes — the same regime as the resident
    * doclens; past DoclenResidentLimit a cogroup-style distribution of
    * these blocks is the scale path, like doclens). */
  private val filterCache =
    scala.collection.concurrent.TrieMap
      .empty[(String, String), org.apache.spark.broadcast.Broadcast[Map[Int, Array[Long]]]]

  private[search] def docFilter(field: String, value: String)
      : org.apache.spark.broadcast.Broadcast[Map[Int, Array[Long]]] =
    filterCache.getOrElseUpdate((field, value),
      bitsetBlocks(segment.docs.filter(col(field) === value).select($"docId").as[Long]))

  /** Bitset filter over an arbitrary docmap predicate, cached by `tag`
    * (callers must make the tag a faithful key for the predicate) — the
    * generalization of [[docFilter]] behind numeric range atoms
    * (`len:lo..hi`) and composed field constraints. Same residency
    * regime as docFilter. */
  private[search] def docFilterWhere(tag: String,
                                     pred: org.apache.spark.sql.Column)
      : org.apache.spark.broadcast.Broadcast[Map[Int, Array[Long]]] =
    filterCache.getOrElseUpdate(("__where", tag),
      bitsetBlocks(segment.docs.filter(pred).select($"docId").as[Long]))

  /** Top-k restricted to docs whose docmap row satisfies `pred` —
    * fielded queries generalized to arbitrary (e.g. numeric range)
    * constraints. Scores keep GLOBAL corpus statistics, the filter is a
    * bitset probe inside the walks, exactly like [[fieldedHits]]. */
  def predFieldedHits(kind: String, text: String, k: Int, tag: String,
                      pred: org.apache.spark.sql.Column,
                      qid: Long = 0L): Dataset[Hit] =
    hitsImpl(kind, text, k, qid, pruned = true,
      acceptB = docFilterWhere(tag, pred))

  /** Per-bucket bitset blocks over an arbitrary docId set — the shared
    * mechanism behind field filters and tombstones. Bucket-local bitsets
    * are computed executor-side; driver residency is ≤ numDocs/8 bytes
    * (the resident-doclens regime; cogroup distribution of the blocks is
    * the stated 100 TB path, like doclens). */
  private def bitsetBlocks(ids: Dataset[Long])
      : org.apache.spark.broadcast.Broadcast[Map[Int, Array[Long]]] = {
    val bs = segment.params.bucketSize
    val blocks = ids
      .groupByKey(d => (d / bs).toInt)
      .mapGroups { (bucket, it) =>
        val bits = new Array[Long](((bs + 63) / 64).toInt)
        it.foreach { d =>
          val off = (d - bucket.toLong * bs).toInt
          bits(off >> 6) |= 1L << (off & 63)
        }
        (bucket, bits)
      }
      .collect().toMap
    spark.sparkContext.broadcast(blocks)
  }

  /** Tombstone bitsets (LSM live deletes): built once per tag and probed
    * inside every walk as a REJECT filter — a deleted doc is skipped
    * before scoring/offering. Global statistics (idf, avgdl, N) keep the
    * pre-delete values until a merge-time purge rewrites the segment
    * (SegmentMerger.purge) — the standard live-delete posture: filters
    * don't rescale, compaction does. */
  private val tombstoneCache =
    scala.collection.concurrent.TrieMap
      .empty[String, org.apache.spark.broadcast.Broadcast[Map[Int, Array[Long]]]]

  private[search] def tombstoneFilter(tag: String, deleted: => Dataset[Long])
      : org.apache.spark.broadcast.Broadcast[Map[Int, Array[Long]]] =
    tombstoneCache.getOrElseUpdate(tag, bitsetBlocks(deleted))

  /** Top-k hits for a query. kind ∈ {AND, OR, FREE, PHRASE, NEAR,
    * PREFIX}; OR/FREE rank by BM25 with block-max WAND pruning; AND
    * intersects then ranks; PHRASE/NEAR (positional segments only)
    * intersect with consecutive-position / minimal-span verification
    * then rank like AND; PREFIX expands against the dictionary and
    * ranks like OR. */
  def hits(kind: String, text: String, k: Int, qid: Long = 0L): Dataset[Hit] =
    hitsImpl(kind, text, k, qid, pruned = true)

  /** search_after pagination: the next k hits STRICTLY after the cursor
    * `(afterScore, afterDocId)` in (score desc, docId asc) order — page
    * N+1 given page N's last hit. O(k) heap memory per page at any
    * depth (the predecessors are filtered at offer inside the walks,
    * never buffered), the posture deep paging needs at corpus scale
    * where `hits(offset + k)` would buffer the whole prefix. */
  def hitsAfter(kind: String, text: String, k: Int, afterScore: Double,
                afterDocId: Long, qid: Long = 0L): Dataset[Hit] =
    hitsImpl(kind, text, k, qid, pruned = true,
      after = Wand.Scored(afterDocId, afterScore))

  /** Fielded query + search_after cursor — filters and paging compose. */
  def fieldedHitsAfter(kind: String, text: String, k: Int, field: String,
                       value: String, afterScore: Double, afterDocId: Long,
                       qid: Long = 0L): Dataset[Hit] =
    hitsImpl(kind, text, k, qid, pruned = true,
      acceptB = docFilter(field, value),
      after = Wand.Scored(afterDocId, afterScore))

  /** Top-k restricted to docs whose docmap `field` equals `value` —
    * fielded queries (`lang:x terms…`). Scores keep GLOBAL corpus
    * statistics (standard filter-doesn't-rescale semantics); the filter
    * is pushed into the per-bucket walks as a bitset probe, so no
    * separate filter pass or join runs. */
  def fieldedHits(kind: String, text: String, k: Int, field: String,
                  value: String, qid: Long = 0L): Dataset[Hit] =
    hitsImpl(kind, text, k, qid, pruned = true,
      acceptB = docFilter(field, value))

  /** Fielded + scoped combined: docId-range view AND docmap filter. */
  def scopedFieldedHits(kind: String, text: String, k: Int, lo: Long,
                        hi: Long, field: String, value: String,
                        qid: Long = 0L): Dataset[Hit] =
    hitsImpl(kind, text, k, qid, pruned = true, lo = lo, hi = hi,
      acceptB = docFilter(field, value))

  /** Top-k with a tombstone set excluded — live deletes before the next
    * purge. Scores keep the segment's (pre-delete) global statistics;
    * the exclusion is a per-bucket bitset probe inside the walks, built
    * once per `tag` and reused across queries (a serving tier holds the
    * live-delete bitset resident exactly like this). */
  def deletedHits(kind: String, text: String, k: Int, tag: String,
                  deleted: => Dataset[Long], qid: Long = 0L): Dataset[Hit] =
    hitsImpl(kind, text, k, qid, pruned = true,
      rejectB = tombstoneFilter(tag, deleted))

  /** Fielded query with tombstones excluded — filters compose. */
  def fieldedDeletedHits(kind: String, text: String, k: Int, field: String,
                         value: String, tag: String,
                         deleted: => Dataset[Long], qid: Long = 0L): Dataset[Hit] =
    hitsImpl(kind, text, k, qid, pruned = true,
      acceptB = docFilter(field, value),
      rejectB = tombstoneFilter(tag, deleted))

  /** Disjunctive top-k through the MaxScore pruning strategy
    * (Wand.topKMaxScore) instead of block-max WAND — identical results
    * by construction; kept as an independently-pruned cross-check and
    * for bound-shape comparisons. Non-OR kinds fall back to their
    * ordinary walks. */
  def hitsMaxScore(kind: String, text: String, k: Int, qid: Long = 0L): Dataset[Hit] =
    hitsImpl(kind, text, k, qid, pruned = true, maxscore = true)

  /** Exhaustive (unpruned) evaluation — correctness oracle for WAND. */
  def hitsExhaustive(kind: String, text: String, k: Int, qid: Long = 0L): Dataset[Hit] =
    hitsImpl(kind, text, k, qid, pruned = false)

  /** Query relaxation (the zero-hit recovery ladder of e-commerce /
    * enterprise search; Lucene's minimum_should_match family): a
    * conjunctive query that matches NOTHING relaxes stepwise until it
    * matches —
    *   1. out-of-vocabulary terms drop first (they make the AND
    *      unsatisfiable outright);
    *   2. while the AND is empty and ≥2 terms remain, the LEAST
    *      informative term drops: highest df, ties by term asc —
    *      deterministic, so both engines pick the same rung.
    * Returns the final rung's conjunctive hits (global stats, the
    * filter-doesn't-rescale rule). Each rung probe costs one k=1 job;
    * the ladder is ≤|q| rungs — query-sized, never corpus-sized. */
  def relaxedHits(text: String, k: Int, qid: Long = 0L): Dataset[Hit] = {
    val plan = relaxPlan(text)
    if (plan.isEmpty) spark.emptyDataset[Hit]
    else hits("AND", plan.mkString(" AND "), k, qid)
  }

  /** The rung [[relaxedHits]] lands on — the relaxed query's surviving
    * terms (sorted), for callers that surface "showing results for …"
    * and for the spec's brute force. Empty = every term was OOV. */
  def relaxPlan(text: String): Array[String] = {
    val terms = QueryParser.termsFor("AND", text)
    var kept = dictLookup(terms.distinct) // OOV terms drop here
    if (kept.isEmpty) return Array.empty
    def andText(es: Array[DictEntry]): String =
      es.map(_.term).sorted.mkString(" AND ")
    while (kept.length > 1 && hits("AND", andText(kept), 1).isEmpty) {
      val drop = kept.minBy(e => (-e.df, e.term)) // highest df, term asc
      kept = kept.filterNot(_.termId == drop.termId)
    }
    kept.map(_.term).sorted
  }

  /** Minimum-should-match (Lucene/Elasticsearch `minimum_should_match`):
    * top-k documents matching at least `minMatch` DISTINCT query terms,
    * BM25-scored over the terms each document matches. `minMatch = 1` is
    * the disjunction, `minMatch = |terms|` the conjunction; everything
    * between is the recall/precision dial a disjunctive query exposes.
    * An out-of-vocabulary term counts as an unmatchable clause (it can
    * never be present) — the Lucene reading — so a query whose in-dict
    * terms number fewer than `minMatch` is provably empty without a job.
    *
    * Runs the compiled-presence walk (the BOOL machinery) with the
    * predicate "popcount ≥ minMatch" over ascending-termId slots —
    * document-at-a-time per bucket, same termId pushdown and bucket
    * pruning as every other kind, ≤k rows leave each bucket. */
  def msmHits(text: String, minMatch: Int, k: Int, qid: Long = 0L): Dataset[Hit] = {
    require(minMatch >= 1, s"minMatch must be >= 1, got $minMatch")
    val entries = dictLookup(QueryParser.termsFor("OR", text).distinct)
    if (entries.isEmpty || entries.length < minMatch)
      return spark.emptyDataset[Hit]
    val idfByTid: Map[Long, Double] =
      entries.map(e => e.termId -> BM25.idf(stats.numDocs, e.df)).toMap
    val eval: Array[Boolean] => Boolean = p => {
      var c = 0
      var i = 0
      while (i < p.length) { if (p(i)) c += 1; i += 1 }
      c >= minMatch
    }
    rankTopK(scoredRaw(entries.map(_.termId), idfByTid, stats.avgDocLen,
      conjunctive = false, k, pruned = false, entries.length, boolEval = eval)
      .toDF("docId", "score"), k, qid)
  }

  /** Disjunction-max query (the Lucene DisjunctionMaxQuery surface —
    * the "best field" combiner behind Elasticsearch `dis_max` and
    * `multi_match`): top-k documents under score = best single-term BM25
    * contribution + `tie` · (sum of the others). Where a plain OR
    * rewards a doc for matching MANY query terms weakly, dis-max rewards
    * the STRONGEST single match, with `tie` ∈ [0, 1] dialing between the
    * two readings (tie = 1 IS the disjunction — asserted bit-identical
    * in DisMaxSpec). OOV terms drop out exactly as in the disjunction.
    *
    * Same execution regime as [[msmHits]]: exhaustive document-at-a-time
    * walk per bucket with termId pushdown + bucket pruning; only the
    * per-doc combiner differs (Wand.topKDisMax). */
  def disMaxHits(text: String, tie: Double, k: Int, qid: Long = 0L): Dataset[Hit] = {
    require(tie >= 0.0 && tie <= 1.0, s"tie must be in [0, 1], got $tie")
    val entries = dictLookup(QueryParser.termsFor("OR", text).distinct)
    if (entries.isEmpty) return spark.emptyDataset[Hit]
    val idfByTid: Map[Long, Double] =
      entries.map(e => e.termId -> BM25.idf(stats.numDocs, e.df)).toMap
    rankTopK(scoredRaw(entries.map(_.termId), idfByTid, stats.avgDocLen,
      conjunctive = false, k, pruned = false, entries.length,
      dismaxTie = tie)
      .toDF("docId", "score"), k, qid)
  }

  /** Filters aggregation (the ES `filters` agg): exact match counts for
    * N named queries in ONE job over ONE union-pushdown postings scan —
    * the msearch batching argument (X38) applied to counting: each
    * touched bucket is visited once and every query's presence walk
    * runs against the bucket's already-decoded lists, versus N
    * independent count jobs each paying its own scan and scheduling.
    * Supported kinds: FREE/OR (any term), AND (all terms); pattern
    * kinds count through their dictionary expansions like everywhere
    * else. Output is one Long per (query, bucket) — query-set-sized,
    * never match-set-sized. */
  def matchCountsBatch(queries: Seq[(String, String, String)])
      : Map[String, Long] = {
    require(queries.nonEmpty, "matchCountsBatch needs at least one filter")
    require(queries.map(_._1).distinct.size == queries.size,
      "filter names must be unique")
    val allowed = Set("FREE", "OR", "AND", "PREFIX", "REGEX", "WILD")
    val plans: Array[(String, Array[Long], Boolean, Int)] =
      queries.iterator.map { case (name, kind, text) =>
        require(allowed.contains(kind),
          s"matchCountsBatch supports ${allowed.mkString("/")}, got $kind")
        val terms = QueryParser.termsFor(kind, text)
        val entries = entriesFor(kind, text)
        val conj = kind == "AND"
        if (entries.isEmpty || (conj && entries.length < terms.distinct.length))
          (name, Array.empty[Long], conj, terms.distinct.length)
        else (name, entries.map(_.termId).sorted, conj, entries.length)
      }.toArray
    val unionTids = plans.flatMap(_._2).distinct.sorted
    if (unionTids.isEmpty) return plans.map(p => p._1 -> 0L).toMap
    val pls = segment.postings
      .filter($"termId".isin(unionTids.map(Long.box): _*)).as[PostingList]
    val positional = segment.params.positional
    val plansL = plans

    def walk(plIt: Iterator[PostingList]): Iterator[(String, Long)] = {
      val plByTid = plIt.map(pl => pl.termId -> pl).toMap
      plansL.iterator.map { case (name, tids, conj, nTerms) =>
        if (tids.isEmpty) (name, 0L)
        else {
          val slots = tids.map(tid => plByTid.get(tid)
            .map(pl => new Wand.TermCursor(tid, 0.0, pl, positional))
            .orNull)
          if (conj && slots.exists(_ == null)) (name, 0L)
          else {
            val eval: Array[Boolean] => Boolean =
              if (conj) p => { var i = 0; while (i < p.length && p(i)) i += 1; i == p.length }
              else p => { var i = 0; while (i < p.length && !p(i)) i += 1; i < p.length }
            (name, Wand.countMatches(slots, eval, Long.MaxValue))
          }
        }
      }
    }
    pls.groupByKey(_.bucket)
      .flatMapGroups((_, plIt) => walk(plIt))
      .toDF("name", "cnt")
      .groupBy($"name").agg(sum($"cnt").as("cnt"))
      .as[(String, Long)].collect().toMap ++
      plans.filter(_._2.isEmpty).map(p => p._1 -> 0L).toMap
  }

  /** Adjacency-matrix aggregation (the ES `adjacency_matrix` agg):
    * exact match counts for N named filters AND every pairwise
    * intersection, keyed "a&b" with the two names in lexicographic
    * order (the ES bucket-key convention). Same execution regime as
    * [[matchCountsBatch]] — ONE union-pushdown postings scan for the
    * whole matrix, each touched bucket visited once; an intersection
    * key walks the UNION of its two filters' lists with a composed
    * predicate (A-part AND B-part over per-filter presence masks), so
    * the N + N(N-1)/2 counts cost one scan, never N² jobs. Output is
    * (key × bucket)-sized Longs — query-set-sized, never
    * match-set-sized. Zero counts (incl. OOV/dead filters and their
    * pairs) are reported explicitly, not omitted as ES does — a count
    * contract wants a deterministic row set. */
  def adjacencyCounts(filters: Seq[(String, String, String)])
      : Map[String, Long] = {
    require(filters.size >= 2, "adjacencyCounts needs at least two filters")
    require(filters.map(_._1).distinct.size == filters.size,
      "filter names must be unique")
    require(filters.forall(f => !f._1.contains("&")),
      "filter names must not contain '&' (the intersection-key separator)")
    val allowed = Set("FREE", "OR", "AND", "PREFIX", "REGEX", "WILD")
    // per filter: distinct sorted tids, conjunctive?, matches-nothing?
    val base = filters.map { case (name, kind, text) =>
      require(allowed.contains(kind),
        s"adjacencyCounts supports ${allowed.mkString("/")}, got $kind")
      val terms = QueryParser.termsFor(kind, text)
      val entries = entriesFor(kind, text)
      val conj = kind == "AND"
      val dead = entries.isEmpty ||
        (conj && entries.length < terms.distinct.length)
      (name, entries.map(_.termId).distinct.sorted, conj, dead)
    }.sortBy(_._1).toArray
    def positions(union: Array[Long], in: Array[Long]): Array[Int] =
      in.map(t => java.util.Arrays.binarySearch(union, t))
    // countable plans: live singles + live pairs; masks index union tids
    val plans = scala.collection.mutable.ArrayBuffer
      .empty[(String, Array[Long], Boolean, Array[Int], Boolean, Array[Int])]
    val zeros = scala.collection.mutable.ArrayBuffer.empty[String]
    base.foreach { case (name, tids, conj, dead) =>
      if (dead) zeros += name
      else plans += ((name, tids, conj, tids.indices.toArray, false, null))
    }
    for (i <- base.indices; j <- (i + 1) until base.length) {
      val (na, ta, ca, da) = base(i)
      val (nb, tb, cb, db) = base(j)
      val key = s"$na&$nb"
      if (da || db) zeros += key
      else {
        val union = (ta ++ tb).distinct.sorted
        plans += ((key, union, ca, positions(union, ta),
          cb, positions(union, tb)))
      }
    }
    if (plans.isEmpty) return zeros.map(_ -> 0L).toMap
    val unionTids = plans.toArray.flatMap(_._2).distinct.sorted
    val pls = segment.postings
      .filter($"termId".isin(unionTids.map(Long.box): _*)).as[PostingList]
    val positional = segment.params.positional
    val plansL = plans.toArray

    def walk(plIt: Iterator[PostingList]): Iterator[(String, Long)] = {
      val plByTid = plIt.map(pl => pl.termId -> pl).toMap
      def part(p: Array[Boolean], conj: Boolean, pos: Array[Int]): Boolean = {
        var i = 0
        if (conj) { while (i < pos.length && p(pos(i))) i += 1; i == pos.length }
        else { while (i < pos.length && !p(pos(i))) i += 1; i < pos.length }
      }
      plansL.iterator.map { case (key, tids, ca, pa, cb, pb) =>
        val slots = tids.map(tid => plByTid.get(tid)
          .map(pl => new Wand.TermCursor(tid, 0.0, pl, positional))
          .orNull)
        // a conjunctive part with a bucket-missing term matches nothing
        def missing(conj: Boolean, pos: Array[Int]): Boolean =
          conj && pos.exists(x => slots(x) == null)
        if (missing(ca, pa) || (pb != null && missing(cb, pb))) (key, 0L)
        else {
          val eval: Array[Boolean] => Boolean =
            if (pb == null) p => part(p, ca, pa)
            else p => part(p, ca, pa) && part(p, cb, pb)
          (key, Wand.countMatches(slots, eval, Long.MaxValue))
        }
      }
    }
    pls.groupByKey(_.bucket)
      .flatMapGroups((_, plIt) => walk(plIt))
      .toDF("name", "cnt")
      .groupBy($"name").agg(sum($"cnt").as("cnt"))
      .as[(String, Long)].collect().toMap ++
      zeros.map(_ -> 0L).toMap
  }

  /** LM-Dirichlet retrieval (Zhai & Lafferty SIGIR'01; Lucene
    * LMDirichletSimilarity — the standard pluggable alternative to
    * BM25): disjunctive top-k under the Dirichlet-smoothed query
    * likelihood, p_t = cf_t/Σcf from the dictionary (exact Longs), the
    * per-term 0-clamp per Lucene. Execution is the exhaustive
    * union walk (LM scores have no stored per-list bound — block maxima
    * are BM25 impacts, so WAND soundly cannot prune here); termId
    * pushdown + bucket pruning still bound the scan. */
  def lmdHits(text: String, mu: Double, k: Int, qid: Long = 0L): Dataset[Hit] = {
    require(mu > 0.0, s"Dirichlet mu must be positive, got $mu")
    val entries = dictLookup(QueryParser.termsFor("FREE", text).distinct)
    if (entries.isEmpty) return spark.emptyDataset[Hit]
    val total = totalCf.toDouble
    val pByTid: Map[Long, Double] =
      entries.map(e => e.termId -> e.cf / total).toMap
    // idf values are unused by the LMD combiner; pass them anyway so the
    // cursor constructor stays uniform
    val idfByTid: Map[Long, Double] =
      entries.map(e => e.termId -> BM25.idf(stats.numDocs, e.df)).toMap
    rankTopK(scoredRaw(entries.map(_.termId), idfByTid, stats.avgDocLen,
      conjunctive = false, k, pruned = false, entries.length,
      lmdMu = mu, lmdP = pByTid)
      .toDF("docId", "score"), k, qid)
  }

  /** Span-first query (Lucene SpanFirstQuery): top-k docs where every
    * query term occurs within the first `n` tokens of the filtered
    * token stream — the "matches near the start of the file" heuristic
    * (imports/package/header hits in code search). Execution is the
    * phrase/NEAR regime: positional index required, termId pushdown +
    * bucket pruning, the position check reads only the aligned doc's
    * already-decoded occurrence list; scoring is standard BM25 over the
    * distinct terms (filter-doesn't-rescale). */
  def spanFirstHits(text: String, n: Int, k: Int, qid: Long = 0L): Dataset[Hit] = {
    require(n >= 1, s"span-first bound must be >= 1, got $n")
    require(segment.params.positional,
      "span-first queries need a positional index (BuildParams.positional)")
    val terms = QueryParser.termsFor("FREE", text)
    val entries = entriesFor("FREE", text)
    if (entries.isEmpty || entries.length < terms.distinct.length)
      return spark.emptyDataset[Hit]
    scored(entries, conjunctive = true, k, qid, pruned = true,
      phraseSlots = entries.map(_.termId), firstLimit = n)
  }

  /** Span-not query (the Lucene SpanNotQuery surface, single-term
    * include/exclude): top-k BM25 over documents where `incText`'s term
    * occurs at least once with NO occurrence of `excText`'s term within
    * `window` tokens on either side — "matches of A away from B", the
    * negative-context filter (e.g. `lock` not next to `unlock`, a call
    * site not preceded by its guard). Positional index required. An
    * out-of-vocabulary EXCLUDE degenerates to the plain term query (by
    * definition nothing is ever excluded); an OOV INCLUDE is empty.
    * Scoring is BM25 of the include term only (the NEAR/PHRASE
    * filter-doesn't-rescale rule) — see [[Wand.topKSpanNot]] for the
    * walk (include-driven, exclude skip-scanned, two-pointer position
    * merge). */
  def spanNotHits(incText: String, excText: String, window: Int, k: Int,
                  qid: Long = 0L): Dataset[Hit] = {
    require(window >= 0, s"span-not window must be >= 0, got $window")
    require(segment.params.positional,
      "span-not queries need a positional index (BuildParams.positional)")
    val incTerms = QueryParser.termsFor("FREE", incText).distinct
    val excTerms = QueryParser.termsFor("FREE", excText).distinct
    require(incTerms.length == 1,
      s"span-not include must be a single term, got '$incText'")
    require(excTerms.length == 1,
      s"span-not exclude must be a single term, got '$excText'")
    require(incTerms.head != excTerms.head,
      "span-not include and exclude must differ")
    val incE = dictLookup(incTerms)
    if (incE.isEmpty) return spark.emptyDataset[Hit]
    val excE = dictLookup(excTerms)
    val idfByTid: Map[Long, Double] =
      (incE ++ excE).map(e => e.termId -> BM25.idf(stats.numDocs, e.df)).toMap
    if (excE.isEmpty)
      return scored(incE, conjunctive = false, k, qid, pruned = true)
    val tids = (incE.map(_.termId) ++ excE.map(_.termId)).sorted
    rankTopK(scoredRaw(tids, idfByTid, stats.avgDocLen,
      conjunctive = false, k, pruned = false, nTerms = 1,
      exclTid = excE.head.termId, exclWin = window)
      .toDF("docId", "score"), k, qid)
  }

  /** Intervals query (the Lucene/ES `intervals` algebra: `ordered`
    * source with `max_gaps`, optionally wrapped in `not_containing` a
    * single filter term): top-k BM25 over documents where the query
    * terms occur IN ORDER with at most `maxGaps` non-matching tokens
    * inside the interval, and — when `notText` is non-empty — at least
    * one such interval contains no occurrence of the filter term.
    * Matching rule (pinned, shared with the SQL twin): a doc matches
    * iff some start occurrence's GREEDY ordered chain fits the gap
    * budget and avoids the filter; greedy is optimal for both criteria
    * so the existential is exact ([[Wand.intervalsMatch]]). An
    * out-of-vocabulary filter term degenerates to the unfiltered
    * intervals query (nothing can be contained); any OOV query term ⇒
    * empty (ordered conjunction). Scoring: BM25 over the distinct
    * query terms (the filter-doesn't-rescale rule — the filter term
    * never scores). */
  def intervalsHits(text: String, maxGaps: Int, notText: String, k: Int,
                    qid: Long = 0L): Dataset[Hit] = {
    require(maxGaps >= 0, s"max_gaps must be >= 0, got $maxGaps")
    require(segment.params.positional,
      "intervals queries need a positional index (BuildParams.positional)")
    val terms = QueryParser.termsFor("FREE", text)
    require(terms.length >= 2,
      s"intervals need >= 2 ordered terms, got '$text'")
    val entries = dictLookup(terms.distinct)
    if (entries.length < terms.distinct.length)
      return spark.emptyDataset[Hit]
    val notTerms = QueryParser.termsFor("FREE", notText).distinct
    require(notTerms.length <= 1,
      s"not_containing must be empty or a single term, got '$notText'")
    require(notTerms.isEmpty || !terms.contains(notTerms.head),
      "not_containing term must differ from the ordered query terms")
    val notE = dictLookup(notTerms)
    val byTerm = entries.map(e => e.term -> e.termId).toMap
    val idfByTid: Map[Long, Double] =
      (entries ++ notE).map(e => e.termId -> BM25.idf(stats.numDocs, e.df)).toMap
    val tids = (entries.map(_.termId) ++ notE.map(_.termId)).distinct.sorted
    rankTopK(scoredRaw(tids, idfByTid, stats.avgDocLen,
      conjunctive = true, k, pruned = false, nTerms = entries.length,
      phraseSlots = terms.map(byTerm),
      gapsLimit = maxGaps,
      containTid = notE.headOption.map(_.termId).getOrElse(-1L))
      .toDF("docId", "score"), k, qid)
  }

  /** Intervals query wrapped in `containing` (the dual of
    * [[intervalsHits]]'s `not_containing` — the other filter of the
    * Lucene/ES intervals algebra): top-k BM25 over documents where the
    * ordered terms fit the gap budget AND some such (greedy, minimized)
    * interval CONTAINS an occurrence of the filter term. The pinned
    * matching rule stays per-start greedy chains — the algebra's
    * minimized source intervals — so the existential keeps its exact
    * SQL form (EXISTS instead of NOT EXISTS). A document without the
    * filter term can never match (the filter cursor is REQUIRED, unlike
    * not_containing's optional one); an OOV filter term ⇒ empty.
    * Scoring: BM25 over the distinct ordered terms; the filter term
    * never scores (filter-doesn't-rescale). */
  def intervalsContainingHits(text: String, maxGaps: Int, containText: String,
                              k: Int, qid: Long = 0L): Dataset[Hit] = {
    require(maxGaps >= 0, s"max_gaps must be >= 0, got $maxGaps")
    require(segment.params.positional,
      "intervals queries need a positional index (BuildParams.positional)")
    val terms = QueryParser.termsFor("FREE", text)
    require(terms.length >= 2,
      s"intervals need >= 2 ordered terms, got '$text'")
    val entries = dictLookup(terms.distinct)
    if (entries.length < terms.distinct.length)
      return spark.emptyDataset[Hit]
    val containTerms = QueryParser.termsFor("FREE", containText).distinct
    require(containTerms.length == 1,
      s"containing must be a single term, got '$containText'")
    require(!terms.contains(containTerms.head),
      "containing term must differ from the ordered query terms")
    val contE = dictLookup(containTerms)
    if (contE.isEmpty) return spark.emptyDataset[Hit] // nothing to contain
    val byTerm = entries.map(e => e.term -> e.termId).toMap
    val idfByTid: Map[Long, Double] =
      (entries ++ contE).map(e => e.termId -> BM25.idf(stats.numDocs, e.df)).toMap
    val tids = (entries.map(_.termId) ++ contE.map(_.termId)).distinct.sorted
    rankTopK(scoredRaw(tids, idfByTid, stats.avgDocLen,
      conjunctive = true, k, pruned = false, nTerms = entries.length,
      phraseSlots = terms.map(byTerm),
      gapsLimit = maxGaps,
      containTid = contE.head.termId,
      containMode = true)
      .toDF("docId", "score"), k, qid)
  }

  /** Intervals query with `any_of` slot alternatives (the Lucene/ES
    * `intervals` algebra: an `ordered` source whose slots are `any_of`
    * disjunctions, optionally wrapped in `not_containing`): slot syntax
    * is `alt1|alt2` within the whitespace-separated ordered sequence,
    * e.g. "fast|slow merge" = (fast OR slow) then merge. A document
    * matches when some start occurrence's greedy ordered chain over the
    * per-slot MERGED alternative position lists fits the gap budget and
    * avoids the filter term — greedy stays exact because a slot's
    * eligible positions are still one ascending list
    * ([[Wand.topKIntervalsAny]]). Out-of-vocabulary alternatives drop
    * from their slot; a slot with NO in-vocabulary alternative ⇒ empty
    * (ordered conjunction). Scoring is the BOOL contract: BM25 over
    * every present distinct alternative term (whichever variant
    * matched); the filter term never scores. */
  def intervalsAnyHits(text: String, maxGaps: Int, notText: String, k: Int,
                       qid: Long = 0L): Dataset[Hit] = {
    require(maxGaps >= 0, s"max_gaps must be >= 0, got $maxGaps")
    require(segment.params.positional,
      "intervals queries need a positional index (BuildParams.positional)")
    val slots: Array[Array[String]] = QueryParser.intervalsAnySlots(text)
    require(slots.length >= 2,
      s"intervals need >= 2 ordered slots, got '$text'")
    val allAlts = slots.flatten.distinct
    val entries = dictLookup(allAlts)
    val byTerm = entries.map(e => e.term -> e.termId).toMap
    val slotTids = slots.map(_.flatMap(byTerm.get))
    if (slotTids.exists(_.isEmpty)) return spark.emptyDataset[Hit]
    val notTerms = QueryParser.termsFor("FREE", notText).distinct
    require(notTerms.length <= 1,
      s"not_containing must be empty or a single term, got '$notText'")
    require(notTerms.isEmpty || !allAlts.contains(notTerms.head),
      "not_containing term must differ from the slot alternatives")
    val notE = dictLookup(notTerms)
    val idfByTid: Map[Long, Double] =
      (entries ++ notE).map(e => e.termId -> BM25.idf(stats.numDocs, e.df)).toMap
    val tids = (entries.map(_.termId) ++ notE.map(_.termId)).distinct.sorted
    rankTopK(scoredRaw(tids, idfByTid, stats.avgDocLen,
      conjunctive = true, k, pruned = false, nTerms = slots.length,
      gapsLimit = maxGaps,
      containTid = notE.headOption.map(_.termId).getOrElse(-1L),
      slotAltTids = slotTids)
      .toDF("docId", "score"), k, qid)
  }

  /** Match-phrase-prefix (the Elasticsearch `match_phrase_prefix` /
    * Lucene MultiPhraseQuery surface — "search-as-you-type" over a
    * phrase): the LAST token of `text` is a live prefix, expanded
    * against the vocabulary under the PREFIX normalization rules and
    * the standard deterministic expansion cap; a document matches when
    * the fixed leading terms followed by ANY expansion occur
    * consecutively. Desugars to an OR of phrase atoms over the boolean
    * grammar, so scoring is the BOOL contract: BM25 over every present
    * expression term (fixed ∪ expansions), whichever variant matched —
    * one compiled-presence walk, not one job per variant. */
  def phrasePrefixHits(text: String, k: Int, qid: Long = 0L,
                       maxExpansion: Int = Searcher.MaxExpansion): Dataset[Hit] = {
    val pieces = Tokenizer.tokenizeUnfiltered(text.trim.stripSuffix("*"))
    if (pieces.isEmpty) return spark.emptyDataset[Hit]
    val prefix = pieces.last
    // leading pieces pass the indexer's own token filter (the pieces
    // are already boundary-split, so only the length/number rules apply)
    val fixed = pieces.init.filter(p =>
      p.length >= Tokenizer.MinLen && p.length <= Tokenizer.MaxLen &&
        !p.forall(_.isDigit)).toList
    if (fixed.nonEmpty)
      require(segment.params.positional,
        "phrase-prefix queries need a positional index (BuildParams.positional)")
    val expansions = dictLookupPrefix(prefix, maxExpansion)
    if (expansions.isEmpty) return spark.emptyDataset[Hit]
    val ast: BoolQuery.Expr = BoolQuery.Or(expansions.map { e =>
      if (fixed.isEmpty) BoolQuery.Term(e.term): BoolQuery.Expr
      else BoolQuery.Phrase(fixed :+ e.term): BoolQuery.Expr
    }.toList)
    boolHitsAst(ast, text, k, qid)
  }

  /** Common-terms query (the Lucene CommonTermsQuery surface — the
    * scale-era answer to stopword lists): query terms split by document
    * frequency at `maxDfFrac`·N — RARE terms (df strictly below the
    * cutoff) are required (conjunctive), COMMON terms are optional but
    * still score when present. A stopword-heavy query thus stays as
    * selective as its informative terms while "the"-class terms only
    * nudge ranking. When every term is common the query degrades to the
    * plain disjunction (the Lucene rule: nothing left to require).
    *
    * Same machinery as [[msmHits]]: the compiled-presence walk with a
    * required-slot mask over ascending-termId slots; scoring is BM25
    * over ALL present distinct terms (required and optional alike). OOV
    * terms are unmatchable and ignored — they are neither required nor
    * scorable. */
  def commonTermsHits(text: String, maxDfFrac: Double, k: Int,
                      qid: Long = 0L): Dataset[Hit] = {
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")
    val entries = dictLookup(QueryParser.termsFor("OR", text).distinct)
    if (entries.isEmpty) return spark.emptyDataset[Hit]
    val cutoff = maxDfFrac * stats.numDocs
    val required: Array[Boolean] = entries.map(_.df < cutoff)
    val idfByTid: Map[Long, Double] =
      entries.map(e => e.termId -> BM25.idf(stats.numDocs, e.df)).toMap
    val eval: Array[Boolean] => Boolean =
      if (!required.exists(identity)) { p =>
        var any = false
        var i = 0
        while (i < p.length) { if (p(i)) any = true; i += 1 }
        any
      } else { p =>
        var ok = true
        var i = 0
        while (i < p.length) { if (required(i) && !p(i)) ok = false; i += 1 }
        ok
      }
    rankTopK(scoredRaw(entries.map(_.termId), idfByTid, stats.avgDocLen,
      conjunctive = false, k, pruned = false, entries.length, boolEval = eval)
      .toDF("docId", "score"), k, qid)
  }

  /** The query's full match set as (docId) rows under the kind's own
    * semantics — the FOREGROUND set for aggregations that need more than
    * facet counts (significant terms). None = provably empty. */
  def matchDocIds(kind: String, text: String): Option[DataFrame] =
    matchSet(kind, text)

  /** Batched multi-query execution ("msearch" — the offline query-log
    * shape: replay an eval set, mine hard negatives for 10k training
    * queries): N queries answered in ONE job over ONE postings scan.
    *
    * Per query the result is BIT-IDENTICAL to `hits` (MsearchSpec); what
    * batching changes is the plan: the scan's pushed predicate is the
    * UNION of every query's termIds and each touched bucket is visited
    * once, with every query's walk run against the bucket's lists —
    * versus N independent jobs each paying its own scan, shuffle, and
    * scheduling. At 10k queries the union-termId scan reads each posting
    * list ONCE for all queries that share the term (cursor decode is
    * per-query, the bytes and I/O are amortized).
    *
    * Supports the term-entry kinds (FREE/OR/AND and the PREFIX/REGEX/
    * FUZZY expansions) with boosts; a query with no satisfiable entries
    * contributes no rows, exactly like `hits`. Positional and boolean
    * kinds keep their dedicated walks — batch those through
    * [[graft.pipeline.Percolator]] when the corpus side is the stream.
    *
    * Scale: per (query, bucket) the walk emits ≤k rows, so the post-walk
    * exchange carries ≤ |queries|·k rows per bucket into a per-query
    * window rank — never corpus-sized. Query plans resolve driver-side
    * against the cached dict (the ServingSearcher discipline). */
  def batchHits(queries: Seq[(Long, String, String)], k: Int): Dataset[Hit] = {
    require(queries.nonEmpty, "batchHits needs at least one query")
    require(queries.map(_._1).distinct.size == queries.size,
      "batchHits qids must be unique")
    val allowed = Set("FREE", "OR", "AND", "PREFIX", "REGEX", "WILD",
      "FUZZY", "STEM")
    // per-query plan: ascending termIds, idf, boost, conjunctive flag
    val plans: Array[(Long, Array[Long], Map[Long, Double], Map[Long, Double], Boolean, Int)] =
      queries.iterator.flatMap { case (qid, kind, text) =>
        require(allowed.contains(kind),
          s"batchHits supports ${allowed.mkString("/")}, got $kind")
        val terms = QueryParser.termsFor(kind, text)
        val entries = entriesFor(kind, text)
        val conj = kind == "AND"
        if (entries.isEmpty || (conj && entries.length < terms.distinct.length))
          None // unsatisfiable: contributes no rows, like hits()
        else {
          val idf = entries.map(e => e.termId -> BM25.idf(stats.numDocs, e.df)).toMap
          val boosts = Searcher.toTidBoosts(entries, QueryParser.boosts(kind, text))
          Some((qid, entries.map(_.termId), idf,
            if (boosts == null) Map.empty[Long, Double] else boosts,
            conj, entries.length))
        }
      }.toArray
    if (plans.isEmpty) return spark.emptyDataset[Hit]
    val unionTids = plans.flatMap(_._2).distinct.sorted
    val pls = segment.postings
      .filter($"termId".isin(unionTids.map(Long.box): _*)).as[PostingList]
    // locals only — the Searcher itself must not be captured
    val positional = segment.params.positional
    val avgdl = stats.avgDocLen
    val kk = k
    val plansL = plans

    def walk(plIt: Iterator[PostingList], firstDocId: Long,
             lens: Array[Int]): Iterator[(Long, Long, Double)] = {
      val plByTid = plIt.map(pl => pl.termId -> pl).toMap
      plansL.iterator.flatMap { case (qid, tids, idf, boosts, conj, nTerms) =>
        val present = tids.flatMap(plByTid.get)
        if (present.isEmpty || (conj && present.length < nTerms))
          Iterator.empty
        else {
          val cursors = present.map(pl =>
            new Wand.TermCursor(pl.termId, idf(pl.termId), pl, positional,
              0L, Long.MaxValue, boosts.getOrElse(pl.termId, 1.0)))
          val res =
            if (conj) Wand.topKAnd(cursors, lens, firstDocId, avgdl, kk, null, null)
            else Wand.topK(cursors, lens, firstDocId, avgdl, kk, null, null)
          res.iterator.map(s => (qid, s.docId, s.score))
        }
      }
    }

    val raw = doclenResident match {
      case Some(bc) =>
        pls.groupByKey(_.bucket).flatMapGroups { (bucket, plIt) =>
          bc.value.get(bucket) match {
            case Some((first, lens)) => walk(plIt, first, lens)
            case None => Iterator.empty
          }
        }
      case None =>
        val dlb = segment.doclens
          .join(broadcast(pls.select($"bucket").distinct()), Seq("bucket"), "left_semi")
          .as[DocLenBlock]
        pls.groupByKey(_.bucket).cogroup(dlb.groupByKey(_.bucket)) {
          (_, plIt, dlIt) =>
            if (!dlIt.hasNext || !plIt.hasNext) Iterator.empty
            else {
              val dl = dlIt.next()
              walk(plIt, dl.firstDocId, dl.lens)
            }
        }
    }
    raw.toDF("qid", "docId", "score")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"qid").orderBy($"score".desc, $"docId".asc)))
      .filter($"rank" <= k)
      .select($"qid", $"rank", $"docId", $"score").as[Hit]
  }

  /** Top-k restricted to the docId range `[lo, hi)` — scoped search
    * (e.g. one repo, one repo prefix: contiguous by the P4 sort order).
    * Scores keep GLOBAL corpus statistics (idf/avgdl), the standard
    * filter-doesn't-rescale semantics; the restriction is pushed all the
    * way down: bucket pruning on the postings scan + a range view on
    * every cursor (block skips, no filter pass). */
  def scopedHits(kind: String, text: String, k: Int, lo: Long, hi: Long,
                 qid: Long = 0L): Dataset[Hit] =
    hitsImpl(kind, text, k, qid, pruned = true, lo = lo, hi = hi)

  private type AcceptB = org.apache.spark.broadcast.Broadcast[Map[Int, Array[Long]]]

  private def hitsImpl(kind: String, text: String, k: Int, qid: Long,
                       pruned: Boolean, lo: Long = 0L,
                       hi: Long = Long.MaxValue,
                       acceptB: AcceptB = null,
                       rejectB: AcceptB = null,
                       after: Wand.Scored = null,
                       maxscore: Boolean = false): Dataset[Hit] = {
    if (kind == "BOOL")
      return boolHits(text, k, qid, lo, hi, acceptB, rejectB, after)
    val terms = QueryParser.termsFor(kind, text)
    val entries = entriesFor(kind, text) // ONE expansion dispatch, every caller
    val needAll = kind == "AND" || kind == "PHRASE" || kind == "NEAR" ||
      kind == "ONEAR"
    if (entries.isEmpty || (needAll && entries.length < terms.distinct.length))
      return spark.emptyDataset[Hit] // AND/PHRASE/NEAR with an unknown term ⇒ ∅
    val boostByTid = Searcher.toTidBoosts(entries, QueryParser.boosts(kind, text))
    kind match {
      case "PHRASE" =>
        require(segment.params.positional,
          "phrase queries need a positional index (BuildParams.positional)")
        val byTerm = entries.map(e => e.term -> e).toMap
        val slots = terms.map(t => byTerm(t).termId)
        scored(entries, conjunctive = true, k, qid, pruned, phraseSlots = slots,
          lo = lo, hi = hi, acceptB = acceptB, rejectB = rejectB, after = after)
      case "NEAR" =>
        require(segment.params.positional,
          "proximity queries need a positional index (BuildParams.positional)")
        scored(entries, conjunctive = true, k, qid, pruned,
          phraseSlots = entries.map(_.termId),
          nearWindow = QueryParser.nearWindow(text), lo = lo, hi = hi,
          acceptB = acceptB, rejectB = rejectB, after = after)
      case "ONEAR" =>
        require(segment.params.positional,
          "proximity queries need a positional index (BuildParams.positional)")
        // slots in QUERY order (the ordering IS the constraint); the
        // negative window carries orderedness through scoredRaw
        val byTerm = entries.map(e => e.term -> e.termId).toMap
        scored(entries, conjunctive = true, k, qid, pruned,
          phraseSlots = terms.map(byTerm),
          nearWindow = -QueryParser.orderedWindow(text), lo = lo, hi = hi,
          acceptB = acceptB, rejectB = rejectB, after = after)
      case _ =>
        scored(entries, conjunctive = kind == "AND", k, qid, pruned,
          lo = lo, hi = hi, acceptB = acceptB, rejectB = rejectB, after = after,
          boostByTid = boostByTid, maxscore = maxscore)
    }
  }

  private def scored(entries: Array[DictEntry], conjunctive: Boolean, k: Int,
                     qid: Long, pruned: Boolean,
                     phraseSlots: Array[Long] = null,
                     nearWindow: Int = 0, lo: Long = 0L,
                     hi: Long = Long.MaxValue,
                     acceptB: AcceptB = null,
                     rejectB: AcceptB = null,
                     after: Wand.Scored = null,
                     boostByTid: Map[Long, Double] = null,
                     firstLimit: Int = 0,
                     maxscore: Boolean = false): Dataset[Hit] = {
    val idfByTid: Map[Long, Double] =
      entries.map(e => e.termId -> BM25.idf(stats.numDocs, e.df)).toMap
    rankTopK(scoredRaw(entries.map(_.termId), idfByTid, stats.avgDocLen,
      conjunctive, k, pruned, entries.length, maxscore, phraseSlots, nearWindow, lo, hi,
      acceptB = acceptB, rejectB = rejectB, after = after,
      boostByTid = boostByTid, firstLimit = firstLimit)
      .toDF("docId", "score"), k, qid)
  }

  /** Nested boolean query (kind BOOL): parse parens/precedence, look up
    * the expression's distinct terms, compile the presence predicate
    * over ascending-termId slots, and run the document-at-a-time walk.
    * Unsatisfiable expressions (an AND branch naming an out-of-vocabulary
    * term with no OR escape) short-circuit to ∅ without a job. */
  private def boolHits(text: String, k: Int, qid: Long,
                       lo: Long, hi: Long,
                       acceptB: AcceptB = null,
                       rejectB: AcceptB = null,
                       after: Wand.Scored = null): Dataset[Hit] =
    boolHitsAst(BoolQuery.parse(text), text, k, qid, lo, hi,
      acceptB, rejectB, after)

  /** [[boolHits]] over a pre-built AST — shared by the text parser path
    * and surfaces that synthesize boolean expressions directly (e.g.
    * [[phrasePrefixHits]]). */
  private def boolHitsAst(ast: BoolQuery.Expr, text: String, k: Int,
                          qid: Long, lo: Long = 0L,
                          hi: Long = Long.MaxValue,
                          acceptB: AcceptB = null,
                          rejectB: AcceptB = null,
                          after: Wand.Scored = null): Dataset[Hit] = {
    boolPlan(ast) match {
      case None => spark.emptyDataset[Hit]
      case Some(plan) =>
        require(!plan.matchesEmpty,
          s"pure-negative boolean query '$text' matches a corpus-sized " +
            "complement; add a positive requirement (a AND NOT x)")
        val entries = plan.entries
        val idfByTid: Map[Long, Double] =
          entries.map(e => e.termId -> BM25.idf(stats.numDocs, e.df)).toMap
        val boostByTid = Searcher.toTidBoosts(entries,
          Searcher.boolTermBoosts(ast, plan.patEntries))
        rankTopK(scoredRaw(entries.map(_.termId), idfByTid, stats.avgDocLen,
          conjunctive = false, k, pruned = false, entries.length,
          boolEval = plan.eval, boolPhrases = plan.phraseDefs,
          boolWins = plan.phraseWins,
          lo = lo, hi = hi, acceptB = acceptB, rejectB = rejectB,
          after = after, boostByTid = boostByTid)
          .toDF("docId", "score"), k, qid)
    }
  }

  /** The compiled evaluation plan of a boolean expression over THIS
    * segment's vocabulary: resolved entries (fixed terms ∪ pattern
    * expansions, ascending termId), the presence predicate, and the
    * positional-atom slot layout. None = provably empty (unsatisfiable
    * under this vocabulary) without running a job. */
  private case class BoolPlan(entries: Array[DictEntry],
                              patEntries: Map[BoolQuery.Pattern, Array[DictEntry]],
                              eval: Array[Boolean] => Boolean,
                              phraseDefs: Array[Array[Int]],
                              phraseWins: Array[Int],
                              matchesEmpty: Boolean)

  private def boolPlan(ast: BoolQuery.Expr): Option[BoolPlan] = {
    val terms = BoolQuery.terms(ast)
    val pats = BoolQuery.patterns(ast)
    // fixed-term lookups ∪ per-pattern dictionary expansions (the
    // PREFIX/REGEX-kind machinery as leaves), deduped, ascending termId
    val patEntries: Map[BoolQuery.Pattern, Array[DictEntry]] = pats.map(p =>
      p -> (if (p.isRegex) dictLookupRegex(p.raw)
            else dictLookupPrefix(p.raw))).toMap
    val entries = (dictLookup(terms) ++ patEntries.valuesIterator.flatten)
      .distinctBy(_.termId).sortBy(_.termId)
    if (entries.isEmpty ||
        !BoolQuery.satisfiable(ast, entries.map(_.term).toSet))
      return None
    val atoms = BoolQuery.posAtoms(ast)
    if (atoms.nonEmpty)
      require(segment.params.positional,
        "phrase/NEAR atoms in a boolean query need a positional index (BuildParams.positional)")
    val slotByTerm = entries.zipWithIndex.map { case (e, i) => e.term -> i }.toMap
    val phraseSlot = atoms.zipWithIndex.toMap
    val patternSlots = patEntries.map { case (p, es) =>
      p -> es.map(e => slotByTerm(e.term)) }
    val eval = BoolQuery.compile(ast, slotByTerm, phraseSlot, entries.length,
      patternSlots)
    val phraseDefs: Array[Array[Int]] =
      if (atoms.isEmpty) null
      else atoms.map { case (ts, _) => ts.map(t => slotByTerm.getOrElse(t, -1)).toArray }
    val phraseWins: Array[Int] = if (atoms.isEmpty) null else atoms.map(_._2)
    Some(BoolPlan(entries, patEntries, eval, phraseDefs, phraseWins,
      BoolQuery.matchesEmpty(ast, slotByTerm, entries.length, phraseSlot,
        entries.length, patternSlots)))
  }

  /** Doc-length arrays up to this many documents stay resident
    * (broadcast once per searcher) — the Lucene-style serving posture: a
    * shard's doc values live in memory. Above it, the doclens dataset is
    * cogrouped in per query (the 100 TB path, where no single node could
    * hold the forward array). */
  private val DoclenResidentLimit = 16L << 20
  private lazy val doclenResident
      : Option[org.apache.spark.broadcast.Broadcast[Map[Int, (Long, Array[Int])]]] =
    if (residentDoclens && stats.numDocs <= DoclenResidentLimit)
      Some(spark.sparkContext.broadcast(
        segment.doclens.collect().map(b => b.bucket -> (b.firstDocId, b.lens)).toMap))
    else None

  /** Per-bucket walk emitting unranked (docId, score) — the building
    * block shared with MultiSearcher, which supplies GLOBAL (cross-
    * segment) idf/avgdl instead of this segment's own. */
  private[search] def scoredRaw(tids: Array[Long], idfByTid: Map[Long, Double],
                                avgdl: Double, conjunctive: Boolean, k: Int,
                                pruned: Boolean, nTerms: Int,
                                maxscore: Boolean = false,
                                phraseSlots: Array[Long] = null,
                                nearWindow: Int = 0, lo: Long = 0L,
                                hi: Long = Long.MaxValue,
                                boolEval: Array[Boolean] => Boolean = null,
                                boolPhrases: Array[Array[Int]] = null,
                                boolWins: Array[Int] = null,
                                acceptB: AcceptB = null,
                                rejectB: AcceptB = null,
                                after: Wand.Scored = null,
                                boostByTid: Map[Long, Double] = null,
                                dismaxTie: Double = Double.NaN,
                                firstLimit: Int = 0,
                                lmdMu: Double = Double.NaN,
                                lmdP: Map[Long, Double] = null,
                                exclTid: Long = -1L,
                                exclWin: Int = 0,
                                gapsLimit: Int = -1,
                                containTid: Long = -1L,
                                slotAltTids: Array[Array[Long]] = null,
                                containMode: Boolean = false)
      : Dataset[(Long, Double)] = {
    // query-time term weights: scale each cursor's effective idf AND its
    // stored block-max bounds (TermCursor.boost) — absent/1.0 = neutral
    val bo: Long => Double =
      if (boostByTid == null) null
      else tid => boostByTid.getOrElse(tid, 1.0)
    val scoped = lo > 0L || hi != Long.MaxValue
    val pls0 = segment.postings.filter($"termId".isin(tids.toSeq: _*))
    // scoped search prunes whole buckets before any decode. Bounds stay
    // in Long: an open-ended scope (hi = Long.MaxValue) would overflow
    // ((hi-1)/bs).toInt to a negative bucket and silently drop everything.
    val bs = segment.params.bucketSize
    // clamp to Int AFTER the Long division so the filter literals stay
    // Int (bucket is the partition column — a cast would defeat pruning)
    val loBucket = math.min(lo / bs, Int.MaxValue.toLong).toInt
    val hiBucket = math.min((hi - 1) / bs, Int.MaxValue.toLong).toInt
    val pls = (if (scoped)
      pls0.filter($"bucket" >= loBucket && $"bucket" <= hiBucket)
    else pls0).as[PostingList]
    val positional = segment.params.positional

    def walk(bucket: Int, plIt: Iterator[PostingList], firstDocId: Long,
             lens: Array[Int]): Iterator[(Long, Double)] = {
      // fielded filter: resolve this bucket's bitset once; a bucket with
      // no matching docs skips its walk (and decode) entirely
      val acceptPos: Long => Boolean =
        if (acceptB == null) null
        else acceptB.value.get(bucket) match {
          case None => return Iterator.empty
          case Some(bits) =>
            val base = bucket.toLong * bs
            d => { val off = (d - base).toInt; (bits(off >> 6) & (1L << (off & 63))) != 0L }
        }
      // tombstones: a bucket with no deletions probes nothing
      val reject: Long => Boolean =
        if (rejectB == null) null
        else rejectB.value.get(bucket) match {
          case None => null
          case Some(bits) =>
            val base = bucket.toLong * bs
            d => { val off = (d - base).toInt; (bits(off >> 6) & (1L << (off & 63))) != 0L }
        }
      val accept: Long => Boolean = (acceptPos, reject) match {
        case (null, null) => null
        case (a, null) => a
        case (null, r) => d => !r(d)
        case (a, r) => d => a(d) && !r(d)
      }
      val plArr = plIt.toArray
      def cursors = plArr.map { pl =>
        new Wand.TermCursor(pl.termId, idfByTid(pl.termId), pl, positional, lo, hi,
          if (bo == null) 1.0 else bo(pl.termId))
      }
      val res =
        if (boolEval != null) {
          // slots aligned to the GLOBAL ascending-termId order `tids`;
          // a slot with no list in this bucket stays null (never present)
          val plByTid = plArr.map(pl => pl.termId -> pl).toMap
          val slots = tids.map(tid => plByTid.get(tid)
            .map(pl => new Wand.TermCursor(tid, idfByTid(tid), pl, positional,
              lo, hi, if (bo == null) 1.0 else bo(tid)))
            .orNull)
          Wand.topKBool(slots, lens, firstDocId, avgdl, k, boolEval, accept,
            after, boolPhrases, boolWins)
        } else if (gapsLimit >= 0 && slotAltTids != null) {
          // intervals any_of: each ordered slot carries alternative
          // termIds; an alternative absent from the bucket just drops
          // out of its slot, a slot with NO alternative in the bucket
          // kills the bucket (ordered conjunction of disjunctions). One
          // cursor per distinct termId, shared across slots.
          val plByTid = plArr.map(pl => pl.termId -> pl).toMap
          val curByTid = collection.mutable.Map.empty[Long, Wand.TermCursor]
          def cursorFor(tid: Long): Option[Wand.TermCursor] =
            curByTid.get(tid).orElse(plByTid.get(tid).map { pl =>
              val c = new Wand.TermCursor(tid, idfByTid(tid), pl, positional,
                lo, hi, if (bo == null) 1.0 else bo(tid))
              curByTid(tid) = c
              c
            })
          val slotCs = slotAltTids.map(_.flatMap(tid => cursorFor(tid)))
          if (slotCs.exists(_.isEmpty)) Array.empty[Wand.Scored]
          else {
            val not =
              if (containTid >= 0L)
                plByTid.get(containTid)
                  .map(pl => new Wand.TermCursor(containTid, 0.0, pl,
                    positional, lo, hi))
                  .orNull
              else null
            Wand.topKIntervalsAny(slotCs, lens, firstDocId, avgdl, k,
              gapsLimit, not, accept, after)
          }
        } else if (gapsLimit >= 0 && phraseSlots != null) {
          // intervals: ordered slots in QUERY order; the not_containing
          // list is OPTIONAL per bucket (a doc without it is unfiltered)
          val plByTid = plArr.map(pl => pl.termId -> pl).toMap
          if (phraseSlots.distinct.exists(tid => !plByTid.contains(tid)))
            Array.empty[Wand.Scored]
          else {
            val slots = phraseSlots.map(tid =>
              new Wand.TermCursor(tid, idfByTid(tid), plByTid(tid), positional,
                lo, hi, if (bo == null) 1.0 else bo(tid)))
            val not =
              if (containTid >= 0L)
                plByTid.get(containTid)
                  .map(pl => new Wand.TermCursor(containTid, 0.0, pl,
                    positional, lo, hi))
                  .orNull
              else null
            Wand.topKIntervals(slots, lens, firstDocId, avgdl, k, gapsLimit,
              not, accept, after, mustContain = containMode)
          }
        } else if (exclTid >= 0L) {
          // span-not: the exclude list is OPTIONAL per bucket (a bucket
          // without it matches on the include term alone); the include
          // list is required
          val plByTid = plArr.map(pl => pl.termId -> pl).toMap
          val incTid = tids.find(_ != exclTid).get
          plByTid.get(incTid) match {
            case None => Array.empty[Wand.Scored]
            case Some(ipl) =>
              val inc = new Wand.TermCursor(incTid, idfByTid(incTid), ipl,
                positional, lo, hi, if (bo == null) 1.0 else bo(incTid))
              val exc = plByTid.get(exclTid)
                .map(pl => new Wand.TermCursor(exclTid, 0.0, pl, positional,
                  lo, hi))
                .orNull
              Wand.topKSpanNot(inc, exc, lens, firstDocId, avgdl, k,
                exclWin, exclWin, accept, after)
          }
        } else if (phraseSlots != null) {
          // one independent cursor per phrase/near slot (duplicates included)
          val plByTid = plArr.map(pl => pl.termId -> pl).toMap
          if (plByTid.size < nTerms) Array.empty[Wand.Scored]
          else {
            val slots = phraseSlots.map(tid =>
              new Wand.TermCursor(tid, idfByTid(tid), plByTid(tid), positional,
                lo, hi, if (bo == null) 1.0 else bo(tid)))
            // nearWindow sign convention (every tier): > 0 unordered
            // NEAR/w, < 0 ordered BEFORE/w (window = −nearWindow, slots
            // in QUERY order), 0 phrase; firstLimit > 0 = span-first
            if (firstLimit > 0)
              Wand.topKSpanFirst(slots, lens, firstDocId, avgdl, k, firstLimit, accept, after)
            else if (nearWindow > 0)
              Wand.topKNear(slots, lens, firstDocId, avgdl, k, nearWindow, accept, after)
            else if (nearWindow < 0)
              Wand.topKONear(slots, lens, firstDocId, avgdl, k, -nearWindow, accept, after)
            else Wand.topKPhrase(slots, lens, firstDocId, avgdl, k, accept, after)
          }
        } else if (conjunctive) {
          // a bucket missing any query term cannot intersect
          if (plArr.length < nTerms) Array.empty[Wand.Scored]
          else Wand.topKAnd(cursors, lens, firstDocId, avgdl, k, accept, after)
        } else if (!lmdMu.isNaN)
          Wand.topKLmd(cursors, lens, firstDocId, k, lmdMu, lmdP, accept, after)
        else if (!dismaxTie.isNaN)
          Wand.topKDisMax(cursors, lens, firstDocId, avgdl, k, dismaxTie, accept, after)
        else if (pruned && maxscore)
          Wand.topKMaxScore(cursors, lens, firstDocId, avgdl, k, accept, after)
        else if (pruned) Wand.topK(cursors, lens, firstDocId, avgdl, k, accept, after)
        else Wand.topKOrExhaustive(cursors, lens, firstDocId, avgdl, k, accept, after)
      res.iterator.map(s => (s.docId, s.score))
    }

    doclenResident match {
      case Some(bc) =>
        // resident mode: one scan + one tiny shuffle of ≤|q| rows/bucket
        pls.groupByKey(_.bucket).flatMapGroups { (bucket, plIt) =>
          bc.value.get(bucket) match {
            case Some((first, lens)) => walk(bucket, plIt, first, lens)
            case None => Iterator.empty
          }
        }
      case None =>
        // cogroup mode: doclens arrive co-partitioned, pruned to the
        // query's touched buckets by a lazy broadcast semi-join
        val dlb = segment.doclens
          .join(broadcast(pls.select($"bucket").distinct()), Seq("bucket"), "left_semi")
          .as[DocLenBlock]
        pls.groupByKey(_.bucket).cogroup(dlb.groupByKey(_.bucket)) {
          (bucket, plIt, dlIt) =>
            if (!dlIt.hasNext || !plIt.hasNext) Iterator.empty
            else {
              val dl = dlIt.next()
              walk(bucket, plIt, dl.firstDocId, dl.lens)
            }
        }
    }
  }

  /** Global top-k + dense rank. orderBy+limit plans as
    * TakeOrderedAndProject (per-partition partial top-k, driver merge);
    * rank is then assigned by position in a narrow single-partition pass —
    * no window exchange (≤k rows; coalesce(1) guards the ordering). */
  private[search] def rankTopK(hitsDf: DataFrame, k: Int, qid: Long): Dataset[Hit] = {
    hitsDf
      .orderBy($"score".desc, $"docId".asc)
      .limit(k)
      .select($"docId", $"score")
      .as[(Long, Double)]
      .coalesce(1)
      .mapPartitions { it =>
        var r = 0
        it.map { case (d, s) => r += 1; Hit(qid, r, d, s) }
      }
  }

  def search(q: Query): Dataset[Hit] = {
    val (kind, _) = if (q.kind == "PARSE") QueryParser.parse(q.text) else (q.kind, null)
    hits(kind, q.text, q.k, q.qid)
  }

  /** Matched positions for highlighting/snippets: for each (docId in
    * `docIds`) × (query term in `entries`), the term's occurrence
    * positions in that document — decoded from the positional index
    * (codec v2), which stores exactly this. The scan touches ONLY the
    * query's termIds and the ≤k hit docs' buckets (both pushed down);
    * inside each posting list the cursor GALLOPS to the target docIds —
    * no full-list decode. Positions are 0-based indices over the
    * filtered token stream (the index's position space).
    *
    * Returns (docId, termId, pos) rows. */
  def matchedPositions(entries: Array[DictEntry], docIds: Array[Long])
      : Dataset[(Long, Long, Int)] = {
    require(segment.params.positional,
      "highlighting needs a positional index (BuildParams.positional)")
    if (entries.isEmpty || docIds.isEmpty)
      return spark.emptyDataset[(Long, Long, Int)]
    val bs = segment.params.bucketSize
    val byBucket: Map[Int, Array[Long]] =
      docIds.groupBy(d => (d / bs).toInt).map { case (b, ds) => b -> ds.sorted }
    val bcast = spark.sparkContext.broadcast(byBucket)
    val tids = entries.map(_.termId)
    val buckets = byBucket.keys.toSeq
    segment.postings
      .filter($"termId".isin(tids.toSeq: _*) && $"bucket".isin(buckets: _*))
      .as[PostingList]
      .flatMap { pl =>
        val targets = bcast.value.getOrElse(pl.bucket, Array.empty[Long])
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
        val c = new graft.codec.PostingCodec.Cursor(
          pl.numDocs, pl.lastDocIds, pl.maxImpacts, pl.offsets, pl.bytes,
          positional = true)
        var i = 0
        while (i < targets.length && !c.exhausted) {
          c.nextGeq(targets(i))
          if (!c.exhausted && c.docId == targets(i)) {
            val ps = c.positions()
            var j = 0
            while (j < ps.length) { out += ((targets(i), pl.termId, ps(j))); j += 1 }
          }
          i += 1
        }
        out
      }
  }

  /** The dictionary entries a query's kind actually matches against —
    * the kind's own expansion rules: PREFIX/REGEX expand against the
    * vocabulary, BOOL takes its fixed terms ∪ pattern-leaf expansions
    * (a hit matched via `s*` must explain/highlight the expanded term),
    * everything else is a plain lookup. Shared by the highlight and
    * explain surfaces so neither under-reports expansion kinds. */
  def entriesFor(kind: String, text: String): Array[DictEntry] = {
    val terms = QueryParser.termsFor(kind, text)
    kind match {
      case "PREFIX" => dictLookupPrefix(terms.head)
      // WILD arrives pre-translated (termsFor ran globToRegex), so the
      // regex expansion path serves both kinds unchanged
      case "REGEX" | "WILD" => dictLookupRegex(terms.head)
      case "FUZZY" => dictLookupFuzzy(terms.head, QueryParser.fuzzyDist(text))
      case "STEM" => dictLookupStem(terms.head)
      case "BOOL" =>
        boolPlan(BoolQuery.parse(text)).map(_.entries)
          .getOrElse(Array.empty[DictEntry])
      case _ => dictLookup(terms.distinct)
    }
  }

  /** Matched term frequencies for scoring explanations: for each
    * (docId in `docIds`) × (query term in `entries`), the stored tf —
    * the same pushdown + galloping-cursor shape as [[matchedPositions]]
    * (only the query's termIds and the ≤k hit docs' buckets are read,
    * never a full-list decode), but works on positional and
    * non-positional segments alike (tf rides the v1 stream).
    *
    * Returns (docId, termId, tf) rows. */
  def matchedTfs(entries: Array[DictEntry], docIds: Array[Long])
      : Dataset[(Long, Long, Int)] = {
    if (entries.isEmpty || docIds.isEmpty)
      return spark.emptyDataset[(Long, Long, Int)]
    val bs = segment.params.bucketSize
    val positional = segment.params.positional
    val byBucket: Map[Int, Array[Long]] =
      docIds.groupBy(d => (d / bs).toInt).map { case (b, ds) => b -> ds.sorted }
    val bcast = spark.sparkContext.broadcast(byBucket)
    val tids = entries.map(_.termId)
    val buckets = byBucket.keys.toSeq
    segment.postings
      .filter($"termId".isin(tids.toSeq: _*) && $"bucket".isin(buckets: _*))
      .as[PostingList]
      .flatMap { pl =>
        val targets = bcast.value.getOrElse(pl.bucket, Array.empty[Long])
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
        val c = new graft.codec.PostingCodec.Cursor(
          pl.numDocs, pl.lastDocIds, pl.maxImpacts, pl.offsets, pl.bytes,
          positional = positional)
        var i = 0
        while (i < targets.length && !c.exhausted) {
          c.nextGeq(targets(i))
          if (!c.exhausted && c.docId == targets(i))
            out += ((targets(i), pl.termId, c.tf))
          i += 1
        }
        out
      }
  }

  /** Top-k hits WITH their matched positions — the snippet/highlight
    * surface every code-search UI needs. Uses the same expansion rules
    * as [[hits]] for the given kind. */
  def highlight(kind: String, text: String, k: Int): DataFrame = {
    val entries = entriesFor(kind, text)
    val hitDocs = hits(kind, text, k).collect().map(_.docId)
    // entries are already driver-side: map termId → term in a narrow
    // projection instead of a dict join
    val termByTid = entries.map(e => e.termId -> e.term).toMap
    matchedPositions(entries, hitDocs)
      .map { case (d, tid, p) => (d, termByTid(tid), p) }
      .toDF("docId", "term", "pos")
  }

  /** Facet counts over ALL matching documents (not just top-k) — the
    * code-search sidebar: how many hits per lang / per repo. Matching =
    * the kind's own semantics (OR: any term; AND: all terms). The doc
    * set comes straight from the postings (termId pushdown, per-bucket
    * distinct-ish aggregation), then one hash aggregation against the
    * docmap — no scoring, no decode of positions, no top-k walk. */
  /** The query's full matching docId set under the KIND'S OWN predicate:
    * FREE/OR match any term, AND all terms, PREFIX/REGEX expand first —
    * decoded per posting list with docIds only (tf/position bytes skipped
    * by the cursor), no scoring walk. BOOL/PHRASE/NEAR route through the
    * compiled boolean presence walk (positional atoms verified), so facet
    * counts and match totals honor the full query semantics instead of
    * silently degrading to any-term. None = provably empty without a job.
    * Shared by facets and matchCount. */
  private def matchSet(kind: String, text: String): Option[DataFrame] = {
    if (kind == "BOOL" || kind == "PHRASE" || kind == "NEAR")
      return boolMatchSet(kind, text)
    if (kind == "ONEAR") {
      // ordered proximity isn't a boolean atom; its match set is the
      // ONEAR walk with k = bucketSize (the boolMatchSet trick: every
      // bucket holds ≤ bucketSize docs, so per-bucket "top-k" is the
      // complete match set) and scores discarded
      require(segment.params.positional,
        "proximity queries need a positional index (BuildParams.positional)")
      val ts = QueryParser.termsFor(kind, text)
      val entries = dictLookup(ts.distinct)
      if (entries.length < ts.length) return None
      val idfByTid = entries.map(e => e.termId -> BM25.idf(stats.numDocs, e.df)).toMap
      val byTerm = entries.map(e => e.term -> e.termId).toMap
      return Some(scoredRaw(entries.map(_.termId), idfByTid, stats.avgDocLen,
        conjunctive = true, k = segment.params.bucketSize.toInt,
        pruned = false, entries.length, phraseSlots = ts.map(byTerm),
        nearWindow = -QueryParser.orderedWindow(text))
        .toDF("docId", "score").select($"docId"))
    }
    val terms = QueryParser.termsFor(kind, text)
    val entries = entriesFor(kind, text) // ONE expansion dispatch, every caller
    val needAll = kind == "AND"
    if (entries.isEmpty || (needAll && entries.length < terms.distinct.length))
      return None
    val tids = entries.map(_.termId)
    val nTerms = entries.length
    val positional = segment.params.positional
    val matching = segment.postings
      .filter($"termId".isin(tids.toSeq: _*)).as[PostingList]
      .flatMap { pl =>
        val c = new graft.codec.PostingCodec.Cursor(
          pl.numDocs, pl.lastDocIds, pl.maxImpacts, pl.offsets, pl.bytes, positional)
        val out = new Array[Long](pl.numDocs)
        var i = 0
        while (i < pl.numDocs) { out(i) = c.docId; c.next(); i += 1 }
        out
      }
    Some(
      if (needAll)
        matching.groupByKey(identity).count()
          .filter(_._2 == nTerms.toLong).map(_._1).toDF("docId")
      else matching.distinct().toDF("docId"))
  }

  /** Full match set of a BOOL/PHRASE/NEAR query via the compiled
    * presence walk. PHRASE/NEAR normalize into the boolean grammar's
    * positional atoms (one Phrase/Near node), so all three kinds share
    * one evaluator. The walk runs topKBool with k = bucketSize — every
    * bucket holds ≤ bucketSize docs, so the per-bucket "top-k" IS the
    * bucket's complete match set (scores computed but discarded). */
  private def boolMatchSet(kind: String, text: String): Option[DataFrame] = {
    val ast: BoolQuery.Expr = kind match {
      case "PHRASE" =>
        QueryParser.termsFor("PHRASE", text).toList match {
          case Nil => return None
          case t :: Nil => BoolQuery.Term(t)
          case ts => BoolQuery.Phrase(ts)
        }
      case "NEAR" =>
        QueryParser.termsFor("NEAR", text).toList match {
          case Nil => return None
          case t :: Nil => BoolQuery.Term(t)
          case ts => BoolQuery.Near(ts, QueryParser.nearWindow(text))
        }
      case _ => BoolQuery.parse(text)
    }
    boolPlan(ast).map { plan =>
      require(!plan.matchesEmpty,
        s"pure-negative boolean query '$text' matches a corpus-sized " +
          "complement; add a positive requirement (a AND NOT x)")
      val entries = plan.entries
      // scores are discarded: idf 0 keeps the walk's heap insertion-only
      val zeroIdf: Map[Long, Double] = entries.map(_.termId -> 0.0).toMap
      val k = math.min(segment.params.bucketSize, Int.MaxValue.toLong).toInt
      scoredRaw(entries.map(_.termId), zeroIdf, stats.avgDocLen,
        conjunctive = false, k, pruned = false, entries.length,
        boolEval = plan.eval, boolPhrases = plan.phraseDefs,
        boolWins = plan.phraseWins)
        .map(_._1).toDF("docId")
    }
  }

  def facets(kind: String, text: String, facetCol: String): DataFrame =
    matchSet(kind, text) match {
      case None =>
        spark.emptyDataFrame
          .withColumn(facetCol, lit("")).withColumn("n_docs", lit(0L))
      case Some(docSet) =>
        docSet.join(segment.docs, "docId")
          .groupBy(col(facetCol))
          .agg(count(lit(1)).as("n_docs"))
    }

  /** Total matching documents — the "about N results" surface every
    * search UI shows. One distinct-count over the pushdown-filtered
    * decoded docIds; no scoring walk, no docmap join. */
  def matchCount(kind: String, text: String): Long =
    matchSet(kind, text).map(_.count()).getOrElse(0L)

  /** Total matching documents with a global cap — the Elasticsearch
    * `track_total_hits: N` / `terminate_after` surface ("more than N
    * results"). Returns min(true count, cap) EXACTLY: each bucket's
    * presence walk stops as soon as it has counted `cap` matches, and
    * min(Σ per-bucket capped counts, cap) = min(true count, cap) — if
    * any bucket hit its cap the sum already reached `cap`; otherwise
    * every bucket counted exactly. Early termination is genuine: work
    * per bucket is bounded by the cap, not the match-set size.
    *
    * Cheaper than [[matchCount]] even when the cap never binds: the
    * doc-at-a-time union walk dedupes in place, so there is no distinct
    * shuffle and no doclens join — the only exchange carries one Long
    * per touched bucket. Supports FREE/OR/AND and the full boolean
    * grammar (positional atoms included on positional segments). */
  def matchCountCapped(kind: String, text: String, cap: Long): Long = {
    require(cap >= 1L, s"cap must be >= 1, got $cap")
    val ast: BoolQuery.Expr = kind match {
      case "FREE" | "OR" | "AND" =>
        QueryParser.termsFor(kind, text).distinct.toList match {
          case Nil => return 0L
          case t :: Nil => BoolQuery.Term(t)
          case ts if kind == "AND" => BoolQuery.And(ts.map(BoolQuery.Term(_)))
          case ts => BoolQuery.Or(ts.map(BoolQuery.Term(_)))
        }
      case "BOOL" => BoolQuery.parse(text)
      case other => throw new IllegalArgumentException(
        s"matchCountCapped supports FREE/OR/AND/BOOL, got $other")
    }
    boolPlan(ast) match {
      case None => 0L
      case Some(plan) =>
        require(!plan.matchesEmpty,
          s"pure-negative boolean query '$text' matches a corpus-sized " +
            "complement; add a positive requirement (a AND NOT x)")
        val positional = segment.params.positional
        if (plan.phraseDefs != null)
          require(positional,
            "positional atoms need a positional index (BuildParams.positional)")
        val tids = plan.entries.map(_.termId)
        val eval = plan.eval
        val defs = plan.phraseDefs
        val wins = plan.phraseWins
        val capL = cap
        val total = segment.postings
          .filter($"termId".isin(tids.toSeq: _*)).as[PostingList]
          .groupByKey(_.bucket)
          .mapGroups { (_, plIt) =>
            val plByTid = plIt.map(pl => pl.termId -> pl).toMap
            val slots = tids.map(tid => plByTid.get(tid)
              .map(pl => new Wand.TermCursor(tid, 0.0, pl, positional)).orNull)
            Wand.countMatches(slots, eval, capL, defs, wins)
          }
          .toDF("c").agg(coalesce(sum($"c"), lit(0L))).as[Long].head()
        math.min(total, cap)
    }
  }

  /** Constant-score query (Lucene ConstantScoreQuery / the Elasticsearch
    * `constant_score` filter context): every matching document scores
    * exactly `boost` — matching is pure filtering, so there is no BM25,
    * no doclens join, and no per-doc float work at all. Results are the
    * FIRST k matches in docId order (the only deterministic order when
    * every score ties); the global top-k is a TakeOrderedAndProject over
    * the per-bucket match sets. Supports every kind [[matchCount]]
    * supports (FREE/OR/AND/PHRASE/NEAR/ONEAR/BOOL and pattern kinds). */
  /** Early-terminated retrieval over a SORT-BUILT index (X165 — the
    * consumer of Lucene `IndexSorting` / ES `index.sort`): the first
    * `k` matching docIds in docId order. Built with docIds assigned in
    * a chosen static-field order, first-k IS top-k by that sort — and
    * each bucket's walk STOPS after k matches (Wand.firstK), so
    * per-bucket work is bounded by k, not the match-set size; postings
    * past the k-th match are never decoded. Buckets run in parallel
    * (each emits ≤k docIds); the global answer is the k smallest via
    * TakeOrderedAndProject over ≤ k·buckets-touched rows. Kinds:
    * FREE/OR (any term), AND (all terms), pattern kinds through their
    * dictionary expansions. */
  def earlyHits(kind: String, text: String, k: Int): DataFrame = {
    require(k >= 1, s"earlyHits needs k >= 1, got $k")
    val allowed = Set("FREE", "OR", "AND", "PREFIX", "REGEX", "WILD")
    require(allowed.contains(kind),
      s"earlyHits supports ${allowed.mkString("/")}, got $kind")
    import spark.implicits._
    val terms = QueryParser.termsFor(kind, text)
    val entries = entriesFor(kind, text)
    val conj = kind == "AND"
    if (entries.isEmpty || (conj && entries.length < terms.distinct.length))
      return Seq.empty[Long].toDF("docId")
    val tids = entries.map(_.termId).sorted
    val positional = segment.params.positional
    val kL = k
    val pls = segment.postings
      .filter($"termId".isin(tids.map(Long.box): _*)).as[PostingList]
    pls.groupByKey(_.bucket)
      .flatMapGroups { (_, plIt) =>
        val plByTid = plIt.map(pl => pl.termId -> pl).toMap
        val slots = tids.map(tid => plByTid.get(tid)
          .map(pl => new Wand.TermCursor(tid, 0.0, pl, positional)).orNull)
        if (conj && slots.exists(_ == null)) Iterator.empty[Long]
        else {
          val eval: Array[Boolean] => Boolean =
            if (conj) p => { var i = 0; while (i < p.length && p(i)) i += 1; i == p.length }
            else p => { var i = 0; while (i < p.length && !p(i)) i += 1; i < p.length }
          Wand.firstK(slots, eval, kL).iterator
        }
      }
      .toDF("docId")
      .orderBy($"docId".asc).limit(k)
  }

  def constHits(kind: String, text: String, boost: Double, k: Int): DataFrame =
    matchSet(kind, text) match {
      case None =>
        import spark.implicits._
        Seq.empty[(Long, Double)].toDF("docId", "score")
      case Some(ds) =>
        ds.orderBy($"docId".asc).limit(k).withColumn("score", lit(boost))
    }

  /** Result collapsing (the field-collapse / diversified-results surface:
    * Elasticsearch `collapse`, Lucene grouping): the single best hit per
    * repo, for the `kRepos` best repos by their best hit. FREE/AND/OR.
    *
    * Plan, built for the 100 TB shape: the per-bucket walk scores ALL
    * matching docs (the facets/matchCount regime — an exhaustive walk
    * with per-bucket k = bucketSize, so nothing escapes the bucket), and
    * because the (repo,path,commit) build sort makes every repo a
    * CONTIGUOUS docId range (X7), each scored doc resolves to its repo
    * with a binary search over the broadcast repo-boundary array — so
    * the per-repo best is pre-combined MAP-SIDE by the typed reduce, and
    * the only exchange after the walk carries ≤ (repos touched) rows per
    * partition, never the match set. Best-per-repo compares ROUNDED
    * (6 dp) scores with docId-asc tie-break, so the selected doc is
    * bit-reproducible cross-engine; final order = (score desc, repo asc).
    *
    * The repo-boundary collect is #repos driver rows (16 B each) —
    * guarded by [[CollapseRepoLimit]], the dict-cache residency regime.
    */
  def collapsedHits(kind: String, text: String, kRepos: Int): DataFrame = {
    import spark.implicits._
    require(kind == "FREE" || kind == "OR" || kind == "AND",
      s"collapse supports FREE/OR/AND, got $kind")
    val empty = Seq.empty[(String, Long, Double)].toDF("repo", "docId", "score")
    val terms = QueryParser.termsFor(kind, text).distinct
    val entries = dictLookup(terms)
    if (entries.isEmpty || (kind == "AND" && entries.length < terms.length))
      return empty
    val bounds: Array[(Long, String)] = segment.docs
      .groupBy($"repo").agg(min($"docId").as("lo"))
      .orderBy($"lo").select($"lo", $"repo")
      .as[(Long, String)].collect()
    require(bounds.length <= Searcher.CollapseRepoLimit,
      s"collapse boundary array (${bounds.length} repos) exceeds " +
        s"${Searcher.CollapseRepoLimit} — shard the collapse by repo range")
    val los = bounds.map(_._1)
    val bc = spark.sparkContext.broadcast(los)
    val idfByTid: Map[Long, Double] =
      entries.map(e => e.termId -> BM25.idf(stats.numDocs, e.df)).toMap
    val best = scoredRaw(entries.map(_.termId), idfByTid, stats.avgDocLen,
      conjunctive = kind == "AND", k = segment.params.bucketSize.toInt,
      pruned = false, entries.length)
      .mapPartitions { it =>
        val l = bc.value
        it.map { case (docId, score) =>
          var a = 0; var b = l.length - 1
          while (a < b) { // last boundary <= docId
            val m = (a + b + 1) >>> 1
            if (l(m) <= docId) a = m else b = m - 1
          }
          (a, docId, Searcher.round6(score))
        }
      }
      .groupByKey(_._1)
      .reduceGroups { (x, y) =>
        if (x._3 > y._3) x
        else if (x._3 < y._3) y
        else if (x._2 < y._2) x else y
      }
      .map { case (idx, (_, docId, score)) => (bounds(idx)._2, docId, score) }
    best.toDF("repo", "docId", "score")
      .orderBy($"score".desc, $"repo".asc)
      .limit(kRepos)
  }

  /** Parent-child scored join (the Elasticsearch `has_child` query over
    * a join field / Lucene ToParentBlockJoinQuery): rank PARENTS (repos)
    * by an aggregate of their matching children's BM25 scores —
    * `score_mode` max | sum | avg — keeping only parents with at least
    * `minChildren` matching children. FREE/OR/AND child queries.
    *
    * Plan (the collapse regime, X27): the per-bucket walk scores ALL
    * matching children exhaustively; each child resolves to its parent
    * with a binary search over the broadcast repo-boundary array (repos
    * are contiguous docId ranges, X7), so per-parent partials
    * (sum, count, max) pre-combine MAP-SIDE and the only post-walk
    * exchange carries ≤ (parents touched) rows per partition — never
    * the match set. Determinism across parallelism: per-child scores
    * enter the aggregate as exact Long MICROS of the 6-dp rounded score
    * (Long sums are order-free, unlike Σ-of-doubles); `sum`/`max` are
    * one exact-integer-to-double division, `avg` = micros-mean rounded
    * to the nearest micro (floor(sm/n + 0.5), one IEEE division) — the
    * X63/X86 exact-integer regime applied to scores. */
  def hasChildHits(kind: String, text: String, scoreMode: String,
                   minChildren: Int, kRepos: Int): DataFrame = {
    import spark.implicits._
    require(Set("max", "sum", "avg")(scoreMode),
      s"score_mode must be max|sum|avg, got $scoreMode")
    require(minChildren >= 1, s"min_children must be >= 1, got $minChildren")
    require(kind == "FREE" || kind == "OR" || kind == "AND",
      s"has_child supports FREE/OR/AND, got $kind")
    val empty = Seq.empty[(String, Long, Double)]
      .toDF("repo", "n_children", "score")
    val terms = QueryParser.termsFor(kind, text).distinct
    val entries = dictLookup(terms)
    if (entries.isEmpty || (kind == "AND" && entries.length < terms.length))
      return empty
    val bounds: Array[(Long, String)] = segment.docs
      .groupBy($"repo").agg(min($"docId").as("lo"))
      .orderBy($"lo").select($"lo", $"repo")
      .as[(Long, String)].collect()
    require(bounds.length <= Searcher.CollapseRepoLimit,
      s"has_child boundary array (${bounds.length} repos) exceeds " +
        s"${Searcher.CollapseRepoLimit} — shard by repo range")
    val los = bounds.map(_._1)
    val bc = spark.sparkContext.broadcast(los)
    val idfByTid: Map[Long, Double] =
      entries.map(e => e.termId -> BM25.idf(stats.numDocs, e.df)).toMap
    val mode = scoreMode
    val perParent = scoredRaw(entries.map(_.termId), idfByTid, stats.avgDocLen,
      conjunctive = kind == "AND", k = segment.params.bucketSize.toInt,
      pruned = false, entries.length)
      .mapPartitions { it =>
        val l = bc.value
        it.map { case (docId, score) =>
          var a = 0; var b = l.length - 1
          while (a < b) { // last boundary <= docId
            val m = (a + b + 1) >>> 1
            if (l(m) <= docId) a = m else b = m - 1
          }
          (a, Math.round(Searcher.round6(score) * 1e6), 1L,
            Math.round(Searcher.round6(score) * 1e6))
        }
      }
      .groupByKey(_._1)
      .reduceGroups { (x, y) =>
        (x._1, x._2 + y._2, x._3 + y._3, math.max(x._4, y._4))
      }
      .map { case (idx, (_, sm, n, mx)) =>
        val score = mode match {
          case "max" => mx / 1e6
          case "sum" => sm / 1e6
          case "avg" => math.floor(sm.toDouble / n + 0.5) / 1e6
        }
        (bounds(idx)._2, n, score)
      }
    perParent.toDF("repo", "n_children", "score")
      .filter($"n_children" >= minChildren)
      .orderBy($"score".desc, $"repo".asc)
      .limit(kRepos)
  }

  /** Hits joined back to the doc map (SURVEY §2.4 Q9). The HITS side is
    * broadcast — it is ≤k rows by construction, while the docmap is
    * corpus-sized (10^12 rows at the design point): broadcasting the
    * docmap would OOM at scale. */
  def topDocs(kind: String, text: String, k: Int): DataFrame =
    broadcast(hits(kind, text, k))
      .join(segment.docs, Seq("docId"))
      .orderBy($"rank")
      .select($"rank", $"docId", $"score", $"repo", $"path", $"commit", $"lang")
}

object Searcher {
  /** Deterministic dictionary-expansion cap shared by every expansion
    * kind (prefix/regex/fuzzy) and every tier — ONE constant, so the
    * serving tier's bit-parity with the relational tier cannot drift
    * through a tuned copy. */
  final val MaxExpansion = 1024

  /** Fuzzy expansion core shared by the relational and serving tiers:
    * length band → banded Levenshtein DP → deterministic termId-order
    * cap. Empty operand expands to nothing. */
  def fuzzyExpand(vocab: Iterator[DictEntry], word: String, maxDist: Int,
                  cap: Int = MaxExpansion): Array[DictEntry] = {
    val w = word.trim.toLowerCase
    if (w.isEmpty) Array.empty
    else vocab.filter(e => math.abs(e.term.length - w.length) <= maxDist &&
        editDistance(e.term, w, maxDist) <= maxDist)
      .toArray.sortBy(_.termId).take(cap)
  }

  /** Collapse keeps a sorted repo-boundary Long array resident on the
    * driver and executors (8 B/repo) — 1M repos = 8 MB, the same
    * residency regime as [[Searcher.DictCacheLimit]]. */
  private[search] val CollapseRepoLimit = 1L << 20

  /** Spark's round(col, 6) (BigDecimal HALF_UP) as a JVM-side scalar, so
    * reductions that compare rounded scores agree bit-for-bit with the
    * relational/oracle rounding. */
  private[graft] def round6(x: Double): Double =
    BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** term-string weights → termId weights over the query's resolved
    * entries; null when no term deviates from 1.0 (the common case —
    * walks skip all weight lookups). */
  private[search] def toTidBoosts(entries: Array[DictEntry],
                                  m: Map[String, Double]): Map[Long, Double] =
    if (m.isEmpty) null
    else {
      val b = entries.flatMap(e => m.get(e.term).map(e.termId -> _)).toMap
      if (b.isEmpty) null else b
    }

  /** Effective per-term weights of a boolean query: the grammar's fixed-
    * term maxima combined with each boosted Pattern leaf's weight applied
    * to ITS per-segment expansion (max across mentions, unboosted = 1.0). */
  private[search] def boolTermBoosts(ast: BoolQuery.Expr,
                                     patEntries: Map[BoolQuery.Pattern, Array[DictEntry]])
      : Map[String, Double] = {
    val (tm, pm) = BoolQuery.boostMaps(ast)
    if (pm.isEmpty) return tm
    val eff = scala.collection.mutable.Map.empty[String, Double] ++ tm
    patEntries.foreach { case (p, es) =>
      val w = pm.getOrElse(p, 1.0)
      es.foreach(e => eff(e.term) = math.max(eff.getOrElse(e.term, 1.0), w))
    }
    eff.filter(_._2 != 1.0).toMap
  }

  /** Plain Levenshtein distance (unit insert/delete/substitute — the
    * same metric as DuckDB's `levenshtein`, keeping the suggest oracle
    * exact), with an early exit once every cell of a row exceeds
    * `bound` (banded DP: O(|a|·|b|) worst case, O(bound·|a|) typical). */
  def editDistance(a: String, b: String, bound: Int): Int = {
    if (a == b) return 0
    if (math.abs(a.length - b.length) > bound) return bound + 1
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var rowMin = i
      var j = 1
      while (j <= b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        if (cur(j) < rowMin) rowMin = cur(j)
        j += 1
      }
      if (rowMin > bound) return bound + 1
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length)
  }
}

/** Exact relational BM25 scorer — SURVEY §2.4 Q6: the no-pruning oracle
  * path, computed from DECODED postings (so it also exercises the codec
  * round-trip), the dictionary, and doc lengths. Per-doc accumulation is
  * done in a typed mapGroups in ascending termId order so scores are
  * bit-identical with the WAND path (rank-identity contract).
  */
object ExactScorer {

  /** Decode all posting lists back to (termId, docId, tf) rows. */
  def decodedPostings(spark: SparkSession, segment: Segment): Dataset[(Long, Long, Int)] = {
    import spark.implicits._
    val positional = segment.params.positional
    segment.postings.as[PostingList].flatMap { pl =>
      val c = new graft.codec.PostingCodec.Cursor(
        pl.numDocs, pl.lastDocIds, pl.maxImpacts, pl.offsets, pl.bytes, positional)
      val out = new Array[(Long, Long, Int)](pl.numDocs)
      var i = 0
      while (i < pl.numDocs) { out(i) = (pl.termId, c.docId, c.tf); c.next(); i += 1 }
      out.toSeq
    }
  }

  /** Decode positional posting lists back to (termId, docId, tf,
    * positions) rows — the merge path for positional segments. */
  def decodedPostingsPos(spark: SparkSession, segment: Segment)
      : Dataset[(Long, Long, Int, Array[Int])] = {
    import spark.implicits._
    require(segment.params.positional, "segment is not positional")
    segment.postings.as[PostingList].flatMap { pl =>
      val c = new graft.codec.PostingCodec.Cursor(
        pl.numDocs, pl.lastDocIds, pl.maxImpacts, pl.offsets, pl.bytes,
        positional = true)
      val out = new Array[(Long, Long, Int, Array[Int])](pl.numDocs)
      var i = 0
      while (i < pl.numDocs) {
        out(i) = (pl.termId, c.docId, c.tf, c.positions()); c.next(); i += 1
      }
      out.toSeq
    }
  }

  /** Top-k by exact scoring of every matching document. */
  def topK(spark: SparkSession, segment: Segment, text: String, kind: String,
           k: Int, qid: Long = 0L): Dataset[Hit] = {
    import spark.implicits._
    val terms = QueryParser.termsFor(kind, text)
    val searcher = new Searcher(spark, segment)
    val entries = searcher.dictLookup(terms)
    val conjunctive = kind == "AND"
    if (entries.isEmpty || (conjunctive && entries.length < terms.length))
      return spark.emptyDataset[Hit]
    val idfByTid = entries.map(e => e.termId -> BM25.idf(segment.stats.numDocs, e.df)).toMap
    val tidSet = entries.map(_.termId).toSet
    val nTerms = entries.length
    val avgdl = segment.stats.avgDocLen

    val dl = segment.docs.select($"docId", $"docLen")
    val matches = decodedPostings(spark, segment)
      .filter(r => tidSet.contains(r._1))
      .toDF("termId", "docId", "tf")
      .join(dl, Seq("docId"))
      .select($"docId", $"termId", $"tf", $"docLen")
      .as[(Long, Long, Int, Int)]

    val scoredDocs = matches.groupByKey(_._1).mapGroups { (docId, it) =>
      val rows = it.toArray.sortBy(_._2) // ascending termId — determinism
      var score = 0.0
      var i = 0
      while (i < rows.length) {
        score += BM25.impact(idfByTid(rows(i)._2), rows(i)._3, rows(i)._4, avgdl)
        i += 1
      }
      (docId, score, rows.length)
    }
    val filtered =
      if (conjunctive) scoredDocs.filter(_._3 == nTerms) else scoredDocs
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy($"score".desc, $"docId".asc)
    filtered.toDF("docId", "score", "n")
      .orderBy($"score".desc, $"docId".asc)
      .limit(k)
      .withColumn("rank", row_number().over(w))
      .select(lit(qid).as("qid"), $"rank", $"docId", $"score")
      .as[Hit]
  }
}
