package graft.search

import graft.model.DictEntry

/** Minimal plural stemmer — the "S-stemmer" (Harman, "How Effective Is
  * Suffixing?", JASIS 42(1), 1991): three ordered suffix rules, first
  * match wins, each guarded so the suffix never consumes the whole word:
  *
  *   1. `*ies → *y`  unless the word ends `eies`/`aies`
  *   2. `*es  → *e`  unless it ends `aes`/`ees`/`oes`
  *   3. `*s   → *`   unless it ends `us`/`ss`
  *
  * Chosen over Porter DELIBERATELY: these rules are expressible as ONE
  * SQL CASE expression, so the DuckDB oracle stems with semantics
  * IDENTICAL to the engine (Porter's measure-based conditions m > 0/1
  * have no portable SQL form) — the same portability rule that picked
  * tf/df over tf·idf for MLT selection and md5 over murmur3 for
  * sampling. Harman's finding (S ≈ Porter for retrieval effectiveness)
  * is what makes the trade safe.
  *
  * Query kind STEM (`stem:word` or an explicit kind): the operand stems
  * once, the VOCABULARY is scanned for terms with the same stem (the
  * FUZZY/PREFIX/REGEX expansion discipline — dictionary-sized, never
  * corpus-sized, deterministic ≤MaxExpansion cap in termId order), and
  * the expansion runs as the ordinary OR WAND walk with each term's own
  * statistics. The index itself stays UNSTEMMED — stemming is query-time
  * expansion, so one index serves stemmed and exact queries alike (the
  * Lucene multi-analyzer posture without a second field).
  */
object Stem {

  /** The S-stem of a lowercase token. Total, deterministic, and
    * mirrored verbatim by the oracle's SQL CASE. */
  def sStem(w: String): String = {
    val n = w.length
    if (n > 3 && w.endsWith("ies") && !w.endsWith("eies") && !w.endsWith("aies"))
      w.substring(0, n - 3) + "y"
    else if (n > 2 && w.endsWith("es") && !w.endsWith("aes") &&
      !w.endsWith("ees") && !w.endsWith("oes"))
      w.substring(0, n - 1)
    else if (n > 1 && w.endsWith("s") && !w.endsWith("us") && !w.endsWith("ss"))
      w.substring(0, n - 1)
    else w
  }

  /** Vocabulary expansion: every dictionary term whose S-stem equals the
    * operand's, capped deterministically in termId order — the shared
    * core both tiers call so bit-parity cannot drift through a copy. */
  def expand(vocab: Iterator[DictEntry], word: String,
             maxExpansion: Int = Searcher.MaxExpansion): Array[DictEntry] = {
    val w = word.trim.toLowerCase
    if (w.isEmpty) return Array.empty
    val target = sStem(w)
    vocab.filter(e => sStem(e.term) == target).toArray
      .sortBy(_.termId).take(maxExpansion)
  }
}
