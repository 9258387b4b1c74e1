package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators over a (doc_id, text) table: quality scoring,
  * language-ID heuristic, token counting, and document fingerprinting.
  *
  * Everything here is built from `org.apache.spark.sql.functions` only —
  * no UDFs — so the whole layer stays inside whole-stage codegen, and
  * every rule has an exactly-equivalent ANSI-SQL twin for the DuckDB
  * oracle (SparkEntry.oracleSql). Doubles are rounded at the output
  * boundary so cross-engine float summation order cannot flip a hash.
  */
object TextStats {

  /** Pinned stopword list (shared with the SQL twins verbatim). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to", "is")

  /** Language-marker words per language, checked in fixed priority order
    * (en, de, fr) — ties resolve to the earlier language. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"))

  private def words = split(col("text"), " ")

  private def countIn(markers: Seq[String]) = {
    val arr = array(markers.map(lit): _*)
    size(filter(words, w => array_contains(arr, w)))
  }

  /** Quality scoring: token counts, type/token ratio, mean word length,
    * stopword ratio, and a pinned composite score. */
  def quality(docs: DataFrame): DataFrame = {
    val nTokens = size(words)
    val nTypes = size(array_distinct(words))
    val avgLen = (length(col("text")) - nTokens + 1).cast("double") / nTokens
    val stopRatio = countIn(Stopwords).cast("double") / nTokens
    docs.select(
      col("doc_id"),
      nTokens.cast("long").as("n_tokens"),
      nTypes.cast("long").as("n_types"),
      round(avgLen, 6).as("avg_word_len"),
      round(nTypes.cast("double") / nTokens, 6).as("ttr"),
      round(stopRatio, 6).as("stop_ratio"),
      // composite: reward mid-length docs and lexical diversity,
      // penalize stopword stuffing (pinned formula, shared with SQL twin)
      round(least(nTokens.cast("double") / lit(100.0), lit(1.0)) *
        (nTypes.cast("double") / nTokens) * (lit(1.0) - stopRatio), 6)
        .as("quality"))
  }

  /** Marker-count language ID. Deterministic argmax: higher count wins,
    * earlier language in LangMarkers wins ties. */
  def langId(docs: DataFrame): DataFrame = {
    val counts = LangMarkers.map { case (l, ms) => l -> countIn(ms) }
    // fold: start from last language, replace when an earlier one has >= count
    val guess = counts.reverse.tail.foldLeft(
      (lit(counts.last._1), counts.last._2)) { case ((gLang, gCnt), (l, c)) =>
      (when(c >= gCnt, lit(l)).otherwise(gLang), when(c >= gCnt, c).otherwise(gCnt))
    }
    docs.select(col("doc_id"),
      counts.head._2.cast("long").as("en_hits"),
      guess._1.as("lang_guess"),
      (guess._1 === col("lang")).as("agrees"))
  }

  /** Whitespace tokens vs BPE-ish regex tokens ([a-z]+ runs — the regex
    * is RE2-compatible so DuckDB computes the identical count). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(words).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).cast("long").as("alpha_tokens"),
      (length(col("text")) - length(regexp_replace(col("text"), "[aeiou]", "")))
        .cast("long").as("n_vowels"))

  /** Document fingerprint: one-permutation MinHash — the minimum over
    * words of a 60-bit integer derived from md5(word). Portable: DuckDB
    * computes the identical value from the same hex digest. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      array_min(transform(words,
        w => conv(substring(md5(w), 1, 15), 16, 10).cast("long")))
        .as("min_word_hash"),
      sha2(col("text"), 256).as("text_sha"))

  /** The 48-bit md5-portable hash of a k-word shingle — shared by the
    * Spark and brute-force winnow paths (DuckDB computes the identical
    * value from the identical hex). */
  def gramHash(gram: String): Long = PortableHash.md5HexPrefixLong(gram, 12)

  /** Winnowing fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD 2003 —
    * the MOSS algorithm): hash every k-word shingle, slide a window of
    * `w` consecutive hashes, and select each window's MINIMUM hash
    * (rightmost occurrence on ties — the paper's robust-winnowing rule);
    * the distinct selected (position, hash) pairs are the document's
    * fingerprints. Guarantees at least one fingerprint per w-gram run,
    * so any shared substring of k+w−1 words is always detected — the
    * position-aware complement of the one-permutation [[fingerprint]].
    *
    * A document shorter than one full window (fewer than w grams, but at
    * least one) yields the min over all its grams. Positions are 1-based
    * gram indices.
    *
    * Scale posture: a doc's text is ONE row, so gram hashing and the
    * window sweep run inside a single narrow pass (per-doc local arrays,
    * no window shuffle, no explode before selection); output is
    * fingerprint-sized (≈ 2/(w+1) of gram count in expectation). The
    * hash is md5-portable, so the DuckDB twin is exact. */
  def winnow(docs: DataFrame, k: Int = 4, w: Int = 5): DataFrame = {
    require(k >= 1 && w >= 1, "winnow needs k >= 1, w >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val fp = udf { text: String =>
      val ws = Option(text).getOrElse("").split(" ", -1)
      val n = ws.length - k + 1
      if (ws.length == 1 && ws(0).isEmpty) Array.empty[(Long, Long)]
      else if (n < 1) Array.empty[(Long, Long)]
      else {
        val h = Array.tabulate(n)(i => gramHash(ws.slice(i, i + k).mkString(" ")))
        val out = scala.collection.mutable.LinkedHashSet.empty[(Long, Long)]
        val lastStart = math.max(0, n - w)
        var s = 0
        while (s <= lastStart) {
          var best = s
          var j = s + 1
          val end = math.min(s + w, n)
          while (j < end) { if (h(j) <= h(best)) best = j; j += 1 }
          out += (((best + 1).toLong, h(best)))
          s += 1
        }
        out.toArray
      }
    }
    // per-doc distinctness is enforced by the LinkedHashSet inside the
    // pass — no corpus-scale distinct() shuffle is needed after explode
    docs.select(col("doc_id"), explode(fp(col("text"))).as("f"))
      .select(col("doc_id"), col("f._1").as("pos"), col("f._2").as("h"))
  }
}
