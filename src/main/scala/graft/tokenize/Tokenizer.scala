package graft.tokenize

import scala.collection.mutable.ArrayBuffer

/** Code-aware tokenizer — the single tokenization function shared by the
  * index build, the query parser, and the SQL-twin UDF.
  *
  * Spec pinned in FIXTURES.md §A "Tokenizer spec" (OPEN-ITEM #1 of
  * SURVEY.md §2.2 P6 — the reference tree was empty at survey time, see
  * SURVEY.md §0, so these rules are frozen here rather than cited):
  *
  *   1. Split content on any char not in [A-Za-z0-9_].
  *   2. Split each piece on '_', on lower→Upper camelCase boundaries, on
  *      UPPER-run→Upper+lower boundaries (XMLHttp → XML|Http), and on
  *      letter↔digit boundaries; emit the split parts only.
  *   3. Lowercase; drop tokens of length < 2 or > 64; drop pure numbers.
  *
  * Pure Scala, zero Spark deps — unit-testable without a SparkSession and
  * callable from a `flatMap` lambda or a UDF without serialization traps
  * (it is a top-level object, so closures capture nothing).
  */
object Tokenizer extends Serializable {

  final val MinLen = 2
  final val MaxLen = 64

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  @inline private def isUpper(c: Char): Boolean = c >= 'A' && c <= 'Z'
  @inline private def isLower(c: Char): Boolean = c >= 'a' && c <= 'z'
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** Tokenize one document (or query) into terms, in order of occurrence. */
  def tokenize(content: String): Array[String] = tokenizeImpl(content, filtered = true)

  /** Same boundary splitting as [[tokenize]] but WITHOUT the length /
    * pure-number filters — for normalizing query operands (e.g. a PREFIX
    * pattern) into the dictionary's piece space, where even a 1-char or
    * numeric final piece is a legitimate prefix. */
  def tokenizeUnfiltered(content: String): Array[String] =
    tokenizeImpl(content, filtered = false)

  private def tokenizeImpl(content: String, filtered: Boolean): Array[String] = {
    if (content == null || content.isEmpty) return Array.empty
    val out = new ArrayBuffer[String](content.length / 6 + 4)
    val n = content.length
    var i = 0
    while (i < n) {
      // skip separators
      while (i < n && !isWordChar(content.charAt(i))) i += 1
      val start = i
      while (i < n && isWordChar(content.charAt(i))) i += 1
      if (i > start) splitPiece(content, start, i, out, filtered)
    }
    out.toArray
  }

  /** Split one [A-Za-z0-9_]+ piece on '_', camel, and letter↔digit
    * boundaries; lowercase + filter + append to `out`. */
  private def splitPiece(s: String, from: Int, until: Int,
                         out: ArrayBuffer[String],
                         filtered: Boolean = true): Unit = {
    var segStart = from
    var j = from
    while (j <= until) {
      val boundary =
        if (j == until) true
        else {
          val c = s.charAt(j)
          if (c == '_') true
          else if (j > segStart) {
            val p = s.charAt(j - 1)
            // lower→Upper (parseHttp → parse|Http)
            (isLower(p) && isUpper(c)) ||
            // UPPER-run → Upper+lower (XMLHttp → XML|Http): boundary
            // BEFORE the last upper of a run when followed by lower
            (isUpper(p) && isUpper(c) && j + 1 < until && isLower(s.charAt(j + 1))) ||
            // letter↔digit both directions (request2 → request|2)
            (isDigit(p) != isDigit(c))
          } else false
        }
      if (boundary) {
        if (j > segStart) emit(s, segStart, j, out, filtered)
        segStart = if (j < until && s.charAt(j) == '_') j + 1 else j
      }
      j += 1
    }
  }

  private def emit(s: String, from: Int, until: Int,
                   out: ArrayBuffer[String], filtered: Boolean = true): Unit = {
    val len = until - from
    if (filtered) {
      if (len < MinLen || len > MaxLen) return
      var allDigit = true
      var k = from
      while (k < until && allDigit) { if (!isDigit(s.charAt(k))) allDigit = false; k += 1 }
      if (allDigit) return
    }
    // lowercase without Locale surprises: ASCII-only input by construction
    val arr = new Array[Char](len)
    var m = 0
    while (m < len) {
      val c = s.charAt(from + m)
      arr(m) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      m += 1
    }
    out += new String(arr)
  }

  /** Distinct terms of a query string, sorted — the query-side twin. */
  def queryTerms(text: String): Array[String] =
    tokenize(text).distinct.sorted
}
