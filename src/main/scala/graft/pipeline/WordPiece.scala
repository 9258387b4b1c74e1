package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece tokenization, APPLY side (X175 — Wu et al. 2016 §4.1 /
  * Schuster & Nakajima 2012; the greedy longest-match-first algorithm
  * HuggingFace fast tokenizers run at inference): each word is split
  * into the longest vocabulary piece at each position, continuation
  * pieces carry the `##` prefix, and a word with no match at some
  * position collapses to `[UNK]` — completing the subword family next
  * to the BPE (X60) and unigram-LM (X146) TRAINERS, because apply-time
  * throughput (not training) is what a 100 TB token-count pass runs.
  *
  * The vocabulary here is derived deterministically from the corpus
  * dictionary (top `vocabTerms` whole words by (cf desc, term asc) +
  * every single character of those words in both word-initial and
  * `##` continuation form), so the operator is self-contained and
  * reproducible; a production run would pass a trained vocab file.
  *
  * Scale: the vocab is a driver-side Set (dictionary-residency regime)
  * shipped to executors via `SparkContext.broadcast` — torrent-
  * distributed once per executor, not re-serialized into every task
  * closure; tokenization is one narrow
  * pass, zero shuffles before the count agg. Greedy matching is O(L²)
  * per word in the worst case with L ≤ 64 capped — the standard
  * WordPiece bound. No SQL twin: longest-match-first is an iterative
  * per-position loop (the BPE-apply argument) — gated by the golden
  * fixture + property tests in WordPieceSpec and a rows-only driver
  * row.
  */
object WordPiece {

  final val Unk = "[UNK]"
  private final val MaxWordLen = 64

  /** Greedy longest-match-first split of one word against the vocab;
    * `cont` holds the continuation (`##`-stripped) pieces. */
  def tokenizeWord(word: String, initial: Set[String],
                   cont: Set[String]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    if (word.length > MaxWordLen) return Seq(Unk)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < word.length) {
      val table = if (start == 0) initial else cont
      var end = word.length
      var hit: String = null
      while (end > start && hit == null) {
        val piece = word.substring(start, end)
        if (table.contains(piece)) hit = piece
        else end -= 1
      }
      if (hit == null) return Seq(Unk)
      out += (if (start == 0) hit else "##" + hit)
      start = end
    }
    out.toSeq
  }

  /** Deterministic corpus-derived vocab: top `vocabTerms` whole words
    * by (count desc, term asc) over the whitespace/len≥2 convention,
    * plus every character of every corpus word in both forms (so
    * tokenization only yields [UNK] for words with characters never
    * seen whole-corpus — the standard char-fallback vocab shape). */
  def deriveVocab(docs: DataFrame, vocabTerms: Int): (Set[String], Set[String]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
    val top = words.groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc).limit(vocabTerms)
      .select("w").as[String].collect().toSet
    val chars = words.select(explode(split(col("w"), "")).as("c"))
      .filter(length(col("c")) === 1)
      .distinct().as[String].collect().toSet
    (top ++ chars, top ++ chars) // same table both positions here
  }

  /** Per-piece corpus counts under the derived vocab: (piece, n),
    * descending with term tie-break. */
  def pieceCounts(docs: DataFrame, vocabTerms: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (initial, cont) = deriveVocab(docs, vocabTerms)
    val bc = spark.sparkContext.broadcast((initial, cont))
    docs.select(col("text").cast("string")).as[String]
      .flatMap(t => t.split(" ").iterator
        .filter(_.length >= 2)
        .flatMap(w => tokenizeWord(w, bc.value._1, bc.value._2)))
      .toDF("piece")
      .groupBy("piece").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("piece").asc)
  }
}
