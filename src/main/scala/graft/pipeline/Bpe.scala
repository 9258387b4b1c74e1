package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tokenize.Tokenizer

/** Byte-pair-encoding vocabulary trainer — Sennrich, Haddow & Birch,
  * ACL'16 ("Neural Machine Translation of Rare Words with Subword
  * Units"), in the word-frequency-table formulation every production
  * trainer uses (subword-nmt, HuggingFace tokenizers, SentencePiece's
  * BPE mode): merges are a function of WORD COUNTS, not of the corpus
  * stream, so the corpus contributes exactly one aggregation.
  *
  * Scale shape: ONE corpus-scale shuffle (word → count over the
  * indexer's own token stream); the merge loop then iterates on the
  * capped frequency table driver-side — vocabulary-sized (the dict
  * residency regime), never corpus-sized. m merges over V words of
  * mean length L cost O(m · V · L) driver work with zero further jobs.
  *
  * Determinism contract: candidate words are the top `vocabCap` by
  * (count desc, word asc); each round merges the most frequent symbol
  * pair, ties resolved by (left asc, right asc); `EndOfWord` marks word
  * ends so merges never cross word boundaries. */
object Bpe {

  final val EndOfWord = "</w>"

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** (word, cnt) over the indexer's token stream — the one
    * corpus-scale aggregation. */
  def wordCounts(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("text").cast("string")).as[String]
      .flatMap(t => Tokenizer.tokenize(t))
      .groupByKey(identity).count()
      .toDF("word", "cnt")
  }

  /** The merge sequence learned from a word-frequency table (pure
    * Scala — unit-testable without a session). */
  def train(counts: Array[(String, Long)], numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    // symbol sequences per word, weighted by count
    var words: Array[(Array[String], Long)] = counts.map { case (w, c) =>
      (w.map(_.toString).toArray :+ EndOfWord, c)
    }
    val out = Vector.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val ((l, r), c) = pairCounts.minBy { case ((a, b), n) => (-n, a, b) }
        out += Merge(rank, l, r, c)
        val merged = l + r
        words = words.map { case (syms, cnt) =>
          if (syms.length < 2) (syms, cnt)
          else {
            val b = Array.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                b += merged; i += 2
              } else { b += syms(i); i += 1 }
            }
            (b.result(), cnt)
          }
        }
        rank += 1
      }
    }
    out.result()
  }

  /** Train over a corpus: word counts (one shuffle), cap the candidate
    * table deterministically, learn `numMerges` merges driver-side. */
  def trainOn(spark: SparkSession, docs: DataFrame, numMerges: Int,
              vocabCap: Int = 1 << 16): DataFrame = {
    import spark.implicits._
    val counts = wordCounts(docs)
      .orderBy(col("cnt").desc, col("word").asc).limit(vocabCap)
      .as[(String, Long)].collect()
    train(counts, numMerges)
      .map(m => (m.rank, m.left, m.right, m.count))
      .toDF("rank", "left", "right", "cnt")
  }

  /** Segment one word with a learned merge sequence (greedy
    * lowest-rank-first, the reference decoder): repeatedly apply the
    * best-ranked applicable merge until none applies. */
  def encode(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray :+ EndOfWord
    var improved = true
    while (improved && syms.length > 1) {
      var best = Int.MaxValue
      var at = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; at = i }
        i += 1
      }
      if (at < 0) improved = false
      else {
        syms = (syms.take(at) :+ (syms(at) + syms(at + 1))) ++ syms.drop(at + 2)
      }
    }
    syms
  }

  /** Per-doc token counts under a learned BPE vocabulary — the budget
    * number a training pipeline plans with. The merge table broadcasts
    * (vocabulary-sized); the count is one narrow pass with a per-doc
    * word→length memo (Zipf makes the memo hit rate high). */
  def tokenCounts(spark: SparkSession, docs: DataFrame,
                  merges: DataFrame): DataFrame = {
    import spark.implicits._
    val ranks: Map[(String, String), Int] = merges
      .select(col("left"), col("right"), col("rank")).as[(String, String, Int)]
      .collect().map { case (l, r, k) => (l, r) -> k }.toMap
    val ranksB = spark.sparkContext.broadcast(ranks)
    docs.select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val rk = ranksB.value
        val memo = scala.collection.mutable.HashMap.empty[String, Int]
        var n = 0L
        Tokenizer.tokenize(text).foreach { w =>
          n += memo.getOrElseUpdate(w, encode(w, rk).length)
        }
        (id, n)
      }
      .toDF("doc_id", "n_bpe_tokens")
  }
}
