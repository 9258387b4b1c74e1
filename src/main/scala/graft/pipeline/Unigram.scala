package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tokenize.Tokenizer

/** Unigram-LM subword vocabulary trainer — Kudo, ACL'18 ("Subword
  * Regularization"; SentencePiece's `unigram` mode) in the same
  * word-frequency-table formulation as [[Bpe]]: the corpus contributes
  * exactly ONE aggregation (word → count), and training iterates on
  * the capped, vocabulary-sized table driver-side.
  *
  * This is the HARD-EM (Viterbi-EM) variant: the E-step counts pieces
  * along each word's single best segmentation rather than
  * forward-backward expectations. Chosen deliberately — it keeps every
  * quantity an exact Long count (no per-path float accumulation whose
  * summation order could differ across runs), so the trained
  * vocabulary is bit-reproducible under any parallelism; Viterbi-EM
  * monotonically improves the Viterbi likelihood it optimizes
  * (asserted in UnigramSpec).
  *
  * Determinism contract:
  *  - seed = every substring of a candidate word up to `maxPieceLen`
  *    chars, scored by Σ word-count, kept top `seedSize` by
  *    (score desc, piece asc); single characters are ALWAYS in the
  *    vocabulary (full coverage — any word segments);
  *  - Viterbi ties break toward the LONGER piece ending at each
  *    position (strict-improvement DP scanning piece length
  *    descending), a pinned rule, not an accident of iteration order;
  *  - pruning keeps the top `vocabSize` pieces by
  *    (Viterbi count desc, piece asc), single chars exempt.
  *
  * Scale shape: one corpus-scale shuffle ([[Bpe.wordCounts]]), then
  * O(rounds · V · L · maxPieceLen) driver work on the capped word
  * table — the dictionary-residency regime, never corpus-sized.
  * Segmenting a corpus under the trained vocabulary broadcasts the
  * piece table and runs one narrow pass ([[tokenCounts]]). */
object Unigram {

  /** Best (max log-prob) segmentation of `word` under piece log-probs
    * `logp`; ties prefer the longer piece at each boundary. Words with
    * un-covered characters fall back to per-char pieces for the gap
    * (logp floor), so segmentation is total. */
  def viterbi(word: String, logp: collection.Map[String, Double],
              maxPieceLen: Int, floor: Double = -1e9): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var end = 1
    while (end <= n) {
      // length DESC + strict > ⇒ the longest piece wins score ties
      var len = math.min(maxPieceLen, end)
      while (len >= 1) {
        val start = end - len
        if (best(start) > Double.NegativeInfinity) {
          val piece = word.substring(start, end)
          val lp = logp.get(piece) match {
            case Some(v) => v
            case None => if (len == 1) floor else Double.NegativeInfinity
          }
          if (lp > Double.NegativeInfinity) {
            val s = best(start) + lp
            if (s > best(end)) { best(end) = s; back(end) = start }
          }
        }
        len -= 1
      }
      end += 1
    }
    // walk back
    var pos = n
    val rev = scala.collection.mutable.ArrayBuffer.empty[String]
    while (pos > 0) { val s = back(pos); rev += word.substring(s, pos); pos = s }
    rev.reverseIterator.toArray
  }

  /** One E-step: exact Long Viterbi counts of every piece over the
    * weighted word table. */
  private def viterbiCounts(words: Array[(String, Long)],
      logp: collection.Map[String, Double], maxPieceLen: Int)
      : scala.collection.mutable.LinkedHashMap[String, Long] = {
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    words.foreach { case (w, c) =>
      viterbi(w, logp, maxPieceLen).foreach { p =>
        counts(p) = counts.getOrElse(p, 0L) + c
      }
    }
    counts
  }

  private def toLogProbs(counts: scala.collection.Map[String, Long])
      : Map[String, Double] = {
    val total = counts.valuesIterator.sum.toDouble
    counts.iterator.map { case (p, c) =>
      p -> (math.log(c.toDouble) - math.log(total))
    }.toMap
  }

  /** Train from a word-frequency table (pure Scala — unit-testable
    * without a session). Returns (piece, viterbi count, logProb)
    * sorted (count desc, piece asc), logProb from the FINAL count
    * normalization. */
  def train(counts: Array[(String, Long)], vocabSize: Int,
            maxPieceLen: Int = 8, seedSize: Int = 1 << 14,
            emIters: Int = 2): Array[(String, Long, Double)] = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(emIters >= 1, s"emIters must be >= 1, got $emIters")
    // ── seed: substring counts, single chars exempt from the cap ──
    val sub = scala.collection.mutable.HashMap.empty[String, Long]
    counts.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var j = i + 1
        val jMax = math.min(i + maxPieceLen, w.length)
        while (j <= jMax) {
          val p = w.substring(i, j)
          sub(p) = sub.getOrElse(p, 0L) + c
          j += 1
        }
        i += 1
      }
    }
    val (chars, multi) = sub.partition(_._1.length == 1)
    val seeded: Map[String, Long] = chars.toMap ++
      multi.toSeq.sortBy { case (p, c) => (-c, p) }.take(seedSize)
    var logp = toLogProbs(seeded)

    // ── EM on the seed, prune once to vocabSize, EM again ──
    def em(rounds: Int): scala.collection.mutable.LinkedHashMap[String, Long] = {
      var last = viterbiCounts(counts, logp, maxPieceLen)
      var r = 1
      while (r < rounds) {
        logp = toLogProbs(last)
        last = viterbiCounts(counts, logp, maxPieceLen)
        r += 1
      }
      last
    }
    val afterSeedEm = em(emIters)
    val (cs, ms) = afterSeedEm.partition(_._1.length == 1)
    val kept = cs.toMap ++
      ms.toSeq.sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, vocabSize - cs.size))
    logp = toLogProbs(kept)
    val finalCounts = viterbiCounts(counts, logp, maxPieceLen)
      .filter { case (p, _) => kept.contains(p) }
    val total = finalCounts.valuesIterator.sum.toDouble
    finalCounts.toSeq
      .sortBy { case (p, c) => (-c, p) }
      .map { case (p, c) =>
        (p, c, math.log(c.toDouble) - math.log(total))
      }
      .toArray
  }

  /** Train over a corpus: word counts (ONE shuffle), deterministic cap,
    * driver-side EM. Output (piece, cnt, logprob) — logprob rounded at
    * the boundary by the explicit half-up rule. */
  def trainOn(spark: SparkSession, docs: DataFrame, vocabSize: Int,
              maxPieceLen: Int = 8, wordCap: Int = 1 << 16): DataFrame = {
    import spark.implicits._
    val counts = Bpe.wordCounts(docs)
      .orderBy(col("cnt").desc, col("word").asc).limit(wordCap)
      .as[(String, Long)].collect()
    train(counts, vocabSize, maxPieceLen)
      .map { case (p, c, lp) =>
        (p, c, math.floor(lp * 1e6 + 0.5) / 1e6)
      }
      .toSeq.toDF("piece", "cnt", "logprob")
  }

  /** Per-doc token counts under a trained unigram vocabulary — the
    * budget number, mirroring [[Bpe.tokenCounts]]: broadcast piece
    * table, one narrow pass, per-doc word→length memo. */
  def tokenCounts(spark: SparkSession, docs: DataFrame, vocab: DataFrame,
                  maxPieceLen: Int = 8): DataFrame = {
    import spark.implicits._
    val logp: Map[String, Double] = vocab
      .select(col("piece"), col("logprob")).as[(String, Double)]
      .collect().toMap
    val lpB = spark.sparkContext.broadcast(logp)
    docs.select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val lp = lpB.value
        val memo = scala.collection.mutable.HashMap.empty[String, Int]
        var n = 0L
        Tokenizer.tokenize(text).foreach { w =>
          n += memo.getOrElseUpdate(w, viterbi(w, lp, maxPieceLen).length)
        }
        (id, n)
      }
      .toDF("doc_id", "n_unigram_tokens")
  }
}
