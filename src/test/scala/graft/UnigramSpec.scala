package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Unigram

/** Unigram-LM trainer (Kudo ACL'18, hard-EM variant): Viterbi DP vs
  * exhaustive segmentation search under the pinned tie rule, Viterbi-EM
  * likelihood monotonicity, input-order invariance of training, and the
  * corpus surface's parallelism invariance. Log-probs in the DP checks
  * sit on a 2^-k grid so every path sum is EXACT and ties are real
  * ties, not float noise. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  /** All segmentations of `w` into pieces of length <= maxLen. */
  private def segs(w: String, maxLen: Int): Seq[List[String]] =
    if (w.isEmpty) Seq(Nil)
    else (1 to math.min(maxLen, w.length)).flatMap { l =>
      segs(w.drop(l), maxLen).map(w.take(l) :: _)
    }

  /** Brute force under the DP's tie rule: max left-to-right score; ties
    * prefer the longer LAST piece, then the longer second-to-last, …
    * (the back-pointer path of a strict-improvement, length-descending
    * scan). */
  private def brute(w: String, logp: Map[String, Double], maxLen: Int,
                    floor: Double): Option[List[String]] = {
    val scored = segs(w, maxLen).flatMap { s =>
      val lps = s.map(p =>
        logp.get(p).orElse(if (p.length == 1) Some(floor) else None))
      if (lps.exists(_.isEmpty)) None
      else Some((s, lps.flatten.foldLeft(0.0)(_ + _)))
    }
    if (scored.isEmpty) None
    else {
      val best = scored.map(_._2).max
      Some(scored.filter(_._2 == best)
        .map(_._1)
        .maxBy(s => s.reverse.map(_.length))(
          math.Ordering.Implicits.seqOrdering[List, Int]))
    }
  }

  test("viterbi == exhaustive search with the pinned tie rule") {
    // exact-grid log-probs: ties are exact (ab+c == a+bc when all -1.0)
    val logp = Map(
      "a" -> -1.0, "b" -> -1.0, "c" -> -2.0, "ab" -> -1.5, "bc" -> -1.0,
      "abc" -> -2.5, "aa" -> -0.5, "aab" -> -3.0, "ba" -> -1.0)
    val floor = -8.0
    for (w <- Seq("a", "ab", "abc", "aab", "aaab", "abcab", "bca", "cab",
      "zq", "azb", "abcabc", "aaaa")) {
      val got = Unigram.viterbi(w, logp, maxPieceLen = 3, floor = floor).toList
      val want = brute(w, logp, 3, floor).get
      assert(got == want, s"word $w: got $got want $want")
    }
  }

  test("hard-EM is monotone in Viterbi likelihood on the seed table") {
    val words = Array(("hello", 10L), ("help", 7L), ("hull", 3L),
      ("lolo", 5L), ("pell", 2L), ("hell", 6L))
    // seed: all substrings <= 4, uniform-ish start from raw counts
    val sub = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, c) <- words; i <- 0 until w.length;
         j <- (i + 1) to math.min(i + 4, w.length))
      sub(w.substring(i, j)) = sub.getOrElse(w.substring(i, j), 0L) + c
    def logps(cnt: collection.Map[String, Long]): Map[String, Double] = {
      val tot = cnt.values.sum.toDouble
      cnt.map { case (p, c) => p -> (math.log(c.toDouble) - math.log(tot)) }.toMap
    }
    def like(lp: Map[String, Double]): Double = words.map { case (w, c) =>
      c * Unigram.viterbi(w, lp, 4).map(p => lp(p)).sum
    }.sum
    var lp = logps(sub)
    var prev = like(lp)
    for (_ <- 1 to 4) {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (w, c) =>
        Unigram.viterbi(w, lp, 4).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + c)
      }
      lp = logps(counts)
      val cur = like(lp)
      assert(cur >= prev - 1e-12, s"likelihood regressed: $prev -> $cur")
      prev = cur
    }
  }

  test("train: input-order invariant, vocab bounded, coverage total") {
    val words = Array(("internal", 9L), ("interface", 8L), ("internet", 7L),
      ("nation", 6L), ("national", 5L), ("inter", 4L), ("face", 3L))
    val a = Unigram.train(words, vocabSize = 12, maxPieceLen = 5)
    val b = Unigram.train(words.reverse, vocabSize = 12, maxPieceLen = 5)
    assert(a.toSeq == b.toSeq, "training must not depend on input order")
    val multi = a.count(_._1.length > 1)
    val chars = a.count(_._1.length == 1)
    assert(multi <= 12 - chars || multi == 0,
      s"multi-piece budget exceeded: $multi multi, $chars chars")
    // counts are positive and logprobs normalize over the final counts
    assert(a.forall(_._2 > 0L))
    val total = a.map(_._2).sum.toDouble
    a.foreach { case (_, c, lp) =>
      assert(math.abs(lp - (math.log(c.toDouble) - math.log(total))) < 1e-12)
    }
    // a productive subword must survive for this stem-heavy corpus
    assert(a.exists(p => p._1.length >= 3),
      s"expected multi-char pieces, got ${a.map(_._1).mkString(",")}")
  }

  test("trainOn + tokenCounts on the corpus: parallelism-invariant, " +
    "bounded by char counts") {
    val docs = graft.api.DocsIndex.documents(spark, "/root/testdata/sf0.001")
    val vocab = Unigram.trainOn(spark, docs, vocabSize = 120, maxPieceLen = 5)
    val vocab8 = Unigram.trainOn(spark, docs.repartition(8), 120, 5)
    assert(vocab.collect().toSeq == vocab8.collect().toSeq)
    val n = Unigram.tokenCounts(spark, docs, vocab, 5)
      .as[(Long, Long)].collect().toMap
    assert(n.nonEmpty && n.values.forall(_ >= 0L))
    // every word segments into at most its char count of pieces
    val charCounts = docs.select(col("doc_id"), col("text")).collect().map { r =>
      r.getLong(0) -> graft.tokenize.Tokenizer.tokenize(r.getString(1))
        .map(_.length.toLong).sum
    }.toMap
    n.foreach { case (id, c) => assert(c <= charCounts(id),
      s"doc $id: $c pieces > ${charCounts(id)} chars") }
  }
}
