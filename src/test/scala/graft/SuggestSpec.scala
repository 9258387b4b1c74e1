package graft

import org.apache.spark.sql.functions._

import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.{DatasetCorpusSource, Synthesizer}
import graft.search.{Searcher, ServingSearcher}

/** "Did you mean" suggestions: banded Levenshtein over the vocabulary,
  * ranked by document frequency. */
class SuggestSpec extends SparkSpec {

  lazy val seg = SegmentBuilder.build(spark,
    DatasetCorpusSource(Synthesizer.tiny(spark)),
    BuildParams(numPartitions = 4, bucketSize = 64))._1
  lazy val searcher = new Searcher(spark, seg)

  // reference implementation: unbounded classic DP
  private def lev(a: String, b: String): Int = {
    val d = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 0 to a.length) d(i)(0) = i
    for (j <- 0 to b.length) d(0)(j) = j
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("banded editDistance agrees with the classic DP (within the bound)") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcd"
    def word() = Array.fill(rnd.nextInt(8))(alpha(rnd.nextInt(alpha.length))).mkString
    (1 to 500).foreach { _ =>
      val (a, b) = (word(), word())
      val bound = rnd.nextInt(3)
      val exact = lev(a, b)
      val banded = Searcher.editDistance(a, b, bound)
      if (exact <= bound) assert(banded == exact, s"'$a' '$b' bound=$bound")
      else assert(banded > bound, s"'$a' '$b' bound=$bound exact=$exact")
    }
  }

  test("mltTerms picks the (tf/df desc, term asc) top in-vocab terms") {
    val corpus = graft.corpus.Synthesizer.tiny(spark).collect()
    val seedText = corpus.head.content
    val got = searcher.mltTerms(seedText, 5).toSeq
    val dict = seg.dict.collect().map(e => e.term -> e.df).toMap
    val tf = graft.tokenize.Tokenizer.tokenize(seedText)
      .groupBy(identity).view.mapValues(_.length).toMap
    val want = tf.keys.toSeq.filter(dict.contains)
      .map(t => (tf(t).toDouble / dict(t), t))
      .sortBy { case (w, t) => (-w, t) }.take(5).map(_._2)
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("suggest returns distance-bounded vocabulary ranked by df") {
    val vocab = seg.dict.collect()
    val top = vocab.maxBy(_.df)
    val typo = top.term.drop(1) // deletion of the first char: distance 1
    val got = searcher.suggest(typo, 10, maxDist = 1)
    val want = vocab
      .filter(e => lev(e.term, typo) <= 1)
      .sortBy(e => (-e.df, e.term)).take(10).map(e => e.term -> e.df)
    assert(got.toSeq == want.toSeq)
    assert(got.map(_._1).contains(top.term))
    // exact vocabulary word suggests itself first at any df ranking tie
    assert(searcher.suggest(top.term, 1, 0).head._1 == top.term)
    // nothing within distance 0 of garbage
    assert(searcher.suggest("zzzzzqq", 5, 1).isEmpty)
  }

  test("serving tier suggests identically") {
    val serving = new ServingSearcher(spark, seg)
    val vocab = seg.dict.collect()
    val typo = vocab.maxBy(_.df).term.drop(1)
    assert(serving.suggest(typo, 10, 2).toSeq ==
      searcher.suggest(typo, 10, 2).toSeq)
    serving.close()
  }

  test("complete ranks prefix completions by (df desc, term asc)") {
    val vocab = seg.dict.collect()
    // a single-char prefix with >1 completion exercises the ranking
    val pre = vocab.map(_.term.take(1)).groupBy(identity)
      .maxBy { case (c, g) => (g.length, c) }._1
    val want = vocab.filter(_.term.startsWith(pre))
      .sortBy(e => (-e.df, e.term)).map(e => e.term -> e.df)
    assert(want.length > 1, "fixture must have a multi-completion prefix")
    assert(searcher.complete(pre, vocab.length).toSeq == want.toSeq)
    // the k-cut keeps the best-ranked prefix matches
    assert(searcher.complete(pre, 2).toSeq == want.take(2).toSeq)
    // operand normalizes like PREFIX: split chars keep the LAST piece
    assert(searcher.complete(s"get_$pre", 2).toSeq ==
      searcher.complete(pre, 2).toSeq)
    assert(searcher.complete(s"${pre.toUpperCase}*", 2).toSeq ==
      searcher.complete(pre, 2).toSeq)
    // bare `*` / empty prefix must not rank the whole dictionary
    assert(searcher.complete("*", 5).isEmpty)
    assert(searcher.complete("  ", 5).isEmpty)
    assert(searcher.complete("zzqx", 5).isEmpty)
  }

  test("serving tier completes identically") {
    val serving = new ServingSearcher(spark, seg)
    val pre = seg.dict.collect().head.term.take(1)
    assert(serving.complete(pre, 10).toSeq == searcher.complete(pre, 10).toSeq)
    serving.close()
  }

  test("suggestPhrase == brute-force candidate product under the unigram LM") {
    val vocab = seg.dict.collect()
    val total = vocab.map(_.cf).sum.toDouble
    val v = vocab.length.toDouble
    def lnP(cf: Long) = math.log(0.9 * cf / total + 0.1 / v)
    def candsOf(tok: String): Array[(String, Long)] = {
      val cs = vocab.filter(e => lev(e.term, tok) <= 1)
        .sortBy(e => (-e.df, e.term)).take(3).map(e => e.term -> e.cf)
      if (cs.isEmpty) Array(tok -> 0L) else cs
    }
    val Array(t0, t1) = vocab.sortBy(e => (-e.df, e.term)).take(2).map(_.term)
    val q = s"${t0.drop(1)} ${t1.drop(1)}" // two distance-1 typos
    val want = (for {
      (a, cfa) <- candsOf(t0.drop(1))
      (b, cfb) <- candsOf(t1.drop(1))
    } yield (s"$a $b",
        math.floor((lnP(cfa) + lnP(cfb)) * 1e6 + 0.5) / 1e6))
      .sortBy { case (p, s) => (-s, p) }.take(5)
    val got = searcher.suggestPhrase(q, 5)
    assert(got.toSeq == want.toSeq, s"got ${got.toSeq} want ${want.toSeq}")
    // the corrected phrase is among the suggestions
    assert(got.map(_._1).contains(s"$t0 $t1"))
  }

  test("serving tier suggests phrases identically") {
    val serving = new ServingSearcher(spark, seg)
    val vocab = seg.dict.collect()
    val Array(t0, t1) = vocab.sortBy(e => (-e.df, e.term)).take(2).map(_.term)
    val q = s"${t0.drop(1)} ${t1.drop(1)}"
    assert(serving.suggestPhrase(q, 5).toSeq ==
      searcher.suggestPhrase(q, 5).toSeq)
    serving.close()
  }

  test("suggestPhrase keeps an uncorrectable token, priced by smoothing") {
    val vocab = seg.dict.collect()
    val top = vocab.maxBy(_.df).term
    val got = searcher.suggestPhrase(s"zzzzzqq ${top.drop(1)}", 3)
    assert(got.nonEmpty)
    // every suggestion keeps the OOV token verbatim in slot 0
    assert(got.forall(_._1.startsWith("zzzzzqq ")))
    // empty and overlong queries are rejected cleanly
    assert(searcher.suggestPhrase("", 3).isEmpty)
    intercept[IllegalArgumentException] {
      searcher.suggestPhrase("aa bb cc dd ee ff gg hh ii", 3)
    }
  }
}
