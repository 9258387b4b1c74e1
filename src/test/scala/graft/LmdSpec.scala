package graft

import org.apache.spark.sql.functions.col

import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.{DatasetCorpusSource, Synthesizer}
import graft.search.Searcher
import graft.tokenize.Tokenizer

/** LM-Dirichlet retrieval (Zhai & Lafferty SIGIR'01, the Lucene
  * LMDirichletSimilarity formulation): checked term-for-term against a
  * raw-text brute force, including the per-term 0-clamp and the
  * drop-all-clamped rule. */
class LmdSpec extends SparkSpec {

  lazy val seg = SegmentBuilder.build(spark,
    DatasetCorpusSource(Synthesizer.corpus(spark, 200L)),
    BuildParams(numPartitions = 4, bucketSize = 64, positional = true))._1
  lazy val searcher = new Searcher(spark, seg)
  lazy val toksByDoc: Map[Long, Array[String]] = {
    val c = Synthesizer.corpus(spark, 200L).toDF()
      .select(col("repo"), col("path"), col("content"))
    import spark.implicits._
    seg.docs.join(c, Seq("repo", "path"))
      .select(col("docId"), col("content")).as[(Long, String)]
      .collect().map { case (d, t) => d -> Tokenizer.tokenize(t) }.toMap
  }

  private def brute(terms: Seq[String], mu: Double, k: Int): Seq[(Long, Double)] = {
    val total = toksByDoc.values.map(_.length.toLong).sum.toDouble
    val cf = terms.map(t =>
      t -> toksByDoc.values.map(_.count(_ == t).toLong).sum).toMap
    val scored = toksByDoc.toSeq.flatMap { case (d, toks) =>
      val dl = toks.length
      val dlTerm = math.log(mu / (dl + mu))
      // ascending termId order == ascending dictionary assignment order;
      // for the tolerance-free comparison below we sum in the ENGINE's
      // order via sorted distinct terms (ties inside 1e-9 anyway)
      val s = terms.distinct.sorted.map { t =>
        val tf = toks.count(_ == t)
        if (tf == 0) 0.0
        else math.max(0.0,
          math.log(1.0 + tf / (mu * (cf(t) / total))) + dlTerm)
      }.sum
      if (s > 0.0) Some((d, s)) else None
    }
    scored.sortBy { case (d, s) => (-s, d) }.take(k)
  }

  test("lmdHits == brute-force Dirichlet query likelihood") {
    val terms = seg.dict.orderBy(col("df").desc).limit(3).collect().map(_.term)
    val q = terms.mkString(" ")
    val got = searcher.lmdHits(q, 2000.0, 10).collect()
      .map(h => (h.docId, h.score)).sortBy(x => (-x._2, x._1)).toSeq
    val want = brute(terms.toSeq, 2000.0, 10)
    assert(got.map(_._1) == want.map(_._1))
    got.zip(want).foreach { case ((d, gs), (_, ws)) =>
      assert(math.abs(gs - ws) < 1e-9, s"doc $d: $gs vs $ws")
    }
  }

  test("serving-tier LMD == relational LMD, bit-identical") {
    val terms = seg.dict.orderBy(col("df").desc).limit(3).collect().map(_.term)
    val q = terms.mkString(" ")
    val srv = new graft.search.ServingSearcher(spark, seg)
    try {
      for (mu <- Seq(0.5, 200.0, 2000.0)) {
        val rel = searcher.lmdHits(q, mu, 10).collect()
          .map(h => (h.docId, h.score)).toSeq
        val got = srv.lmdHits(q, mu, 10).map(h => (h.docId, h.score)).toSeq
        assert(got == rel, s"mu=$mu")
      }
      assert(srv.lmdHits("zzz_not_a_term", 2000.0, 5).isEmpty)
      intercept[IllegalArgumentException] { srv.lmdHits(q, -1.0, 5) }
    } finally srv.close()
  }

  test("small mu sharpens toward tf-dominance; clamp drops all-clamped docs") {
    // with a tiny mu the smoothing term ln(mu/(dl+mu)) is strongly
    // negative, so low-tf matches clamp to zero and drop out: the match
    // count must be <= the plain disjunctive match count
    val terms = seg.dict.orderBy(col("df").desc).limit(2).collect().map(_.term)
    val q = terms.mkString(" ")
    val n = seg.stats.numDocs.toInt
    val lmd = searcher.lmdHits(q, 0.5, n).collect()
    val or = searcher.hitsExhaustive("FREE", q, n).collect()
    assert(lmd.length <= or.length)
    assert(lmd.forall(_.score > 0.0))
    intercept[IllegalArgumentException] { searcher.lmdHits(q, 0.0, 5) }
    // OOV-only query is empty
    assert(searcher.lmdHits("zzz_not_a_term", 2000.0, 5).isEmpty)
  }
}
