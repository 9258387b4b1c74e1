package graft

import graft.api.DocsIndex

/** Ranking evaluation (DocsIndex.rankEval): metrics vs a driver-side
  * brute force over the real corpus, the saturated/zero edges, and the
  * metric definitions (prec@k, RR, binary nDCG@k). */
class RankEvalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val k = 10

  test("metrics agree with a driver-side brute force") {
    val queries = Seq(1L -> "fast merge sort", 2L -> "hash join",
      3L -> "zzz merge")
    val got = DocsIndex.rankEval(spark, sf, queries, k).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap

    // brute force: tokenize driver-side, score bm25, rank, judge
    val docs = DocsIndex.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> graft.tokenize.Tokenizer
        .tokenize(r.getString(1)).toSeq)
    val n = docs.length.toDouble
    val dl = docs.map { case (id, ts) => id -> ts.length }.toMap
    val avgdl = dl.values.sum / n
    val df = docs.flatMap(_._2.distinct).groupBy(identity).view
      .mapValues(_.length.toDouble).toMap
    val ln2 = math.log(2.0)
    def rnd6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    queries.foreach { case (qid, text) =>
      val terms = text.split(" ").toSeq.distinct.filter(df.contains)
      val allTerms = text.split(" ").toSeq.distinct
      val scored = docs.flatMap { case (id, ts) =>
        val tfs = ts.groupBy(identity).view.mapValues(_.length)
        val s = terms.map { t =>
          tfs.get(t).fold(0.0) { tf =>
            math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) * tf * 2.2 /
              (tf + 1.2 * (0.25 + 0.75 * dl(id) / avgdl))
          }
        }.sum
        if (s > 0.0) Some((id, rnd6(s))) else None
      }
      val ranked = scored.sortBy { case (id, s) => (-s, id) }.take(k)
        .zipWithIndex.map { case ((id, _), i) => (id, i + 1L) }
      val rel = docs.filter(d => allTerms.forall(d._2.contains))
        .map(_._1).toSet
      val hitRel = ranked.filter { case (id, _) => rel(id) }
      val prec = hitRel.length.toDouble / k
      val rr = hitRel.headOption.fold(0.0) { case (_, r) => 1.0 / r }
      val dcg = hitRel.map { case (_, r) => ln2 / math.log(r + 1.0) }.sum
      val idcg = (1L to math.min(rel.size.toLong, k.toLong))
        .map(i => ln2 / math.log(i + 1.0)).sum
      val ndcg = if (idcg > 0) dcg / idcg else 0.0
      val (gn, gp, grr, gnd) = got(qid)
      assert(gn == rel.size.toLong, s"q$qid n_rel")
      assert(gp == rnd6(prec), s"q$qid prec")
      assert(grr == rnd6(rr), s"q$qid rr")
      assert(gnd == rnd6(ndcg), s"q$qid ndcg")
    }
    // the OOV conjunction has zero qrels and zero metrics
    assert(got(3L) == ((0L, 0.0, 0.0, 0.0)))
  }

  test("perfect-oracle ranking scores 1.0 across the board") {
    // judge the AND ranking against its own qrels: every returned doc is
    // relevant and R >= k, so prec = rr = ndcg = 1
    val out = DocsIndex.rankEval(spark, sf, Seq(9L -> "fast"), k)
      .collect().head
    assert(out.getLong(1) > k) // R >= k saturates IDCG
    assert(out.getDouble(2) == 1.0 && out.getDouble(3) == 1.0 &&
      out.getDouble(4) == 1.0)
  }

  test("input validation") {
    intercept[IllegalArgumentException](
      DocsIndex.rankEval(spark, sf, Seq.empty, k))
    intercept[IllegalArgumentException](
      DocsIndex.rankEval(spark, sf, Seq(1L -> "fast"), 0))
  }
}
