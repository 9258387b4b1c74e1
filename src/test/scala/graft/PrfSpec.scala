package graft

import graft.api.DocsIndex

/** Pseudo-relevance feedback (DocsIndex.prfRankedHits): expansion-term
  * selection vs a driver-side brute force, equality with the manually
  * boosted query, the fbTerms=0 identity, and seed-term exclusion. */
class PrfSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("prf == the manually expanded boosted query; selection brute-forced") {
    val (fbDocs, fbTerms, k) = (5, 3, 15)
    val got = DocsIndex.prfRankedHits(spark, sf, "dup scan", fbDocs, fbTerms, k)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq

    // brute-force the whole selection driver-side
    val docs = DocsIndex.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> graft.tokenize.Tokenizer
        .tokenize(r.getString(1)).toSeq)
    val n = docs.length.toDouble
    val dl = docs.map { case (id, ts) => id -> ts.length }.toMap
    val avgdl = dl.values.sum / n
    val df = docs.flatMap(_._2.distinct).groupBy(identity).view
      .mapValues(_.length.toDouble).toMap
    def rnd6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def bm25(terms: Map[String, Double]): Seq[(Long, Double)] = docs.flatMap {
      case (id, ts) =>
        val tfs = ts.groupBy(identity).view.mapValues(_.length)
        val s = terms.toSeq.sortBy(_._1).map { case (t, b) =>
          tfs.get(t).filter(_ => df.contains(t)).fold(0.0) { tf =>
            b * math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) * tf * 2.2 /
              (tf + 1.2 * (0.25 + 0.75 * dl(id) / avgdl))
          }
        }.sum
        if (s > 0.0) Some((id, s)) else None
    }
    val fb = bm25(Map("dup" -> 1.0, "scan" -> 1.0))
      .map { case (id, s) => (id, math.rint(s * 1e6) / 1e6) } // round(,6)
      .sortBy { case (id, s) => (-s, id) }.take(fbDocs).map(_._1).toSet
    val cfFb = docs.filter(d => fb(d._1)).flatMap(_._2)
      .filterNot(Set("dup", "scan")).groupBy(identity).view
      .mapValues(_.length.toLong)
    val expansion = cfFb.toSeq.map { case (t, cf) =>
      (rnd6(cf * math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))), t)
    }.sortBy { case (w, t) => (-w, t) }.take(fbTerms).map(_._2)

    // the engine must equal the manually-boosted expanded query
    val manual = DocsIndex.rankedHits(spark, sf, "FREE",
      ("dup scan" +: expansion.map(t => s"$t^0.5")).mkString(" "), k)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == manual)
    assert(got.nonEmpty)
    // expansion changed the ranking vs the unexpanded query (PRF did work)
    val plain = DocsIndex.rankedHits(spark, sf, "FREE", "dup scan", k)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got != plain)
  }

  test("fbTerms = 0 is the identity; expansion never re-adds query terms") {
    val k = 10
    val prf0 = DocsIndex.prfRankedHits(spark, sf, "fast merge", 5, 0, k)
      .collect().toSeq
    val plain = DocsIndex.rankedHits(spark, sf, "FREE", "fast merge", k)
      .collect().toSeq
    assert(prf0 == plain)
    intercept[IllegalArgumentException](
      DocsIndex.prfRankedHits(spark, sf, "fast", 0, 3, k))
  }
}
