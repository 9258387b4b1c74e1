package graft

import graft.pipeline.{Aqp, PortableHash}

/** Sample-based approximate aggregation (pipeline/Aqp.scala): exact
  * brute-force equality of the whole output (membership rule, moments,
  * CI tree), sample-strictly-smaller, CI sanity against the exact
  * mean, and validation. */
class AqpSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("sampled means equal brute force; the CI brackets the exact mean " +
       "on this corpus; validation") {
    val rate = 200000
    val got = Aqp.sampledMean(docs, rate).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    val rows = docs.select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = rows.groupBy(_._2).toSeq.sortBy(_._1).flatMap { case (lang, rs) =>
      val samp = rs.filter(t =>
        PortableHash.md5HexPrefixLong(t._1.toString, 6) % 1000000L < rate)
      if (samp.length < 2) None
      else {
        val n = samp.length.toDouble
        val s1 = samp.map(_._3).sum
        val s2 = samp.map(t => t._3 * t._3).sum
        val variance = math.max(0.0, (s2 - s1 * s1 / n) / (n - 1))
        val es1 = rs.map(_._3).sum
        Some((lang, samp.length.toLong, r6(s1 / n),
          r6(1.96 * math.sqrt(variance / n)), r6(es1.toDouble / rs.length)))
      }
    }
    assert(got == want, s"got $got want $want")
    got.foreach { case (lang, n, est, ci, exact) =>
      assert(n >= 2 && n < rows.count(_._2 == lang), s"$lang sample size $n")
      assert(ci > 0.0, s"$lang CI must be positive")
      // deterministic fixed-hash sample: the estimate brackets the
      // exact mean well within the CI on this corpus (pinned at 3×)
      assert(math.abs(est - exact) <= 3.0 * ci, s"$lang: $est vs $exact ± $ci")
    }
    intercept[IllegalArgumentException](Aqp.sampledMean(docs, 0))
    intercept[IllegalArgumentException](Aqp.sampledMean(docs, 1000000))
  }
}
