package graft

import graft.pipeline.Kmv

/** KMV/theta distinct-count sketch (pipeline/Kmv.scala): brute-force
  * equality of the whole output (hashes, ranks, estimates), the
  * exact-below-k law, the union-merge law, estimate accuracy on a
  * deterministic fixture, and parallelism invariance. */
class KmvSpec extends SparkSpec {

  private val k = 32

  private def pairsDf = {
    import spark.implicits._
    // scope a: 500 distinct members (>> k); scope b: 10 (< k, exact);
    // overlap: b's members are a subset of a's
    val a = (0 until 500).map(i => ("a", s"m$i"))
    val b = (0 until 10).map(i => ("b", s"m$i"))
    // duplicates must not matter (distinct-count semantics)
    (a ++ b ++ a.take(50)).toDF("scope", "member")
  }

  test("output equals plain-Scala brute force; below-k scopes are exact; " +
       "the ALL scope is the union sketch") {
    val got = Kmv.distinctEstimates(pairsDf, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    def brute(members: Seq[String]): (Long, Double) = {
      val hs = members.distinct.map(m => (Kmv.memberHash(m), m)).sorted
      (members.distinct.size.toLong,
        Kmv.estimate(hs.map(_._1).take(k), members.distinct.size.toLong, k))
    }
    val aM = (0 until 500).map(i => s"m$i")
    val bM = (0 until 10).map(i => s"m$i")
    val want = Seq(
      ("ALL", brute(aM ++ bM)), ("a", brute(aM)), ("b", brute(bM)))
      .map { case (s, (n, e)) => (s, n, e) }
    assert(got == want, s"got $got want $want")
    // below-k scope is exact; ALL is the union (same members as a here)
    assert(got.find(_._1 == "b").get._3 == 10.0)
    assert(got.find(_._1 == "ALL").get._2 == 500L)
    // over-k estimate lands within the k=32 error regime (~18% theory;
    // deterministic for the fixed md5 hashes, generous band pinned)
    val estA = got.find(_._1 == "a").get._3
    assert(math.abs(estA - 500.0) / 500.0 < 0.4, s"estimate $estA off 500")
  }

  test("merge law: the union sketch == k smallest of merged per-scope " +
       "sketches; parallelism invariance; validation") {
    val aH = (0 until 500).map(i => Kmv.memberHash(s"m$i")).sorted.take(k)
    val bH = (0 until 10).map(i => Kmv.memberHash(s"m$i")).sorted.take(k)
    val merged = (aH ++ bH).distinct.sorted.take(k)
    val unionEst = Kmv.estimate(merged, 500L, k)
    val got = Kmv.distinctEstimates(pairsDf, k).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(got("ALL") == unionEst,
      s"union sketch ${got("ALL")} != merged-sketch estimate $unionEst")
    val again = Kmv.distinctEstimates(pairsDf.repartition(7), k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(again == Kmv.distinctEstimates(pairsDf, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)
    intercept[IllegalArgumentException](Kmv.distinctEstimates(pairsDf, 1))
  }
}
