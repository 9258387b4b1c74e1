package graft

import graft.pipeline.HeavyHitters

/** Two-pass Misra-Gries heavy hitters: the MG survival law, the
  * determinism-despite-order-sensitivity argument, and end-to-end
  * equality with the exact aggregation (the `heavy_hitters` DuckDB
  * twin pins the same equality cross-engine). */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("mgSummary: capacity respected; every term with freq > N/(k+1) " +
    "survives ANY arrival order") {
    val rnd = new scala.util.Random(7)
    // 3 heavy terms + long tail, shuffled adversarially several ways
    val heavy = Seq.fill(400)("aaa") ++ Seq.fill(300)("bbb") ++ Seq.fill(250)("ccc")
    val tail = (0 until 1000).map(i => s"t$i")
    val stream = heavy ++ tail
    for (order <- Seq(stream, stream.reverse, rnd.shuffle(stream),
        tail ++ heavy)) {
      val m = HeavyHitters.mgSummary(order.iterator, k = 8)
      assert(m.size <= 8)
      // N = 1950, k = 8 => anything with freq > 1950/9 ~ 216.7 survives
      assert(Set("aaa", "bbb", "ccc").subsetOf(m.keySet.toSet),
        s"heavy terms lost from $m")
    }
  }

  test("mgSummary degenerate capacities: k=1 is Boyer-Moore majority") {
    val s = Seq.fill(6)("x") ++ Seq.fill(5)("y")
    assert(HeavyHitters.mgSummary(s.iterator, 1).keySet == Set("x"))
    assert(HeavyHitters.mgSummary(Iterator.empty, 4).isEmpty)
  }

  test("heavyHitters == exact HAVING aggregation, and is partitioning-" +
    "independent (the extra-candidate noise never reaches the output)") {
    val docs = graft.api.DocsIndex.documents(spark, "/root/testdata/sf0.001")
    val got = HeavyHitters.heavyHitters(docs, phi = 256L, k = 4096)
      .as[(String, Long)].collect().toSeq
    // exact twin computed relationally
    val toks = docs.select(org.apache.spark.sql.functions.explode(
      org.apache.spark.sql.functions.filter(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " "),
        w => org.apache.spark.sql.functions.length(w) >= 2)).as("term"))
    val n = toks.count()
    val exact = toks.groupBy("term").count()
      .filter(org.apache.spark.sql.functions.col("count") * 256 >= n)
      .orderBy(org.apache.spark.sql.functions.col("count").desc,
        org.apache.spark.sql.functions.col("term").asc)
      .as[(String, Long)].collect().toSeq
    assert(got.nonEmpty, "sf0.001 must have heavy hitters at phi=256")
    assert(got == exact)
    // repartitioning changes pass-1 locals but not the output
    val re = HeavyHitters.heavyHitters(docs.repartition(7), 256L, 4096)
      .as[(String, Long)].collect().toSeq
    assert(re == exact)
    // a just-legal capacity (k+1 > phi) still cannot lose a true heavy
    // hitter — the survival law, end-to-end
    val tight = HeavyHitters.heavyHitters(docs, 256L, 256)
      .as[(String, Long)].collect().toSeq
    assert(tight == exact)
  }
}
