package graft

import graft.pipeline.Components

/** Connected components (large-star/small-star) vs a driver-side
  * union-find oracle, across random graphs and adversarial chains. */
class ComponentsSpec extends SparkSpec {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical = min member == root under min-union
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(x => x -> find(x)).toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val pairs = edges.toDF("doc_a", "doc_b")
    val got = Components.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = unionFind(0, edges)
    assert(got == want, s"got ${got.toSeq.sorted.take(10)} want ${want.toSeq.sorted.take(10)}")
  }

  test("random graphs match union-find") {
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 30 + rng.nextInt(50)
      val edges = (0 until n).map(_ =>
        (rng.nextInt(40).toLong, rng.nextInt(40).toLong)).filter(e => e._1 != e._2)
      if (edges.nonEmpty) check(edges)
    }
  }

  test("adversarial long chain converges in O(log) rounds, not diameter") {
    // a 200-node chain: min-label propagation would need ~200 rounds;
    // large-star/small-star must finish inside the maxIter=20 default
    val chain = (0L until 199L).map(i => (i, i + 1))
    check(chain)
    // two chains + an isolated pair
    check(chain ++ (1000L until 1050L).map(i => (i, i + 1)) ++ Seq((5000L, 5001L)))
  }

  test("dupGroups and nonCanonical derive from components") {
    import spark.implicits._
    val pairs = Seq((3L, 1L), (1L, 2L), (10L, 11L)).toDF("doc_a", "doc_b")
    val groups = Components.dupGroups(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toSeq)).toSet
    assert(groups == Set((1L, 3L, Seq(1L, 2L, 3L)), (10L, 2L, Seq(10L, 11L))))
    val drops = Components.nonCanonical(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(drops == Set((2L, 1L), (3L, 1L), (11L, 10L)))
  }
}
