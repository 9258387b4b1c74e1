package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Graph

/** Invariant + brute-force checks for the iterative graph operators.
  * The DuckDB twins (graph_pagerank / graph_bfs / graph_triangles)
  * pin cross-engine equality; this suite pins the algebra on graphs
  * small enough to verify by hand or by exhaustive enumeration. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // path 1-2-3-4-5 plus a triangle (6,7,8) and a pendant 8-9
  private def pairs = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (6L, 7L), (6L, 8L), (7L, 8L), (8L, 9L)).toDF("a", "b")

  private def edges = Graph.bidirectional(
    pairs.select(col("a").as("src"), col("b").as("dst")))

  test("pageRank conserves total mass: sum(pr) == #nodes (no dangling)") {
    val pr = Graph.pageRank(edges, iters = 10)
    val total = pr.agg(sum("pr")).as[Double].head()
    assert(math.abs(total - 9.0) < 1e-3, s"mass $total != 9")
  }

  test("pageRank ranks hubs above pendants and is parallelism-invariant") {
    val pr = Graph.pageRank(edges, iters = 10)
      .as[(Long, Double)].collect().toMap
    // node 8 has degree 3 (6,7,9), node 9 degree 1 — centrality must order them
    assert(pr(8L) > pr(6L) && pr(8L) > pr(9L))
    assert(pr(2L) > pr(1L)) // interior of the path beats its endpoint
    val pr1 = Graph.pageRank(edges.repartition(1), iters = 10)
      .as[(Long, Double)].collect().toMap
    assert(pr1 == pr, "round-6 ranks must not depend on input partitioning")
  }

  test("bfs == exact hop distances on the path graph, unreached absent") {
    val d = Graph.bfs(edges, source = 1L, maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L),
      s"got $d") // node 5 is 4 hops away; component {6..9} unreachable
  }

  test("triangleCounts == exhaustive triple enumeration") {
    val got = Graph.triangleCounts(pairs).as[(Long, Long)].collect().toMap
    // only triangle is (6,7,8): one per corner
    assert(got == Map(6L -> 1L, 7L -> 1L, 8L -> 1L))

    // random-ish denser graph: cross-check against brute force
    val es = for {
      i <- 1L to 12L; j <- (i + 1) to 12L
      if ((i * 31 + j * 17) % 3) == 0
    } yield (i, j)
    val df = es.toDF("a", "b")
    val eset = es.toSet
    val expect = (for {
      x <- 1L to 12L; y <- (x + 1) to 12L; z <- (y + 1) to 12L
      if eset((x, y)) && eset((x, z)) && eset((y, z))
      n <- Seq(x, y, z)
    } yield n).groupBy(identity).map { case (n, c) => (n, c.size.toLong) }
    val got2 = Graph.triangleCounts(df).as[(Long, Long)].collect().toMap
    assert(got2 == expect, s"got $got2 expected $expect")
  }

  test("sssp: weighted distances vs brute force; weight-1 sssp == bfs") {
    // weighted diamond: 1→2 (w5), 1→3 (w1), 3→2 (w1), 2→4 (w10), 3→4 (w7)
    val wes = Seq(
      (1L, 2L, 5L), (1L, 3L, 1L), (3L, 2L, 1L), (2L, 4L, 10L), (3L, 4L, 7L))
      .toDF("src", "dst", "w")
    val got = Graph.sssp(wes, source = 1L, maxEdges = 3)
      .as[(Long, Long)].collect().toMap
    // 1→3→2 (2) beats direct (5); 1→3→4 (8) beats 1→3→2→4 (12)
    assert(got == Map(1L -> 0L, 2L -> 2L, 3L -> 1L, 4L -> 8L), s"got $got")
    // bounded: with maxEdges=1 only direct edges are reachable
    val oneHop = Graph.sssp(wes, source = 1L, maxEdges = 1)
      .as[(Long, Long)].collect().toMap
    assert(oneHop == Map(1L -> 0L, 2L -> 5L, 3L -> 1L), s"got $oneHop")
    // weight-1 reduction: sssp == bfs hop distances on the shared graph
    val unit = edges.withColumn("w", lit(1L))
    val viaSssp = Graph.sssp(unit, source = 1L, maxEdges = 3)
      .as[(Long, Long)].collect().toMap
    val viaBfs = Graph.bfs(edges, source = 1L, maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(viaSssp == viaBfs)
  }

  test("kcore: peel fixpoint == brute force; pendant chains stripped; " +
    "idempotent under extra rounds") {
    // fixture: triangle (6,7,8) + K4 (10,11,12,13) + chain 1-2-3-4-5
    // attached to the triangle via 5-6, pendant 8-9
    val g = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (6L, 8L), (7L, 8L), (8L, 9L),
      (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L),
      (11L, 13L), (12L, 13L)).toDF("a", "b")
    def brute(k: Int): Map[Long, Int] = {
      var es = Seq(
        (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
        (6L, 7L), (6L, 8L), (7L, 8L), (8L, 9L),
        (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L),
        (11L, 13L), (12L, 13L)).flatMap(e => Seq(e, e.swap))
      var changed = true
      while (changed) {
        val deg = es.groupBy(_._1).view.mapValues(_.size).toMap
        val keep = deg.filter(_._2 >= k).keySet
        val next = es.filter(e => keep(e._1) && keep(e._2))
        changed = next.size != es.size
        es = next
      }
      es.groupBy(_._1).view.mapValues(_.size).toMap
    }
    for (k <- Seq(2, 3, 4)) {
      val got = Graph.kcore(g, k, maxRounds = 12)
        .as[(Long, Long)].collect().toMap.map { case (n, d) => n -> d.toInt }
      assert(got == brute(k), s"k=$k: $got vs ${brute(k)}")
    }
    // 2-core keeps both cliques, strips the chain+pendant;
    // 3-core = the K4 alone; 4-core empty
    assert(Graph.kcore(g, 3, 12).as[(Long, Long)].collect().toMap.keySet ==
      Set(10L, 11L, 12L, 13L))
    assert(Graph.kcore(g, 4, 12).count() == 0)
    // idempotence: a larger round budget changes nothing
    assert(Graph.kcore(g, 2, 30).orderBy("node").collect().toSeq ==
      Graph.kcore(g, 2, 12).orderBy("node").collect().toSeq)
  }

  test("partCopurchaseEdges: support threshold prunes, cap guards groups") {
    val dir = "/root/testdata/sf0.001"
    val s1 = Graph.partCopurchaseEdges(spark, dir, minSupport = 1).count()
    val s2 = Graph.partCopurchaseEdges(spark, dir, minSupport = 2).count()
    assert(s2 > 0 && s2 < s1, s"support must prune: s1=$s1 s2=$s2")
    val capped = Graph.partCopurchaseEdges(spark, dir, maxGroup = 1).count()
    assert(capped == 0L)
  }
}
