package graft

import graft.api.DocsIndex
import graft.pipeline.Ann
import graft.search.Searcher

/** MMR diversification (DocsIndex.mmrRankedHits): equality with an
  * independent brute-force greedy over the same window, the first-pick
  * rule, and the window/k contract. Runs on the sf0.001 testdata (the
  * op joins hits with the embeddings table). */
class MmrSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val lambda = 0.75

  test("mmrRankedHits == brute-force greedy MMR over the rounded window") {
    import org.apache.spark.sql.functions.col
    val k = 5
    val window = 20
    val got = DocsIndex.mmrRankedHits(spark, dir, "FREE",
        "fast merge sort table", k, window)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq

    // independent brute force from the same public surfaces
    val top = DocsIndex.rankedHits(spark, dir, "FREE",
        "fast merge sort table", window)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id").isin(top.map(t => Long.box(t._1)): _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val r6 = Searcher.round6 _
    var remaining = top.toList
    val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Long)]
    while (sel.length < k && remaining.nonEmpty) {
      val cand = remaining.map { case (id, rel) =>
        val m =
          if (sel.isEmpty) r6(lambda * rel)
          else r6(lambda * rel - (1 - lambda) *
            sel.map(s => r6(Ann.cosine(vecs(id), vecs(s._1)))).max)
        (id, m)
      }
      val best = cand.minBy { case (id, m) => (-m, id) }
      sel += ((best._1, best._2, sel.length + 1L))
      remaining = remaining.filterNot(_._1 == best._1)
    }
    assert(got == sel.toSeq)
    assert(got.length == k)
    // rank 1 is the pure-relevance argmax (no penalty on the first pick)
    val relTop = top.minBy(t => (-t._2, t._1))
    assert(got.head._1 == relTop._1)
    assert(got.head._2 == r6(lambda * relTop._2))
  }

  test("k must fit the window") {
    intercept[IllegalArgumentException] {
      DocsIndex.mmrRankedHits(spark, dir, "FREE", "fast", 10, 5)
    }
  }
}
