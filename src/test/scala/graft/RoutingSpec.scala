package graft

import graft.pipeline.{PortableHash, Routing}

/** Rendezvous routing: brute-force agreement, the minimal-disruption
  * law under shard growth (THE rendezvous property), coverage, and
  * parallelism invariance. The DuckDB twin (shard_route) pins the
  * md5-weight portability cross-engine. */
class RoutingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (1L to n.toLong).toDF("doc_id")

  private def route(n: Int, shards: Int, parts: Int = 4): Map[Long, Int] =
    Routing.rendezvousRoute(spark, docs(n).repartition(parts), shards)
      .as[(Long, Int, Long)].collect().map(r => r._1 -> r._2).toMap

  test("route == per-doc argmax of md5 weights; parallelism-invariant") {
    val got = route(200, 5)
    (1L to 200L).foreach { id =>
      val want = (0 until 5)
        .map(s => (PortableHash.md5HexPrefixLong(s"$id#$s", 15), s))
        .maxBy { case (w, s) => (w, -s) }._2
      assert(got(id) == want, s"doc $id")
    }
    assert(route(200, 5, parts = 1) == got)
  }

  test("growing S -> S+1 moves only winners of the new shard, " +
    "expected ~1/(S+1) of docs; nothing moves between old shards") {
    val before = route(500, 8)
    val after = route(500, 9)
    val moved = before.keys.filter(id => before(id) != after(id)).toSeq
    moved.foreach { id =>
      assert(after(id) == 8, s"doc $id moved to old shard ${after(id)}")
    }
    // expected 500/9 ≈ 56 moves; allow a wide deterministic band
    assert(moved.size > 20 && moved.size < 120, s"${moved.size} moved")
  }

  test("every shard is populated at corpus scale") {
    val byShard = route(500, 8).values.groupBy(identity).view.mapValues(_.size)
    assert(byShard.size == 8, s"unpopulated shards: ${byShard.keys.toSeq.sorted}")
    // crude balance: no shard above 3x the fair share
    assert(byShard.values.forall(_ < 3 * 500 / 8), byShard.toMap.toString)
  }
}
