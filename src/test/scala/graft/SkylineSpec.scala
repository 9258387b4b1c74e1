package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Skyline

/** Skyline (Pareto frontier) vs the brute-force NOT EXISTS dominance
  * definition, plus the laws the two-phase sweep must preserve:
  * duplicate survival (identical points never dominate each other) and
  * partitioning invariance (the local-sweep phase may not lose a
  * global-skyline row). The DuckDB twin (q_skyline) pins the same
  * definition cross-engine on the driver testdata. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, Int, Double)]): Set[(Long, Int, Double)] =
    rows.filter { a =>
      !rows.exists { b =>
        b._2 >= a._2 && b._3 <= a._3 && (b._2 > a._2 || b._3 < a._3)
      }
    }.toSet

  private def run(rows: Seq[(Long, Int, Double)], parts: Int): Set[(Long, Int, Double)] =
    Skyline.skyline(rows.toDF("id", "size", "price").repartition(parts),
        "id", "size", "price")
      .as[(Long, Int, Double)].collect().toSet

  test("skyline == NOT EXISTS brute force, any partitioning") {
    // deterministic pseudo-random points incl. collisions on both dims
    val rows = (1L to 300L).map { i =>
      (i, ((i * 37) % 20).toInt, ((i * 53) % 17).toDouble)
    }
    val want = brute(rows)
    assert(want.nonEmpty && want.size < rows.size)
    for (p <- Seq(1, 3, 32)) {
      assert(run(rows, p) == want, s"mismatch at $p partitions")
    }
  }

  test("identical points all survive; dominated duplicates all fall") {
    val rows = Seq(
      (1L, 10, 5.0), (2L, 10, 5.0),       // duplicate frontier points
      (3L, 10, 7.0),                      // dominated by 1/2 (same size, worse price)
      (4L, 12, 6.0),                      // frontier (bigger size, worse price than 1)
      (5L, 9, 4.0),                       // frontier (smaller size, better price)
      (6L, 8, 4.0))                       // dominated by 5
    val got = run(rows, 2)
    assert(got == brute(rows))
    assert(got.map(_._1) == Set(1L, 2L, 4L, 5L))
  }

  test("skyline3 (SFS) == NOT EXISTS brute force, any partitioning; " +
    "duplicates survive") {
    val rows = (1L to 250L).map { i =>
      (i, ((i * 37) % 12).toInt, ((i * 53) % 9).toDouble, (i * 29) % 7)
    } ++ Seq((900L, 11, 0.0, 0L), (901L, 11, 0.0, 0L)) // duplicate optimum
    def dom(b: (Long, Int, Double, Long), a: (Long, Int, Double, Long)) =
      b._2 >= a._2 && b._3 <= a._3 && b._4 <= a._4 &&
        (b._2 > a._2 || b._3 < a._3 || b._4 < a._4)
    val want = rows.filter(a => !rows.exists(b => dom(b, a))).toSet
    assert(want.contains((900L, 11, 0.0, 0L)) && want.contains((901L, 11, 0.0, 0L)))
    for (p <- Seq(1, 4, 16)) {
      val got = Skyline.skyline3(
          rows.toDF("id", "size", "price", "len").repartition(p),
          "id", "size", "price", "len")
        .as[(Long, Int, Double, Long)].collect().toSet
      assert(got == want, s"mismatch at $p partitions")
    }
  }

  test("anti-correlated worst case: every point is skyline") {
    // bigger size costs more: no point is ≥ on size AND ≤ on price
    val rows = (1L to 50L).map(i => (i, i.toInt, i.toDouble))
    assert(run(rows, 4) == rows.toSet)
    assert(brute(rows) == rows.toSet)
  }
}
