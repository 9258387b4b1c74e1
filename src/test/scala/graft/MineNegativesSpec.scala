package graft

import graft.api.DocsIndex

/** Hard-negative mining (DocsIndex.mineNegatives): per-seed equality
  * with the single-seed MLT surface when no copies exist, and the
  * exact-duplicate exclusion on a planted-copy corpus. */
class MineNegativesSpec extends SparkSpec {

  test("with no duplicates, negatives == mltRankedHits per seed") {
    val dir = "/root/testdata/sf0.001" // dedup_exact finds 0 copies here
    val seeds = Seq(7L, 42L)
    val got = DocsIndex.mineNegatives(spark, dir, seeds, 5, 10).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq)
      .toMap
    seeds.foreach { id =>
      val want = DocsIndex.mltRankedHits(spark, dir, id, 5, 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      assert(got(id) == want, s"seed $id")
      assert(want.nonEmpty)
    }
  }

  test("exact copies of the seed are excluded from its negatives") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-negdup").toString
    // doc 0 is the seed; doc 1 is an EXACT copy; docs 2-3 are lexically
    // close non-copies; padding docs keep statistics sane
    val rows = Seq(
      (0L, "alpha beta gamma delta epsilon", "en", "s0"),
      (1L, "alpha beta gamma delta epsilon", "en", "s0"), // exact copy
      (2L, "alpha beta gamma delta different", "en", "s0"),
      (3L, "alpha beta gamma other words", "en", "s0"),
      (4L, "totally unrelated text here now", "en", "s0"),
      (5L, "more filler rows beyond compare", "en", "s0"))
    rows.toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = DocsIndex.mineNegatives(spark, dir, Seq(0L), 3, 5).collect()
      .map(r => (r.getLong(1), r.getLong(3))).toSeq
    val ids = got.map(_._1).toSet
    assert(!ids.contains(0L), "the seed itself must be excluded")
    assert(!ids.contains(1L), "an exact copy of the seed must be excluded")
    assert(ids.contains(2L) && ids.contains(3L),
      s"close non-copies are the negatives: $got")
    assert(got.map(_._2) == got.map(_._2).sorted, "ranks are dense/ordered")
  }
}
