package graft

import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.{DatasetCorpusSource, Synthesizer}
import graft.search.Searcher

/** Result collapsing (best hit per repo): checked against a brute force
  * built on the oracle-verified `hits` walk — fetch EVERY matching doc
  * (k ≥ corpus size), then reduce per repo on (rounded score desc,
  * docId asc) and rank repos by (score desc, repo asc). */
class CollapseSpec extends SparkSpec {

  lazy val seg = SegmentBuilder.build(spark,
    DatasetCorpusSource(Synthesizer.tiny(spark)),
    BuildParams(numPartitions = 4, bucketSize = 64))._1
  lazy val searcher = new Searcher(spark, seg)
  lazy val repoOf: Map[Long, String] = {
    import spark.implicits._
    seg.docs.select($"docId", $"repo").as[(Long, String)].collect().toMap
  }

  private def brute(kind: String, text: String, k: Int): Seq[(String, Long, Double)] = {
    val all = searcher.hits(kind, text, 100000).collect()
      .map(h => (repoOf(h.docId), h.docId, Searcher.round6(h.score)))
    all.groupBy(_._1).values.map { g =>
      g.minBy { case (_, d, s) => (-s, d) }
    }.toSeq.sortBy { case (r, _, s) => (-s, r) }.take(k)
  }

  private def got(kind: String, text: String, k: Int): Seq[(String, Long, Double)] =
    searcher.collapsedHits(kind, text, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq

  test("collapse == per-repo reduce of the exhaustive hit set (FREE)") {
    val q = ("FREE", "def import match", 5)
    val g = got(q._1, q._2, q._3)
    assert(g == brute(q._1, q._2, q._3))
    assert(g.nonEmpty && g.map(_._1).distinct.size == g.size) // one row per repo
  }

  test("collapse == per-repo reduce of the exhaustive hit set (AND)") {
    val g = got("AND", "def AND import", 5)
    assert(g == brute("AND", "def AND import", 5))
  }

  test("collapse of an unknown term is empty; unsupported kind rejected") {
    assert(got("FREE", "zzznotaterm", 5).isEmpty)
    assert(got("AND", "def AND zzznotaterm", 5).isEmpty)
    intercept[IllegalArgumentException] {
      searcher.collapsedHits("PHRASE", "\"a b\"", 5)
    }
  }
}
