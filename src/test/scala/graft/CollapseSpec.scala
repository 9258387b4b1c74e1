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

  /** has_child brute force on the same oracle-verified exhaustive hit
    * set: per-repo (sum, count, max) over exact score MICROS — the
    * engine's order-free Long regime — then the score_mode projection,
    * min_children filter, and (score desc, repo asc) rank. */
  private def bruteHasChild(kind: String, text: String, mode: String,
                            minChildren: Int, k: Int): Seq[(String, Long, Double)] = {
    val all = searcher.hits(kind, text, 100000).collect()
      .map(h => (repoOf(h.docId), Math.round(Searcher.round6(h.score) * 1e6)))
    all.groupBy(_._1).toSeq.map { case (r, g) =>
      val sm = g.map(_._2).sum
      val n = g.size.toLong
      val mx = g.map(_._2).max
      val score = mode match {
        case "max" => mx / 1e6
        case "sum" => sm / 1e6
        case "avg" => math.floor(sm.toDouble / n + 0.5) / 1e6
      }
      (r, n, score)
    }.filter(_._2 >= minChildren)
      .sortBy { case (r, _, s) => (-s, r) }.take(k)
  }

  private def gotHasChild(kind: String, text: String, mode: String,
                          minChildren: Int, k: Int): Seq[(String, Long, Double)] =
    searcher.hasChildHits(kind, text, mode, minChildren, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq

  test("has_child == per-repo aggregate of the exhaustive hit set, all modes") {
    for (mode <- Seq("max", "sum", "avg"); mc <- Seq(1, 2)) {
      val g = gotHasChild("FREE", "def import match", mode, mc, 5)
      assert(g == bruteHasChild("FREE", "def import match", mode, mc, 5),
        s"mode=$mode min_children=$mc")
      assert(g.forall(_._2 >= mc))
    }
    val gAnd = gotHasChild("AND", "def AND import", "sum", 1, 5)
    assert(gAnd == bruteHasChild("AND", "def AND import", "sum", 1, 5))
  }

  test("has_child max mode ranks repos like collapse's best-hit order") {
    // same champion score per repo, so the repo ORDER must agree with
    // collapse (which additionally reports the champion doc)
    val hc = gotHasChild("FREE", "def import match", "max", 1, 5)
    val cl = got("FREE", "def import match", 5)
    assert(hc.map(r => (r._1, r._3)) == cl.map(r => (r._1, r._3)))
  }

  test("has_child validation + empty results") {
    assert(gotHasChild("FREE", "zzznotaterm", "sum", 1, 5).isEmpty)
    intercept[IllegalArgumentException](
      searcher.hasChildHits("FREE", "def", "median", 1, 5))
    intercept[IllegalArgumentException](
      searcher.hasChildHits("FREE", "def", "sum", 0, 5))
    intercept[IllegalArgumentException](
      searcher.hasChildHits("PHRASE", "\"a b\"", "sum", 1, 5))
  }
}
