package graft

import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.DatasetCorpusSource
import graft.model.CorpusRow
import graft.search.Searcher

/** Query relaxation (Searcher.relaxedHits): the OOV drop, the
  * highest-df-first ladder, the no-relaxation identity, and the
  * all-OOV empty edge. Corpus planted so the full 3-term AND is EMPTY
  * (alpha/beta/gamma pairwise co-occur, never all three). */
class RelaxSpec extends SparkSpec {

  lazy val seg = {
    import spark.implicits._
    val docs = Seq(
      "alpha beta common", // pairwise, never all three
      "beta gamma common",
      "alpha gamma common",
      "alpha solo words here",
      "beta solo words here").zipWithIndex.map { case (text, i) =>
      CorpusRow("r0", f"f$i%03d.txt", "c0", "txt", text)
    }
    SegmentBuilder.build(spark, DatasetCorpusSource(docs.toDS()),
      BuildParams(numPartitions = 4, bucketSize = 64))._1
  }
  lazy val searcher = new Searcher(spark, seg)

  test("an empty AND relaxes by dropping the highest-df term (term-asc tie)") {
    // dfs: alpha 3, beta 3, gamma 2 — tie between alpha and beta breaks
    // term-asc, so 'alpha' drops first; (beta AND gamma) matches doc 1
    val plan = searcher.relaxPlan("alpha AND beta AND gamma")
    assert(plan.toSeq == Seq("beta", "gamma"), plan.mkString(","))
    val relaxed = searcher.relaxedHits("alpha AND beta AND gamma", 10)
      .collect().toSeq
    val direct = searcher.hits("AND", "beta AND gamma", 10).collect().toSeq
    assert(relaxed == direct && relaxed.nonEmpty)
  }

  test("OOV terms drop before any ladder step") {
    val plan = searcher.relaxPlan("alpha AND beta AND zzqxunknown")
    assert(plan.toSeq == Seq("alpha", "beta"))
    val relaxed = searcher.relaxedHits("alpha AND beta AND zzqxunknown", 10)
      .collect().toSeq
    assert(relaxed == searcher.hits("AND", "alpha AND beta", 10).collect().toSeq)
    assert(relaxed.nonEmpty)
  }

  test("a satisfiable AND is returned unrelaxed, bit-identically") {
    val relaxed = searcher.relaxedHits("alpha AND beta", 10).collect().toSeq
    assert(relaxed == searcher.hits("AND", "alpha AND beta", 10).collect().toSeq)
    assert(searcher.relaxPlan("alpha AND beta").toSeq == Seq("alpha", "beta"))
  }

  test("the ladder can relax to a single term; all-OOV is empty") {
    // solo (df 2) co-occurs with alpha only in doc 3... plant: 'solo'
    // and 'common' never co-occur, dfs: common 3 > solo 2 — 'common'
    // drops, leaving (solo) single-term
    val plan = searcher.relaxPlan("common AND solo")
    assert(plan.toSeq == Seq("solo"))
    assert(searcher.relaxedHits("common AND solo", 10).collect().toSeq ==
      searcher.hits("AND", "solo", 10).collect().toSeq)
    assert(searcher.relaxedHits("zzq AND xxp", 10).collect().isEmpty)
    assert(searcher.relaxPlan("zzq AND xxp").isEmpty)
  }
}
