package graft

import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.{DatasetCorpusSource, Synthesizer}
import graft.search.Searcher

/** Batched multi-query execution (Searcher.batchHits): per query
  * bit-identical to the single-query path, one action for the whole
  * batch, unsatisfiable queries contribute nothing, bad input rejected. */
class MsearchSpec extends SparkSpec {

  lazy val seg = SegmentBuilder.build(spark,
    DatasetCorpusSource(Synthesizer.tiny(spark)),
    BuildParams(numPartitions = 4, bucketSize = 64))._1
  lazy val searcher = new Searcher(spark, seg)

  private def batchOf: Seq[(Long, String, String)] = {
    val vocab = seg.dict.collect().sortBy(e => (-e.df, e.term))
    val Array(a, b, c) = vocab.take(3).map(_.term)
    Seq(
      (1L, "FREE", s"$a $b $c"),
      (2L, "AND", s"$a AND $b"),
      (3L, "OR", s"$a OR $c"),
      (4L, "PREFIX", s"${a.take(2)}*"),
      (5L, "FUZZY", s"$a~1"),
      (6L, "FREE", s"$a^2 $b"), // boosted
      (7L, "AND", s"$a AND zzqxunknown")) // unsatisfiable: no rows
  }

  test("batchHits == hits per query, bit-identically, across kinds") {
    val k = 7
    val got = searcher.batchHits(batchOf, k).collect()
      .groupBy(_.qid).view.mapValues(_.sortBy(_.rank).toSeq).toMap
    batchOf.foreach { case (qid, kind, text) =>
      val want = searcher.hits(kind, text, k, qid).collect().sortBy(_.rank).toSeq
      assert(got.getOrElse(qid, Seq.empty) == want,
        s"qid=$qid $kind '$text'")
    }
    assert(!got.contains(7L), "unsatisfiable AND must contribute no rows")
    assert(got(1L).nonEmpty && got(2L).nonEmpty)
  }

  test("the batch amortizes scheduling: constant jobs, not one per query") {
    val sc = spark.sparkContext
    val batch = searcher.batchHits(batchOf, 5)
    batch.count() // warm dict lookups / driver-side planning
    sc.setJobGroup("msearch-gate", "batch")
    try batch.collect() finally sc.clearJobGroup()
    val batchJobs = sc.statusTracker.getJobIdsForGroup("msearch-gate").length
    // AQE runs each query stage as its own job (scan+walk, rank window,
    // result fetch) — a small CONSTANT; per-query execution pays ≥1 job
    // per query, so the batch must stay strictly below the query count
    val live = batchOf.filterNot(_._1 == 7L)
    sc.setJobGroup("msearch-loop", "per-query")
    try live.foreach { case (qid, kind, text) =>
      searcher.hits(kind, text, 5, qid).collect()
    } finally sc.clearJobGroup()
    val loopJobs = sc.statusTracker.getJobIdsForGroup("msearch-loop").length
    assert(batchJobs <= 4, s"batch job count grew: $batchJobs")
    assert(loopJobs >= live.size, s"loop ran $loopJobs jobs for ${live.size} queries")
    assert(batchJobs < loopJobs, s"batch $batchJobs !< loop $loopJobs")
  }

  test("duplicate qids and unsupported kinds are rejected") {
    intercept[IllegalArgumentException] {
      searcher.batchHits(Seq((1L, "FREE", "a"), (1L, "FREE", "b")), 5)
    }
    intercept[IllegalArgumentException] {
      searcher.batchHits(Seq((1L, "PHRASE", "\"a b\"")), 5)
    }
    intercept[IllegalArgumentException] {
      searcher.batchHits(Seq.empty, 5)
    }
  }
}
