package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.build.{BuildParams, DocIds, Segment, SegmentBuilder}
import graft.corpus.{DatasetCorpusSource, Synthesizer}
import graft.index.{ChunkedIndexer, Compaction, IndexStorage}
import graft.model.NumberedRow
import graft.search.{MultiSearcher, Searcher}

/** Size-tiered compaction: pure planning, N-way merge identity, the
  * manifest/intent crash protocol, and the end-to-end round. */
class CompactionSpec extends SparkSpec {

  import graft.index.IndexStorage.SegStats

  private def st(id: Long, docs: Long): SegStats = SegStats(id, docs, docs, 64)

  // ── plan(): pure size-tiered selection ─────────────────────────────

  test("plan groups similar sizes, leaves the out-of-tier giant alone") {
    val segs = Seq(st(0, 100000), st(1, 110), st(2, 100), st(3, 95), st(4, 40))
    val plans = Compaction.plan(segs, Compaction.Policy(tierFactor = 4.0))
    // 40..110 are within 4x of the group minimum (40); 100000 is not
    assert(plans == Seq(Seq(4, 3, 2, 1)))
    // a tiny straggler below the tier of the rest starts its own
    // (suppressed, size-1) group and the rest still merge
    val strag = Seq(st(0, 12), st(1, 95), st(2, 100), st(3, 110))
    assert(Compaction.plan(strag, Compaction.Policy(tierFactor = 4.0)) ==
      Seq(Seq(1, 2, 3)))
  }

  test("plan respects maxMerge and minMerge") {
    val five = (0 until 5).map(i => st(i, 100 + i))
    val capped = Compaction.plan(five,
      Compaction.Policy(tierFactor = 4.0, minMerge = 2, maxMerge = 3))
    assert(capped.map(_.size) == Seq(3, 2))
    assert(capped.flatten.sorted == (0L until 5L))
    // a lone pair below minMerge=3 is suppressed
    val two = Seq(st(0, 100), st(1, 100))
    assert(Compaction.plan(two,
      Compaction.Policy(tierFactor = 4.0, minMerge = 3, maxMerge = 3)).isEmpty)
    assert(Compaction.plan(Seq(st(0, 100)), Compaction.Policy()).isEmpty)
    assert(Compaction.plan(Seq.empty, Compaction.Policy()).isEmpty)
  }

  test("plan ties break by segId and zero-doc segments group safely") {
    val segs = Seq(st(7, 0), st(3, 0), st(5, 2))
    val plans = Compaction.plan(segs, Compaction.Policy(tierFactor = 4.0))
    assert(plans == Seq(Seq(3, 7, 5)))
  }

  // ── shared 4-chunk fixture over the synthetic corpus ───────────────

  val params: BuildParams =
    BuildParams(numPartitions = 8, bucketSize = 100, positional = true)

  private def freshIndex(): String = {
    val dir = Files.createTempDirectory("graft-compaction").toString
    val indexer = new ChunkedIndexer(dir, chunkDocs = 50, params)
    val (dirs, _) = indexer.build(spark,
      DatasetCorpusSource(Synthesizer.tiny(spark)))
    assert(dirs.size == 4) // 200 docs / 50
    dir
  }

  def fingerprint(s: Segment): Seq[(Int, Long, Int, String)] = {
    import spark.implicits._
    s.postings.map(pl => (pl.bucket, pl.termId, pl.numDocs,
      java.util.Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("SHA-256").digest(pl.bytes))))
      .collect().sortBy(r => (r._1, r._2)).toSeq
  }

  test("mergeAll of 4 chunks == the single-segment build bit-for-bit") {
    val dir = freshIndex()
    val segs = Compaction.listLive(dir).map(s =>
      IndexStorage.read(spark, IndexStorage.segDir(dir, s.segId).toString))
    val (merged, report) = Compaction.mergeAll(spark, segs,
      params.copy(segId = 99))
    val mono = SegmentBuilder.build(spark,
      DatasetCorpusSource(Synthesizer.tiny(spark)), params)._1
    assert(merged.stats == mono.stats)
    assert(report.numDocs == mono.stats.numDocs)
    assert(fingerprint(merged) == fingerprint(mono),
      "N-way merged postings must be byte-identical to a from-scratch build")
    assert(merged.dict.collect().sortBy(_.termId).toSeq ==
      mono.dict.collect().sortBy(_.termId).toSeq)
    merged.unpersist(); mono.unpersist()
  }

  test("run(): merges to one live segment, queries identical, inputs gone") {
    val dir = freshIndex()
    val before = Compaction.listLive(dir)
    assert(before.size == 4)
    // pre-compaction answers via merge-on-read
    val segsBefore = before.map(s =>
      IndexStorage.read(spark, IndexStorage.segDir(dir, s.segId).toString))
    val terms = segsBefore.head.dict.orderBy(desc("cf")).limit(3)
      .collect().map(_.term)
    val queries = Seq(("FREE", terms.mkString(" ")),
      ("AND", terms.take(2).mkString(" AND ")),
      ("PHRASE", "\"" + terms.take(2).mkString(" ") + "\""))
    val want = queries.map { case (kind, text) =>
      new MultiSearcher(spark, segsBefore).hits(kind, text, 20).collect()
        .map(h => (h.rank, h.docId, h.score)).toSeq
    }

    val newIds = Compaction.run(spark, dir)
    assert(newIds.size == 1 && newIds.head == 4L)
    val after = Compaction.listLive(dir)
    assert(after.map(_.segId) == Seq(4L))
    // consumed inputs physically deleted, intent cleared
    assert(Compaction.scanSegments(dir).map(_.segId) == Seq(4L))
    assert(Compaction.readInflight(dir).isEmpty)
    assert(Compaction.readManifest(dir).contains(Seq(4L)))

    // the compacted segment answers every query identically (WAND-pruned
    // single-segment path vs the exhaustive merge-on-read it replaced)
    val seg = IndexStorage.read(spark,
      IndexStorage.segDir(dir, 4L).toString)
    val searcher = new Searcher(spark, seg)
    queries.zip(want).foreach { case ((kind, text), w) =>
      val got = searcher.hits(kind, text, 20).collect()
        .map(h => (h.rank, h.docId, h.score)).toSeq
      assert(got == w && got.nonEmpty, s"$kind '$text'")
    }
    // idempotent: nothing left to merge
    assert(Compaction.run(spark, dir).isEmpty)
  }

  test("crash before manifest commit rolls BACK: inputs stay authoritative") {
    val dir = freshIndex()
    val ids = Compaction.listLive(dir).map(_.segId)
    // simulate: intent written, one output committed, manifest NOT written
    val segs = ids.take(2).map(id =>
      IndexStorage.read(spark, IndexStorage.segDir(dir, id).toString))
    val (merged, _) = Compaction.mergeAll(spark, segs, params.copy(segId = 4))
    IndexStorage.write(merged, dir)
    merged.unpersist()
    Files.writeString(Paths.get(dir, "compaction.inflight"),
      """{"outputs":[4],"inputs":[0,1]}""")

    // a READER in the crash window: output invisible, inputs live
    assert(Compaction.listLive(dir).map(_.segId) == Seq(0L, 1L, 2L, 3L))
    // repair rolls back: output deleted, inputs intact, intent cleared
    val (fwd, back) = Compaction.repair(dir)
    assert(fwd.isEmpty && back == Seq(4L))
    assert(Compaction.scanSegments(dir).map(_.segId) == Seq(0L, 1L, 2L, 3L))
    assert(Compaction.readInflight(dir).isEmpty)
    // a subsequent round re-plans from scratch; the rolled-back id is
    // free again (its dir is gone and nothing ever referenced it)
    val newIds = Compaction.run(spark, dir)
    assert(newIds == Seq(4L))
    assert(Compaction.listLive(dir).map(_.segId) == Seq(4L))
  }

  test("crash after manifest commit rolls FORWARD: leftover inputs reclaimed") {
    val dir = freshIndex()
    val newIds = {
      // run a full round, then re-create the crash window artificially:
      // resurrect the intent file and a fake leftover input directory
      val out = Compaction.run(spark, dir)
      assert(out == Seq(4L))
      out
    }
    Files.writeString(Paths.get(dir, "compaction.inflight"),
      """{"outputs":[4],"inputs":[0,1,2,3]}""")
    Files.createDirectories(Paths.get(dir, "seg-00001"))
    Files.writeString(Paths.get(dir, "seg-00001", "stats.json"),
      """{"numDocs":50,"avgDocLen":1.0,"numTerms":1,"numPostings":1,""" +
        """"bucketSize":100,"segId":1,"numPartitions":8,""" +
        """"saltThreshold":1048576,"numSalts":16,"docIdHwm":100,"positional":1}""")
    // reader view: manifested output live, stale input NOT resurrected
    assert(Compaction.listLive(dir).map(_.segId) == newIds)
    val (fwd, back) = Compaction.repair(dir)
    assert(back.isEmpty && fwd == Seq(0L, 1L, 2L, 3L))
    assert(Compaction.scanSegments(dir).map(_.segId) == newIds)
    assert(Compaction.readInflight(dir).isEmpty)
  }

  test("streaming-style append above the manifest watermark stays live") {
    import spark.implicits._
    val dir = freshIndex()
    assert(Compaction.run(spark, dir) == Seq(4L))
    // append a segment the way StreamIndexer does: segId = maxSeg + 1,
    // docIds shifted past the high-watermark (bucket-aligned base 200)
    val (numbered0, ranges0, free) = DocIds.assign(
      Synthesizer.tiny(spark).limit(30), params.numPartitions)
    try {
      val numbered = numbered0.map(r => NumberedRow(r.docId + 200, r.repo,
        r.path, r.commit, r.lang, r.content))
      val ranges = ranges0.map(r => r.copy(firstId = r.firstId + 200))
      val (seg, _) = SegmentBuilder.buildFromNumbered(spark, numbered, ranges,
        snapshotId = 1L, inputFiles = Array.empty, params.copy(segId = 5))
      IndexStorage.write(seg, dir)
      seg.unpersist()
    } finally free()
    assert(Compaction.listLive(dir).map(_.segId) == Seq(4L, 5L))
    // tier gap (170 vs 30 docs under tierFactor 4) → no merge planned
    assert(Compaction.run(spark, dir,
      Compaction.Policy(tierFactor = 4.0)).isEmpty)
    // a permissive tier factor merges them
    assert(Compaction.run(spark, dir,
      Compaction.Policy(tierFactor = 100.0)) == Seq(6L))
    assert(Compaction.listLive(dir).map(_.segId) == Seq(6L))
  }
}
