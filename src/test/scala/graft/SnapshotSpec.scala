package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.LsmIndex
import graft.build.BuildParams
import graft.corpus.Synthesizer
import graft.index.Compaction

/** Snapshot generations over the LSM registry (the Lucene
  * IndexDeletionPolicy / Iceberg-snapshot family): a committed
  * generation pins the live segment set AND the delete-log
  * high-watermark; reads at that generation are bit-stable across later
  * appends, deletes, and compactions (whose merge inputs are retained
  * while referenced); purge is a documented barrier; expiry reclaims
  * everything no retained generation needs. */
class SnapshotSpec extends SparkSpec {

  val params: BuildParams =
    BuildParams(numPartitions = 4, bucketSize = 100, positional = true)

  private def fresh(): (LsmIndex, String, Seq[graft.model.CorpusRow]) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snap").toString
    val idx = new LsmIndex(spark, dir, params, retainSnapshots = 3)
    val rows = Synthesizer.tiny(spark).collect().sortBy(r => (r.repo, r.path)).toSeq
    idx.append(spark.createDataset(rows.take(80)))
    idx.append(spark.createDataset(rows.slice(80, 140)))
    (idx, dir, rows)
  }

  private def topTerm(idx: LsmIndex): String =
    idx.liveSegments().head.dict.orderBy(desc("df")).limit(1).collect().head.term

  test("snapshot reads are bit-stable across appends, deletes and compaction") {
    import spark.implicits._
    val (idx, dir, rows) = fresh()
    val q = topTerm(idx)
    val gen1 = idx.snapshot()
    val at1 = idx.hits("FREE", q, 50).collect()
      .map(h => (h.rank, h.docId, h.score)).toSeq
    assert(at1.nonEmpty)

    // mutate: append more docs, delete some, compact (merges segments)
    idx.append(spark.createDataset(rows.drop(140)))
    idx.delete(col("repo") === rows.head.repo)
    val gen2 = idx.snapshot()
    val at2 = idx.hits("FREE", q, 50).collect()
      .map(h => (h.rank, h.docId, h.score)).toSeq
    // gen2 sees the appends+deletes; gen1 must not
    assert(idx.hitsAt(gen2, "FREE", q, 50).collect()
      .map(h => (h.rank, h.docId, h.score)).toSeq == at2)
    assert(idx.hitsAt(gen1, "FREE", q, 50).collect()
      .map(h => (h.rank, h.docId, h.score)).toSeq == at1)

    // compaction with retention: gen1/gen2 still read bit-identically
    // (merge inputs stay on disk), while the live read moves on
    val merged = Compaction.run(spark, dir, retainInputs = true)
    assert(merged.nonEmpty, "fixture must produce a merge round")
    assert(idx.hitsAt(gen1, "FREE", q, 50).collect()
      .map(h => (h.rank, h.docId, h.score)).toSeq == at1)
    assert(idx.hitsAt(gen2, "FREE", q, 50).collect()
      .map(h => (h.rank, h.docId, h.score)).toSeq == at2)
  }

  test("delete-log watermark: a snapshot excludes only its own deletes") {
    import spark.implicits._
    val (idx, _, rows) = fresh()
    val q = topTerm(idx)
    idx.delete(col("repo") === rows.head.repo)
    val gen = idx.snapshot()
    val at = idx.hits("FREE", q, 100).collect().map(_.docId).toSet
    // later deletes are invisible to the pinned generation
    idx.delete(col("repo") === rows.last.repo)
    val pinned = idx.hitsAt(gen, "FREE", q, 100).collect().map(_.docId).toSet
    assert(pinned == at)
    assert(idx.hits("FREE", q, 100).collect().map(_.docId).toSet.subsetOf(at))
  }

  test("expiry reclaims merge inputs no generation references") {
    import spark.implicits._
    val (idx, dir, rows) = fresh()
    idx.snapshot()
    idx.append(spark.createDataset(rows.drop(140)))
    val preIds = Compaction.scanSegments(dir).map(_.segId).toSet
    val merged = Compaction.run(spark, dir, retainInputs = true)
    assert(merged.nonEmpty)
    // inputs retained while the generation lives
    assert(preIds.subsetOf(Compaction.scanSegments(dir).map(_.segId).toSet))
    val (expired, reclaimed) = idx.expireSnapshots(keepLast = 0)
    assert(expired.nonEmpty && reclaimed.nonEmpty)
    // reclaimed = exactly the consumed inputs; live set intact
    val after = Compaction.scanSegments(dir).map(_.segId).toSet
    assert(after == Compaction.listLive(dir).map(_.segId).toSet)
    val q = topTerm(idx)
    assert(idx.hits("FREE", q, 10).collect().nonEmpty)
  }

  test("purge is a snapshot barrier: maintain with tombstones expires history") {
    import org.apache.spark.sql.functions.col
    val (idx, dir, rows) = fresh()
    val gen = idx.snapshot()
    idx.delete(col("repo") === rows.head.repo)
    idx.maintain()
    assert(!Compaction.generations(dir).contains(gen),
      "pre-purge generations must be expired by the in-place rewrite")
    intercept[IllegalArgumentException] { idx.hitsAt(gen, "FREE", "x", 5) }
  }

  test("snapshot() requires retention at construction") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snap0").toString
    val idx = new LsmIndex(spark, dir, params)
    idx.append(spark.createDataset(Synthesizer.tiny(spark).collect().take(30).toSeq))
    intercept[IllegalArgumentException] { idx.snapshot() }
  }
}
