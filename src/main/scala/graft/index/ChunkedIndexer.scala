package graft.index

import org.apache.spark.sql.SparkSession

import graft.build.{BuildParams, DocIds, PartRange, SegmentBuilder}
import graft.corpus.CorpusSource

/** Chunked, resumable index build — SURVEY §2.6.
  *
  * The corpus is globally numbered once (P4/P5: docId = global sort rank
  * — invariant to partitioning, scheduling, and restarts), then split
  * into fixed docId-range chunks; each chunk builds an independent
  * segment. Resume (R2) = skip every chunk whose segment directory was
  * atomically committed (IndexStorage's tmp+rename protocol); a re-run
  * re-derives identical docIds, so resumed chunks are byte-identical to
  * a never-interrupted build (R3 — proven in ResumeSpec).
  *
  * This is the Iceberg-snapshot-checkpoint emulation forced by the
  * sandbox (SURVEY §1.1): `source.snapshotId` + the manifest's input-file
  * listing pin the input; swapping in IcebergCorpusSource gives real
  * snapshot ids without touching this class.
  */
final class ChunkedIndexer(indexDir: String, chunkDocs: Long,
                           params: BuildParams = BuildParams()) {
  require(chunkDocs % params.bucketSize == 0 || chunkDocs < params.bucketSize,
    "chunkDocs should be a multiple of bucketSize so buckets don't straddle segments")

  /** Build all missing chunks; returns (segment dirs, chunks built now). */
  def build(spark: SparkSession, source: CorpusSource): (Seq[String], Int) = {
    import spark.implicits._
    val (numbered, ranges, freeNumbered) = DocIds.assign(source.read(spark), params.numPartitions)
    try {
      val numDocs = ranges.map(_.count).sum
      val numChunks = math.max(1, ((numDocs + chunkDocs - 1) / chunkDocs).toInt)
      val inputFiles = source.inputFiles(spark)
      var builtNow = 0
      val dirs = (0 until numChunks).map { c =>
        val lo = c * chunkDocs
        val hi = math.min(numDocs, (c + 1) * chunkDocs)
        if (!IndexStorage.exists(indexDir, c.toLong)) {
          val chunk = numbered.filter(r => r.docId >= lo && r.docId < hi)
          val chunkRanges = Array(PartRange(c, lo, hi - lo))
          val (seg, _) = SegmentBuilder.buildFromNumbered(spark, chunk,
            chunkRanges, source.snapshotId, inputFiles,
            params.copy(segId = c.toLong))
          IndexStorage.write(seg, indexDir)
          seg.unpersist()
          builtNow += 1
        }
        IndexStorage.segDir(indexDir, c.toLong).toString
      }
      (dirs, builtNow)
    } finally freeNumbered()
  }
}
