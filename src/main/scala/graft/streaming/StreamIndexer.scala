package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.build.{BuildParams, DocIds, SegmentBuilder}
import graft.corpus.CorpusSource
import graft.index.IndexStorage
import graft.model.{CorpusRow, NumberedRow}

/** Incremental (streaming) index ingestion — the LSM write path as a
  * Structured Streaming sink: new corpus files → one segment per
  * micro-batch, exactly-once via the streaming checkpoint.
  *
  * `Trigger.AvailableNow` drains everything currently unprocessed and
  * stops — the "incremental segment append" posture (SURVEY §2.5
  * "Streaming" row): re-running after more files land indexes ONLY the
  * new files (checkpoint = processed-file log), appending segments that
  * MultiSearcher reads merge-on-read and SegmentMerger compacts.
  *
  * DocId semantics differ from the batch build by design: batch ids are
  * the global key rank over a frozen snapshot; streaming ids are
  * arrival-ordered (key rank WITHIN each batch, offset by the docs
  * already indexed, base aligned up to a bucket boundary so buckets
  * never straddle segments). Ids stay dense-per-segment, globally
  * unique, and deterministic given the same batch sequence.
  */
final class StreamIndexer(val indexDir: String,
                          val params: BuildParams = BuildParams()) {

  /** Highest segId present + docId high-watermark (1 + max docId across
    * committed segments, from the tiny stats.json files — no Spark jobs).
    * The watermark, NOT sum(numDocs), must seed the next id base: aligned
    * bases insert gaps, so from the third non-aligned batch on a
    * sum-derived base can land BELOW an earlier segment's last docId and
    * duplicate ids across segments (e.g. bucketSize=100, batches 150
    * then 50: seg1 spans [200,250) but ceil(200/100)*100 = 200). */
  private def state(): (Long, Long) = {
    val dir = Paths.get(indexDir)
    if (!Files.exists(dir)) return (-1L, 0L)
    import scala.jdk.CollectionConverters._
    val listing = Files.list(dir)
    val segs =
      try listing.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("seg-") &&
          Files.exists(p.resolve("stats.json")))
        .toSeq
      finally listing.close()
    val stats = segs.map(IndexStorage.readStatsOnly)
    val maxSeg = (Seq(-1L) ++ stats.map(_.segId)).max
    val hwm = (Seq(0L) ++ stats.map(_.docIdHwm)).max
    (maxSeg, hwm)
  }

  /** Index one micro-batch as a new segment. */
  private def indexBatch(spark: SparkSession, batch: DataFrame, batchId: Long): Unit = {
    import spark.implicits._
    if (batch.isEmpty) return
    val (maxSeg, hwm) = state()
    // align the id base up from the high-watermark so buckets never
    // straddle segments and no base can collide with an earlier segment
    val bs = params.bucketSize
    val base = ((hwm + bs - 1) / bs) * bs
    val assigned = DocIds.assign(batch.as[CorpusRow], params.numPartitions)
    val numbered0 = assigned._1
    val ranges0 = assigned._2
    val free = assigned._3
    try {
      val numbered = numbered0.map(r => NumberedRow(r.docId + base,
        r.repo, r.path, r.commit, r.lang, r.content))
      val ranges = ranges0.map(r => r.copy(firstId = r.firstId + base))
      val (seg, _) = SegmentBuilder.buildFromNumbered(spark, numbered,
        ranges, snapshotId = batchId, inputFiles = Array.empty,
        params.copy(segId = maxSeg + 1))
      IndexStorage.write(seg, indexDir)
      seg.unpersist()
    } finally free()
  }

  /** Drain all unprocessed corpus files under `srcDir` into new segments. */
  def runAvailableNow(spark: SparkSession, srcDir: String): Unit = {
    val stream = spark.readStream
      .schema(CorpusSource.schema)
      .parquet(srcDir)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$indexDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        indexBatch(batch.sparkSession, batch, batchId)
      }
      .start()
    q.awaitTermination()
  }
}
