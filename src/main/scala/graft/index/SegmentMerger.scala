package graft.index

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.build.{BuildParams, DocIds, Segment, SegmentBuilder}
import graft.model._
import graft.search.ExactScorer

/** Log-structured segment merge — SURVEY §2.3 I7, north-rule operator
  * "log-structured segment merge expressed in Catalyst (sort-merge
  * cogroup on term)".
  *
  * Segments hold disjoint, ordered docId ranges (ChunkedIndexer), but a
  * merged index needs GLOBAL statistics: df, idf, and avgdl all change,
  * and the per-posting impacts baked into the block-max metadata with
  * them. A merge therefore re-scores: the per-segment dictionaries are
  * combined with a sort-merge cogroup on term (df/cf add), termIds are
  * re-assigned densely over the merged vocabulary, and postings are
  * decoded to (docId, term, tf, dl) rows and re-encoded through the
  * builder's salted shuffle with the merged stats — the same rewrite an
  * LSM compaction performs. Queries over a merged segment then prune
  * with exactly-valid block maxima; for un-merged multi-segment reads use
  * the exhaustive (unpruned) path, whose scores the stale bounds cannot
  * corrupt.
  */
object SegmentMerger {

  /** Sort-merge cogroup of two dictionaries on term (df/cf summed).
    * KeyValueGroupedDataset.cogroup plans as a Catalyst CoGroup over two
    * sort-merged children. termIds re-assigned densely afterwards. */
  def mergeDicts(spark: SparkSession, a: Dataset[DictEntry], b: Dataset[DictEntry],
                 numPartitions: Int): Dataset[DictEntry] = {
    import spark.implicits._
    val merged = a.groupByKey(_.term).cogroup(b.groupByKey(_.term)) { (term, xa, xb) =>
      var df = 0L; var cf = 0L
      xa.foreach { e => df += e.df; cf += e.cf }
      xb.foreach { e => df += e.df; cf += e.cf }
      Iterator.single((term, df, cf))
    }
    val sorted = merged.repartitionByRange(numPartitions, $"_1")
      .sortWithinPartitions($"_1")
    val (dict, _, free) = DocIds.denseIds(sorted) { (id, r) =>
      DictEntry(id, r._1, r._2, r._3)
    }
    val out = dict.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    free()
    out
  }

  /** Merge two segments with disjoint docId ranges into one. */
  def merge(spark: SparkSession, a: Segment, b: Segment,
            params: BuildParams): (Segment, graft.build.BuildReport) = {
    import spark.implicits._
    val t0 = System.nanoTime()
    require(a.params.bucketSize == params.bucketSize &&
      b.params.bucketSize == params.bucketSize,
      "merge requires a uniform bucketSize")
    require(a.params.positional == params.positional &&
      b.params.positional == params.positional,
      "merge requires uniform positional codec version")

    val docs = a.docs.unionByName(b.docs).persist(StorageLevel.MEMORY_AND_DISK)
    val (numDocs, totalTokens) = docs
      .agg(count(lit(1)), coalesce(sum($"docLen".cast("long")), lit(0L)))
      .as[(Long, Long)].head()
    val avgdl = if (numDocs == 0) 1.0 else totalTokens.toDouble / numDocs

    val dict = mergeDicts(spark, a.dict, b.dict, params.numPartitions)
    val numTerms = dict.count()

    // decode each side's postings back to (docId, term, tf, dl) rows and
    // re-encode under the merged dict/stats (term strings resolved via
    // each side's own dictionary; dl via each side's docs)
    def tfRows(s: Segment) = {
      val decoded =
        if (params.positional)
          ExactScorer.decodedPostingsPos(spark, s).toDF("termId", "docId", "tf", "pos")
        else ExactScorer.decodedPostings(spark, s).toDF("termId", "docId", "tf")
      val posCols = if (params.positional) Seq($"pos") else Nil
      decoded
        .join(s.dict.select($"termId", $"term"), "termId")
        .join(s.docs.select($"docId", $"docLen".as("dl")), "docId")
        .select((Seq($"docId", $"term", $"tf", $"dl") ++ posCols): _*)
    }
    val tfAll = tfRows(a).unionByName(tfRows(b))
    val postings = SegmentBuilder
      .encodePostings(spark, tfAll, dict, numDocs, avgdl, params)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (numPostings, bytesCompressed) = postings
      .agg(coalesce(sum($"numDocs".cast("long")), lit(0L)),
        coalesce(sum(length($"bytes").cast("long")), lit(0L)))
      .as[(Long, Long)].head()

    val doclens = SegmentBuilder.doclenBlocks(docs, params.bucketSize)
      .persist(StorageLevel.MEMORY_AND_DISK)
    doclens.count()

    val buildMillis = (System.nanoTime() - t0) / 1000000
    val meta = a.meta.unionByName(b.meta)
      .withColumn("segId", lit(params.segId)).as[SegmentMeta]
    val stats = CorpusStats(numDocs, avgdl, numTerms, numPostings)
    val report = graft.build.BuildReport(numDocs, numTerms, numPostings,
      totalTokens, bytesCompressed, buildMillis)
    (Segment(docs, dict, postings, doclens, stats, meta, params), report)
  }

  /** Compaction-time tombstone PURGE — the other half of LSM deletes
    * (query-time filtering is Searcher.deletedHits). Rewrites one
    * segment without the deleted documents: postings are decoded,
    * inner-joined to the surviving docmap (which both filters deletes
    * and supplies doc lengths), and re-encoded under RECOMPUTED global
    * statistics (df/cf per term, N, avgdl — and with them every baked
    * impact and block maximum); terms whose postings all died drop out
    * of the dictionary and termIds re-densify in term order (I1
    * invariant preserved). Surviving documents KEEP their docIds, so
    * doclen blocks carry over unchanged — entries at deleted offsets are
    * unreferenced (the Lucene posture: id re-densification happens only
    * in a full rebuild, not per compaction).
    *
    * Scale shape: one anti-join of the docmap against the delete set
    * (broadcast when small — the common case), one decode→join→encode
    * pass over the postings; no driver collect of anything corpus-sized. */
  def purge(spark: SparkSession, s: Segment, deleted: Dataset[Long],
            params: BuildParams): (Segment, graft.build.BuildReport) = {
    import spark.implicits._
    val t0 = System.nanoTime()
    require(s.params.bucketSize == params.bucketSize,
      "purge requires the segment's bucketSize")
    require(s.params.positional == params.positional,
      "purge requires the segment's positional codec version")

    val del = deleted.toDF("docId")
    val docs = s.docs.join(del, Seq("docId"), "left_anti").as[Doc]
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (numDocs, totalTokens) = docs
      .agg(count(lit(1)), coalesce(sum($"docLen".cast("long")), lit(0L)))
      .as[(Long, Long)].head()
    val avgdl = if (numDocs == 0) 1.0 else totalTokens.toDouble / numDocs

    // surviving (docId, term, tf, dl[, pos]) rows: the inner join with
    // the surviving docmap IS the delete filter (and the dl source)
    val decoded =
      if (params.positional)
        ExactScorer.decodedPostingsPos(spark, s).toDF("termId", "docId", "tf", "pos")
      else ExactScorer.decodedPostings(spark, s).toDF("termId", "docId", "tf")
    val posCols = if (params.positional) Seq($"pos") else Nil
    val tfAll = decoded
      .join(s.dict.select($"termId", $"term"), "termId")
      .join(docs.select($"docId", $"docLen".as("dl")), "docId")
      .select((Seq($"docId", $"term", $"tf", $"dl") ++ posCols): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // post-purge dictionary: df/cf recomputed from survivors, dead terms
    // dropped, dense termIds reassigned in term sort order
    val grouped = tfAll.groupBy($"term")
      .agg(count(lit(1)).cast("long").as("df"), sum($"tf".cast("long")).as("cf"))
      .as[(String, Long, Long)]
    val sorted = grouped.repartitionByRange(params.numPartitions, $"term")
      .sortWithinPartitions($"term")
    val (dict0, _, free) = DocIds.denseIds(sorted) { (id, r) =>
      DictEntry(id, r._1, r._2, r._3)
    }
    val dict = dict0.persist(StorageLevel.MEMORY_AND_DISK)
    val numTerms = dict.count()
    free()

    val postings = SegmentBuilder
      .encodePostings(spark, tfAll, dict, numDocs, avgdl, params,
        numTermsHint = numTerms)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (numPostings, bytesCompressed) = postings
      .agg(coalesce(sum($"numDocs".cast("long")), lit(0L)),
        coalesce(sum(length($"bytes").cast("long")), lit(0L)))
      .as[(Long, Long)].head()
    tfAll.unpersist()

    val buildMillis = (System.nanoTime() - t0) / 1000000
    val meta = s.meta.withColumn("segId", lit(params.segId)).as[SegmentMeta]
    val stats = CorpusStats(numDocs, avgdl, numTerms, numPostings)
    val report = graft.build.BuildReport(numDocs, numTerms, numPostings,
      totalTokens, bytesCompressed, buildMillis)
    (Segment(docs, dict, postings, s.doclens, stats, meta, params), report)
  }

  /** Apply the index's persisted tombstone log to one committed segment
    * — the background-compaction step of the LSM lifecycle: read the
    * delete log, purge, atomically replace the segment directory, clear
    * the consumed batches. Returns false (no work) when the log is
    * empty. Crash ordering: the purged segment commits BEFORE the log
    * clears — a crash between the two re-applies already-purged deletes
    * on the next compact, which is a no-op, never a loss. */
  def compact(spark: SparkSession, indexDir: String, segId: Long): Boolean = {
    val deleted = IndexStorage.readTombstones(spark, indexDir)
    if (deleted.isEmpty) return false
    val seg = IndexStorage.read(spark, IndexStorage.segDir(indexDir, segId).toString)
    val (purged, _) = purge(spark, seg, deleted, seg.params)
    IndexStorage.write(purged, indexDir)
    purged.unpersist()
    IndexStorage.clearTombstones(indexDir)
    true
  }
}
