package graft.index

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.build.{BuildParams, BuildReport, DocIds, Segment, SegmentBuilder}
import graft.model._

/** Size-tiered compaction over a stored multi-segment index — the LSM
  * background-maintenance loop (the policy family of Lucene's
  * TieredMergePolicy and Cassandra's size-tiered compaction strategy).
  *
  * Chunked and streamed builds accumulate segments; merge-on-read
  * (MultiSearcher) keeps queries correct over any number of them but
  * pays per-segment dictionary lookups and loses WAND pruning (global
  * stats invalidate stored block maxima). Compaction restores the
  * single-segment fast path by merging segments of SIMILAR size — the
  * tiering rule that bounds per-document rewrite amplification to
  * O(log N) over an index's lifetime, vs O(N) for always-merge-into-one.
  *
  * ## Registry + crash protocol
  *
  * The live segment set is committed in `indexDir/segments.json`;
  * segments appended after the manifest was last written (streaming
  * appends don't rewrite it) have segIds above its high-watermark —
  * StreamIndexer allocates monotonically — and fold back into the live
  * set. A compaction round is made crash-safe by a write-ahead intent
  * file (`compaction.inflight`, recording planned output and input ids)
  * committed BEFORE any merge output:
  *
  *   repair → write inflight → commit merged dirs → commit manifest
  *          → delete inputs → delete inflight
  *
  * `repair` resolves a crashed round from the intent file: outputs the
  * manifest references roll FORWARD (delete leftover inputs); outputs it
  * doesn't roll BACK (delete the outputs — the inputs remain
  * authoritative until the manifest says otherwise). `listLive` applies
  * the same rule without mutating anything, so concurrent readers never
  * see an input and its merged output at the same time.
  */
object Compaction {

  /** Tiering knobs. `tierFactor` is the max size ratio (in documents)
    * between the largest and smallest member of one merge; `minMerge`
    * suppresses merges too small to pay for their rewrite; `maxMerge`
    * caps fan-in so one merge's shuffle stays bounded. */
  final case class Policy(tierFactor: Double = 4.0, minMerge: Int = 2,
                          maxMerge: Int = 10) {
    require(tierFactor >= 1.0 && minMerge >= 2 && maxMerge >= minMerge)
  }

  private def manifestPath(indexDir: String): Path =
    Paths.get(indexDir, "segments.json")
  private def inflightPath(indexDir: String): Path =
    Paths.get(indexDir, "compaction.inflight")

  /** Atomically commit the live segId set. */
  def writeManifest(indexDir: String, live: Seq[Long]): Unit =
    atomicWrite(manifestPath(indexDir),
      live.sorted.mkString("{\"live\":[", ",", "]}"))

  def readManifest(indexDir: String): Option[Seq[Long]] =
    if (!Files.exists(manifestPath(indexDir))) None
    else Some(readIdArray(Files.readString(manifestPath(indexDir)), "live"))

  // ── snapshot generations (time-travel reads; Lucene
  // IndexDeletionPolicy / Iceberg snapshot family) ─────────────────────
  // `segments-<gen>.json` is a CLOSED manifest: the exact live segId set
  // plus the delete-log high-watermark (committed tombstone batches) at
  // commit time. Snapshots survive appends (closed list) and compactions
  // (merge inputs are retained while any snapshot may reference them —
  // see `run(retainInputs)`); a purge (`LsmIndex.maintain` with live
  // tombstones) rewrites segment dirs IN PLACE and is therefore a
  // snapshot barrier — callers expire snapshots across it.

  private def snapshotPath(indexDir: String, gen: Long): Path =
    Paths.get(indexDir, f"segments-$gen%05d.json")

  /** Committed snapshot generations, ascending. */
  def generations(indexDir: String): Seq[Long] = {
    val dir = Paths.get(indexDir)
    if (!Files.isDirectory(dir)) return Seq.empty
    val listing = Files.list(dir)
    try listing.iterator().asScala
      .map(_.getFileName.toString)
      .collect { case n if n.matches("segments-\\d+\\.json") =>
        n.stripPrefix("segments-").stripSuffix(".json").toLong }
      .toSeq.sorted
    finally listing.close()
  }

  /** Atomically commit a new snapshot generation; returns its gen id. */
  def commitSnapshot(indexDir: String, live: Seq[Long],
                     deleteBatches: Long): Long = {
    val gen = generations(indexDir).foldLeft(0L)(math.max) + 1
    atomicWrite(snapshotPath(indexDir, gen),
      live.sorted.mkString("{\"live\":[", ",", "],") +
        s""""deletes":$deleteBatches}""")
    gen
  }

  /** A snapshot's (segIds, tombstone-batch high-watermark). */
  def readSnapshot(indexDir: String, gen: Long): (Seq[Long], Long) = {
    val p = snapshotPath(indexDir, gen)
    require(Files.exists(p), s"no snapshot generation $gen under $indexDir")
    val json = Files.readString(p)
    val m = java.util.regex.Pattern.compile("\"deletes\":(\\d+)").matcher(json)
    require(m.find(), s"missing deletes watermark in $json")
    (readIdArray(json, "live"), m.group(1).toLong)
  }

  /** Expire all but the newest `keepLast` snapshots, then reclaim every
    * committed segment directory at or below the current manifest's
    * high-watermark that neither the current live set nor any retained
    * snapshot references (segments ABOVE the high-watermark are open
    * appends — never touched). Returns (expired gens, reclaimed segIds). */
  def expireSnapshots(indexDir: String, keepLast: Int): (Seq[Long], Seq[Long]) = {
    require(keepLast >= 0)
    val gens = generations(indexDir)
    val drop = gens.dropRight(keepLast)
    drop.foreach(g => Files.deleteIfExists(snapshotPath(indexDir, g)))
    val current = readManifest(indexDir).getOrElse(Seq.empty)
    if (current.isEmpty) return (drop, Seq.empty)
    val hwm = current.max
    val refs = (generations(indexDir)
      .flatMap(g => readSnapshot(indexDir, g)._1) ++ current).toSet
    val reclaim = scanSegments(indexDir).map(_.segId)
      .filter(id => id <= hwm && !refs(id))
    reclaim.foreach(deleteSegDir(indexDir, _))
    (drop, reclaim)
  }

  /** The crashed-round intent, if one exists: (outputs, inputs). */
  def readInflight(indexDir: String): Option[(Seq[Long], Seq[Long])] =
    if (!Files.exists(inflightPath(indexDir))) None
    else {
      val json = Files.readString(inflightPath(indexDir))
      Some((readIdArray(json, "outputs"), readIdArray(json, "inputs")))
    }

  private def readIdArray(json: String, key: String): Seq[Long] = {
    val m = java.util.regex.Pattern
      .compile("\"" + key + "\":\\[([0-9,\\s]*)\\]").matcher(json)
    require(m.find(), s"missing $key array in $json")
    m.group(1).split(",").iterator.map(_.trim)
      .filter(_.nonEmpty).map(_.toLong).toSeq
  }

  private def atomicWrite(p: Path, content: String): Unit = {
    val tmp = Paths.get(p.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Every committed `seg-N` directory in the index, driver-side stats
    * only (one tiny JSON read per segment, no Spark jobs). */
  def scanSegments(indexDir: String): Seq[IndexStorage.SegStats] = {
    val dir = Paths.get(indexDir)
    if (!Files.isDirectory(dir)) return Seq.empty
    val listing = Files.list(dir)
    try listing.iterator().asScala
      .filter(p => p.getFileName.toString.matches("seg-\\d+") &&
        Files.exists(p.resolve("stats.json")))
      .map(IndexStorage.readStatsOnly)
      .toSeq.sortBy(_.segId)
    finally listing.close()
  }

  /** The LIVE segment set: manifest ∩ committed, plus committed segments
    * above the manifest's high-watermark (post-manifest appends), MINUS
    * any in-flight merge output the manifest doesn't reference yet (its
    * inputs are still the authoritative copy). Read-only — a reader's
    * view is crash-consistent without repair. */
  def listLive(indexDir: String): Seq[IndexStorage.SegStats] = {
    val committed = scanSegments(indexDir)
    val manifested = readManifest(indexDir)
    val base = manifested match {
      case None => committed
      case Some(ids) =>
        val live = ids.toSet
        val hwm = if (ids.isEmpty) -1L else ids.max
        committed.filter(s => live(s.segId) || s.segId > hwm)
    }
    readInflight(indexDir) match {
      case None => base
      case Some((outputs, _)) =>
        val manifestSet = manifested.getOrElse(Seq.empty).toSet
        base.filterNot(s => outputs.contains(s.segId) && !manifestSet(s.segId))
    }
  }

  /** Resolve a crashed compaction round from the intent file: roll each
    * output FORWARD (delete its inputs) if the manifest references it,
    * BACK (delete the output) if not; then clear the intent. No-op
    * without an intent file. Returns (rolledForward, rolledBack). */
  def repair(indexDir: String,
             retainInputs: Boolean = false): (Seq[Long], Seq[Long]) =
    readInflight(indexDir) match {
      case None => (Seq.empty, Seq.empty)
      case Some((outputs, inputs)) =>
        val manifestSet = readManifest(indexDir).getOrElse(Seq.empty).toSet
        val (fwd, back) = outputs.partition(manifestSet)
        // forward: the merged output is committed AND manifested — the
        // consumed inputs are garbage whether or not their dirs remain
        // (unless snapshots may still reference them: retainInputs —
        // expireSnapshots reclaims later)
        if (fwd.nonEmpty && !retainInputs)
          inputs.foreach(id => deleteSegDir(indexDir, id))
        // back: the round never manifested — outputs (possibly
        // partially written) are garbage, inputs stay authoritative
        back.foreach(id => deleteSegDir(indexDir, id))
        Files.deleteIfExists(inflightPath(indexDir))
        (if (fwd.nonEmpty) inputs else Seq.empty, back)
    }

  private def deleteSegDir(indexDir: String, segId: Long): Unit = {
    val d = IndexStorage.segDir(indexDir, segId)
    if (Files.exists(d))
      Files.walk(d).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    val tmp = Paths.get(d.toString + ".tmp")
    if (Files.exists(tmp))
      Files.walk(tmp).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  /** Pure size-tiered planning: sort by size (numDocs), sweep ascending,
    * grouping while a segment stays within `tierFactor` of its group's
    * SMALLEST member and the group is under `maxMerge`; emit groups of
    * at least `minMerge`. A lone huge segment is never rewritten just to
    * absorb a small one outside its tier — that is the amplification
    * bound tiering exists for. */
  def plan(segs: Seq[IndexStorage.SegStats], policy: Policy): Seq[Seq[Long]] = {
    val sorted = segs.sortBy(s => (s.numDocs, s.segId))
    val groups = Seq.newBuilder[Seq[Long]]
    var cur = List.empty[IndexStorage.SegStats]
    def flush(): Unit = {
      if (cur.length >= policy.minMerge) groups += cur.reverse.map(_.segId)
      cur = Nil
    }
    sorted.foreach { s =>
      val fits = cur.nonEmpty &&
        s.numDocs.toDouble <= policy.tierFactor * math.max(1L, cur.last.numDocs) &&
        cur.length < policy.maxMerge
      if (cur.isEmpty || fits) cur = s :: cur
      else { flush(); cur = s :: Nil }
    }
    flush()
    groups.result()
  }

  /** N-way log-structured merge — the group generalization of
    * SegmentMerger.merge (which stays the proven 2-way cogroup path).
    * One pass instead of a pairwise fold: a fold of k segments re-decodes
    * and re-encodes every posting k−1 times; here the k decoded tf-row
    * streams union into ONE dictionary rebuild and ONE encode under the
    * merged global statistics. Requires pairwise-disjoint docId ranges
    * (chunk and stream segments, by construction). Byte-identity to the
    * from-scratch single-segment build is proven in CompactionSpec. */
  def mergeAll(spark: SparkSession, segs: Seq[Segment],
               params: BuildParams): (Segment, BuildReport) = {
    import spark.implicits._
    require(segs.nonEmpty)
    val t0 = System.nanoTime()
    segs.foreach { s =>
      require(s.params.bucketSize == params.bucketSize,
        "mergeAll requires a uniform bucketSize")
      require(s.params.positional == params.positional,
        "mergeAll requires uniform positional codec version")
    }

    val docs = segs.map(_.docs).reduce(_ unionByName _)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (numDocs, totalTokens) = docs
      .agg(count(lit(1)), coalesce(sum($"docLen".cast("long")), lit(0L)))
      .as[(Long, Long)].head()
    val avgdl = if (numDocs == 0) 1.0 else totalTokens.toDouble / numDocs

    // merged dictionary: df/cf sum across segments (union + one agg —
    // the N-way form of mergeDicts' 2-way cogroup), dense termIds
    // reassigned in term sort order (I1 invariant)
    val dictAgg = segs.map(_.dict.select($"term", $"df", $"cf"))
      .reduce(_ unionByName _)
      .groupBy($"term")
      .agg(sum($"df").as("df"), sum($"cf").as("cf"))
      .repartitionByRange(params.numPartitions, $"term")
      .sortWithinPartitions($"term")
      .as[(String, Long, Long)]
    val (dict0, dictRanges, freeDictSort) = DocIds.denseIds(dictAgg) { (id, r) =>
      DictEntry(id, r._1, r._2, r._3)
    }
    val dict = dict0.persist(StorageLevel.MEMORY_AND_DISK)
    val numTerms = dictRanges.map(_.count).sum

    // every segment's postings decode to (docId, term, tf, dl[, pos])
    // through its OWN dict/docs, then re-encode once under merged stats
    val tfAll = segs.map(tfRows(spark, _, params.positional))
      .reduce(_ unionByName _)
    val postings = SegmentBuilder
      .encodePostings(spark, tfAll, dict, numDocs, avgdl, params,
        numTermsHint = numTerms)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (numPostings, bytesCompressed) = postings
      .agg(coalesce(sum($"numDocs".cast("long")), lit(0L)),
        coalesce(sum(length($"bytes").cast("long")), lit(0L)))
      .as[(Long, Long)].head()
    freeDictSort()

    val doclens = SegmentBuilder.doclenBlocks(docs, params.bucketSize)
      .persist(StorageLevel.MEMORY_AND_DISK)
    doclens.count()

    val buildMillis = (System.nanoTime() - t0) / 1000000
    val meta = segs.map(_.meta).reduce(_ unionByName _)
      .withColumn("segId", lit(params.segId)).as[SegmentMeta]
    val stats = CorpusStats(numDocs, avgdl, numTerms, numPostings)
    val report = BuildReport(numDocs, numTerms, numPostings, totalTokens,
      bytesCompressed, buildMillis)
    (Segment(docs, dict, postings, doclens, stats, meta, params), report)
  }

  private def tfRows(spark: SparkSession, s: Segment, positional: Boolean) = {
    import spark.implicits._
    val decoded =
      if (positional)
        graft.search.ExactScorer.decodedPostingsPos(spark, s)
          .toDF("termId", "docId", "tf", "pos")
      else graft.search.ExactScorer.decodedPostings(spark, s)
        .toDF("termId", "docId", "tf")
    val posCols = if (positional) Seq($"pos") else Nil
    decoded
      .join(s.dict.select($"termId", $"term"), "termId")
      .join(s.docs.select($"docId", $"docLen".as("dl")), "docId")
      .select((Seq($"docId", $"term", $"tf", $"dl") ++ posCols): _*)
  }

  /** One compaction round under the crash protocol above. New segIds are
    * allocated above every committed id (monotonic — collision-free with
    * concurrent streaming appends, which allocate the same way). Returns
    * the new segIds (empty = nothing to merge). */
  def run(spark: SparkSession, indexDir: String,
          policy: Policy = Policy(),
          retainInputs: Boolean = false): Seq[Long] = {
    repair(indexDir, retainInputs)
    val live = listLive(indexDir)
    val plans = plan(live, policy)
    if (plans.isEmpty) return Seq.empty
    // allocate above every COMMITTED id (incl. non-live orphans) so a
    // rolled-back output id is never reused for a different doc set
    val base = scanSegments(indexDir).map(_.segId).max + 1
    val outputs = plans.indices.map(base + _.toLong)
    val inputs = plans.flatten
    atomicWrite(inflightPath(indexDir),
      outputs.mkString("{\"outputs\":[", ",", "],") +
        inputs.mkString("\"inputs\":[", ",", "]}"))
    plans.zip(outputs).foreach { case (group, outId) =>
      val segs = group.map(id =>
        IndexStorage.read(spark, IndexStorage.segDir(indexDir, id).toString))
      val (merged, _) = mergeAll(spark, segs,
        segs.head.params.copy(segId = outId))
      IndexStorage.write(merged, indexDir)
      merged.unpersist()
    }
    writeManifest(indexDir,
      live.map(_.segId).filterNot(inputs.toSet) ++ outputs)
    // snapshot retention: consumed inputs stay on disk while an older
    // generation may reference them; expireSnapshots reclaims them
    if (!retainInputs) inputs.foreach(id => deleteSegDir(indexDir, id))
    Files.deleteIfExists(inflightPath(indexDir))
    outputs
  }
}
