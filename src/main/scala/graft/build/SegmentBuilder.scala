package graft.build

import scala.collection.mutable
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.codec.PostingCodec
import graft.corpus.CorpusSource
import graft.model._
import graft.tokenize.Tokenizer

/** Build parameters. Defaults sized for local[32] tests; at cluster scale
  * raise numPartitions to the cluster's core count multiple and keep
  * bucketSize so a bucket's doc-length array fits comfortably in one task
  * (~4 MB at the default 1M docs/bucket). */
final case class BuildParams(
    numPartitions: Int = 32,
    bucketSize: Long = 1L << 20,
    /** Terms with df above this get the salted two-stage shuffle
      * (SURVEY §2.3 I4). */
    saltThreshold: Long = 1L << 20,
    numSalts: Int = 16,
    segId: Long = 0L,
    /** Store per-posting term positions (codec v2) — enables phrase
      * queries at ~1.5-2x posting bytes; scoring walks skip position
      * bytes without decoding them. */
    positional: Boolean = false)

/** The built index for one segment — all artifacts as typed Datasets.
  * `stats` is driver-side (tiny, broadcast at query time). */
final case class Segment(
    docs: Dataset[Doc],
    dict: Dataset[DictEntry],
    postings: Dataset[PostingList],
    doclens: Dataset[DocLenBlock],
    stats: CorpusStats,
    meta: Dataset[SegmentMeta],
    params: BuildParams) {
  def unpersist(): Unit = {
    docs.unpersist(); dict.unpersist(); postings.unpersist(); doclens.unpersist()
  }
}

/** Build metrics — SURVEY §2.3 I9 / BASELINE.md micro-metrics. */
final case class BuildReport(
    numDocs: Long,
    numTerms: Long,
    numPostings: Long,
    totalTokens: Long,
    bytesCompressed: Long,
    buildMillis: Long) {
  def docsPerSec: Double = numDocs * 1000.0 / math.max(1, buildMillis)
  def termsPerSec: Double = totalTokens * 1000.0 / math.max(1, buildMillis)
  def postingsPerSec: Double = numPostings * 1000.0 / math.max(1, buildMillis)
  def json: String =
    s"""{"numDocs":$numDocs,"numTerms":$numTerms,"numPostings":$numPostings,""" +
      s""""totalTokens":$totalTokens,"bytesCompressed":$bytesCompressed,""" +
      s""""buildMillis":$buildMillis,"docsPerSec":$docsPerSec,""" +
      s""""termsPerSec":$termsPerSec,"postingsPerSec":$postingsPerSec}"""
}

/** Single-segment inverted-index build — SURVEY.md §3 EP1, Spark-first.
  *
  * Shuffle budget (explicit, per the north rule):
  *   1. repartitionByRange(repo,path,commit) — deterministic docIds (P4/P5)
  *   2. groupBy(term) — dictionary df/cf (I1) [tf itself needs NO shuffle:
  *      per-doc tf is computed inside the tokenize flatMap, since one
  *      document's tokens live in one row]
  *   3. tf ⋈ dict on term — broadcast when dict is small, else sort-merge
  *   4. repartition(bucket,termId[,salt]) + sortWithinPartitions — posting
  *      runs (I3/I4); hot terms (df > saltThreshold) take the salted
  *      two-stage path: partial runs per salt, k-way merged per term.
  */
/** One daemon thread for the build's concurrent side-track: enough to
  * overlap the docs/doclens jobs with the dict/postings jobs without
  * unbounded thread growth under chunked/streaming builds. */
private object BuildPool {
  val ec: ExecutionContext = ExecutionContext.fromExecutorService(
    java.util.concurrent.Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-build-side")
      t.setDaemon(true)
      t
    }))
}

object SegmentBuilder {

  /** Build-time intermediate: one posting before encoding. */
  final case class PRow(bucket: Int, termId: Long, docId: Long, tf: Int, impact: Double)
  /** Positional variant — `pos` rides the same shuffle. */
  final case class PRowP(bucket: Int, termId: Long, docId: Long, tf: Int,
                         impact: Double, pos: Array[Int])
  /** Stage-1 output of the salted path: one sorted partial run. */
  final case class PartialRun(
      bucket: Int, termId: Long, salt: Int,
      docIds: Array[Long], tfs: Array[Int], impacts: Array[Double])
  /** Positional partial run (salted hot-term path of a positional build). */
  final case class PartialRunP(
      bucket: Int, termId: Long, salt: Int,
      docIds: Array[Long], tfs: Array[Int], impacts: Array[Double],
      positions: Array[Array[Int]])

  def build(spark: SparkSession, source: CorpusSource,
            params: BuildParams = BuildParams()): (Segment, BuildReport) = {
    val corpus = source.read(spark)
    val (numbered, ranges, freeNumbered) = DocIds.assign(corpus, params.numPartitions)
    try buildFromNumbered(spark, numbered, ranges, source.snapshotId,
      source.inputFiles(spark), params)
    finally freeNumbered()
  }

  /** Build one segment from already-numbered rows. Chunked/resumed builds
    * pass a docId-range slice of a globally numbered corpus here — ids
    * derive from global sort position, never task scheduling, so a
    * resumed chunk reproduces byte-identical artifacts (SURVEY §2.6 R3). */
  def buildFromNumbered(spark: SparkSession, numbered: Dataset[NumberedRow],
                        ranges: Array[PartRange], snapshotId: Long,
                        inputFiles: Array[String], params: BuildParams)
      : (Segment, BuildReport) = {
    import spark.implicits._
    val t0 = System.nanoTime()
    val sc = spark.sparkContext

    // ── P6/P7/P8 fused: tokenize → per-doc tf + docLen, zero shuffle ──
    // (positional builds additionally carry each term's occurrence
    // indices — one document's tokens still live in one input row, so
    // positions also need NO extra shuffle)
    val tf: DataFrame = (if (params.positional) {
      numbered.flatMap { r =>
        val toks = Tokenizer.tokenize(r.content)
        val occ = new mutable.HashMap[String, mutable.ArrayBuilder.ofInt]()
        var i = 0
        while (i < toks.length) {
          occ.getOrElseUpdate(toks(i), new mutable.ArrayBuilder.ofInt) += i
          i += 1
        }
        val dl = toks.length
        occ.iterator.map { case (t, b) =>
          val ps = b.result()
          TermFreqPos(r.docId, t, ps.length, dl, ps)
        }
      }.toDF()
    } else {
      numbered.flatMap { r =>
        val toks = Tokenizer.tokenize(r.content)
        val counts = new mutable.HashMap[String, Int]()
        var i = 0
        while (i < toks.length) {
          counts.update(toks(i), counts.getOrElse(toks(i), 0) + 1)
          i += 1
        }
        val dl = toks.length
        counts.iterator.map { case (t, c) => TermFreq(r.docId, t, c, dl) }
      }.toDF()
    }).persist(StorageLevel.MEMORY_AND_DISK)

    // global stats — numDocs is already known exactly from the id ranges
    // (no job), and Σ docLen ≡ Σ tf, so totalTokens falls out of the same
    // narrow scan that materializes the tf cache: no docs-side shuffle or
    // join sits on the critical path before the dictionary can start.
    // avgdl stays sum(docLen)/N, the definition the DuckDB oracle
    // reproduces exactly (SURVEY §5.5).
    val numDocs = ranges.map(_.count).sum
    sc.setJobDescription("graft: tf materialize + totalTokens")
    val totalTokens = tf.agg(coalesce(sum($"tf".cast("long")), lit(0L)))
      .as[Long].head()
    val avgdl = if (numDocs == 0) 1.0 else totalTokens.toDouble / numDocs

    // ── DocMap: sha256 invariant + docLen (docs with zero tokens keep 0)
    val docLenByDoc = tf.groupBy($"docId").agg(max($"dl").as("docLen"))
    val docs = numbered
      .select($"docId", $"repo", $"path", $"commit", $"lang",
        sha2($"content", 256).as("sha256"))
      .join(docLenByDoc, Seq("docId"), "left")
      .na.fill(0, Seq("docLen"))
      .select($"docId", $"repo", $"path", $"commit", $"lang", $"sha256",
        $"docLen".cast("int").as("docLen"))
      .as[Doc]
      .persist(StorageLevel.MEMORY_AND_DISK)

    // The docs → doclen-blocks track is independent of the dict →
    // postings track once tf is cached: run it on its own thread so its
    // jobs interleave with the dictionary/encode jobs instead of
    // serializing after them. This attacks the Amdahl term directly —
    // the driver-side job gaps are corpus-size-invariant, so overlapping
    // them is what moves the N→4N scaling efficiency, not peak
    // throughput. (Concurrent actions on one SparkSession are supported;
    // job descriptions are thread-local.)
    val docsTrack: Future[Dataset[DocLenBlock]] = Future {
      sc.setJobDescription("graft: docs materialize + doclen blocks")
      val doclens = doclenBlocks(docs, params.bucketSize)
        .persist(StorageLevel.MEMORY_AND_DISK)
      doclens.count()
      doclens
    }(BuildPool.ec)

    // ── I1: dictionary with dense termIds in term sort order ──────────
    sc.setJobDescription("graft: dictionary agg + dense termIds")
    val dictAgg = tf.groupBy($"term")
      .agg(count(lit(1)).as("df"), sum($"tf").as("cf"))
      .repartitionByRange(params.numPartitions, $"term")
      .sortWithinPartitions($"term")
      .as[(String, Long, Long)]
    val (dict0, dictRanges, freeDictSort) = DocIds.denseIds(dictAgg) { (id, r) =>
      DictEntry(id, r._1, r._2, r._3)
    }
    val dict = dict0.persist(StorageLevel.MEMORY_AND_DISK)
    val numTerms = dictRanges.map(_.count).sum // free: no extra count job

    // ── I3/I4/I5/I6: encode (shared with the log-structured merge) ────
    sc.setJobDescription("graft: posting encode + stats agg")
    val postings = encodePostings(spark, tf.toDF(), dict, numDocs, avgdl, params,
      numTermsHint = numTerms)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (numPostings, bytesCompressed) = postings
      .agg(coalesce(sum($"numDocs".cast("long")), lit(0L)),
        coalesce(sum(length($"bytes").cast("long")), lit(0L)))
      .as[(Long, Long)].head()

    val doclens = Await.result(docsTrack, Duration.Inf)
    sc.setJobDescription(null)

    freeDictSort(); tf.unpersist()

    val buildMillis = (System.nanoTime() - t0) / 1000000
    val metaRows = ranges.map(r => SegmentMeta(params.segId, snapshotId,
      r.partId, r.firstId, r.count, 0L, 0L, 0L, 0L, Array.empty[String])) :+
      SegmentMeta(params.segId, snapshotId, -1, 0L, numDocs, numTerms,
        numPostings, bytesCompressed, buildMillis, inputFiles)
    val meta = spark.createDataset(metaRows.toSeq)

    val stats = CorpusStats(numDocs, avgdl, numTerms, numPostings)
    val report = BuildReport(numDocs, numTerms, numPostings, totalTokens,
      bytesCompressed, buildMillis)
    (Segment(docs, dict, postings, doclens, stats, meta, params), report)
  }

  /** (docId, term, tf, dl) rows + dictionary → packed posting lists: the
    * I3 (cold, single shuffle) / I4 (hot, salted two-stage) split.
    * `tfDf` needs columns (docId, term, tf, dl). Shared by the fresh
    * build and SegmentMerger's re-encode. */
  /** Vocabularies below this broadcast in the tf⋈dict join (shuffle 3 of
    * EP1 collapses to a map-side hash join — the tf side, the largest
    * dataset of the build, then never shuffles on term). A 100 TB-scale
    * vocabulary exceeds this and falls back to sort-merge. */
  val DictBroadcastLimit: Long = 4L << 20

  def encodePostings(spark: SparkSession, tfDf: DataFrame,
                     dict: Dataset[DictEntry], numDocs: Long, avgdl: Double,
                     params: BuildParams, numTermsHint: Long = -1L): Dataset[PostingList] = {
    import spark.implicits._
    val bucketSize = params.bucketSize
    val dictSlim = dict.select($"termId", $"term", $"df")
    val numTerms = if (numTermsHint >= 0) numTermsHint else dict.count()
    val dictSide =
      if (numTerms <= DictBroadcastLimit) broadcast(dictSlim) else dictSlim
    // impact computed as native Column arithmetic — stays inside
    // whole-stage codegen, no typed ser/deser of the posting-scale rows.
    // The expression tree mirrors BM25.impact/idf term-for-term (same
    // association order ⇒ bit-identical IEEE doubles as the query-time
    // Scala recomputation; upperFloat adds an ulp of slack regardless).
    val idfCol = log(lit(1.0) + (lit(numDocs) - $"df" + lit(0.5)) / ($"df" + lit(0.5)))
    val impactCol = idfCol * $"tf" * lit(BM25.K1Plus1) /
      ($"tf" + lit(BM25.K1) * (lit(BM25.OneMinusB) + lit(BM25.B) * $"dl" / lit(avgdl)))
    val positional = params.positional
    val baseCols = Seq(
      expr(s"CAST(docId DIV $bucketSize AS INT)").as("bucket"),
      $"termId", $"docId", $"tf", impactCol.as("impact")) ++
      (if (positional) Seq(col("pos")) else Nil)
    val pre = tfDf
      .join(dictSide, Seq("term"))
      .select((baseCols :+ $"df"): _*)

    // The hot/cold split is a PLAN fork: each branch re-scans tf and
    // re-runs the join, so when the dictionary says no term can cross
    // the salt threshold (max df — one ~ms agg on the cached dict), the
    // hot branch would still cost a full corpus pass that provably
    // yields zero rows. Skip it, and the whole encode is one scan + one
    // shuffle. At skewed-corpus scale maxDf exceeds the threshold and
    // the dual-path plan comes back automatically.
    val maxDf: Long = dict.agg(coalesce(max($"df"), lit(0L))).as[Long].head()

    def packCold(df: DataFrame): Dataset[PostingList] = {
      val sorted = df
        .repartition(params.numPartitions, $"bucket", $"termId")
        .sortWithinPartitions($"bucket", $"termId", $"docId")
      if (positional) sorted.as[PRowP].mapPartitions(groupRunsPos)
      else sorted.as[PRow].mapPartitions(groupRuns)
    }

    if (maxDf <= params.saltThreshold) return packCold(pre.drop("df"))

    val cold = pre.filter($"df" <= params.saltThreshold).drop("df")
    val hot = pre.filter($"df" > params.saltThreshold).drop("df")
    val coldLists = packCold(cold)

    val numSalts = params.numSalts
    val hotSorted = hot
      .withColumn("salt", pmod(hash($"docId"), lit(numSalts)))
      .repartition(params.numPartitions, $"bucket", $"termId", $"salt")
      .sortWithinPartitions($"bucket", $"termId", $"salt", $"docId")
    val hotLists =
      if (positional)
        hotSorted
          .select($"bucket", $"termId", $"docId", $"tf", $"impact", $"pos", $"salt")
          .as[(Int, Long, Long, Int, Double, Array[Int], Int)]
          .mapPartitions(groupPartialRunsPos)
          .groupByKey(r => (r.bucket, r.termId))
          .mapGroups((key: (Int, Long), runs: Iterator[PartialRunP]) =>
            mergeRunsPos(key._1, key._2, runs))
      else
        hotSorted
          .select($"bucket", $"termId", $"docId", $"tf", $"impact", $"salt")
          .as[(Int, Long, Long, Int, Double, Int)]
          .mapPartitions(groupPartialRuns)
          .groupByKey(r => (r.bucket, r.termId))
          .mapGroups((key: (Int, Long), runs: Iterator[PartialRun]) =>
            mergeRuns(key._1, key._2, runs))

    coldLists.union(hotLists)
  }

  /** Per-bucket doc-length blocks. firstDocId = the segment's first docId
    * in the bucket (chunk slices may start mid-bucket); rows within a
    * segment's bucket slice must be dense. */
  def doclenBlocks(docs: Dataset[Doc], bucketSize: Long): Dataset[DocLenBlock] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select($"docId", $"docLen", ($"docId" / bucketSize).cast("int").as("bucket"))
      .as[(Long, Int, Int)]
      .groupByKey(_._3)
      .mapGroups { (bucket, it) =>
        val rows = it.toArray.sortBy(_._1)
        val first = rows.head._1
        val lens = new Array[Int](rows.length)
        var i = 0
        while (i < rows.length) {
          val idx = (rows(i)._1 - first).toInt
          require(idx == i, s"docIds not dense in bucket $bucket at ${rows(i)._1}")
          lens(i) = rows(i)._2
          i += 1
        }
        DocLenBlock(bucket, first, lens)
      }
  }

  /** Streaming run-grouper: consecutive (bucket,termId) rows — sorted by
    * the upstream sortWithinPartitions — into packed posting lists.
    * Iterator→iterator: never materializes the partition (SURVEY §4.3). */
  private def groupRuns(it: Iterator[PRow]): Iterator[PostingList] =
    new Iterator[PostingList] {
      private val in = it.buffered
      override def hasNext: Boolean = in.hasNext
      override def next(): PostingList = {
        val head = in.next()
        val ids = mutable.ArrayBuilder.make[Long]
        val tfs = mutable.ArrayBuilder.make[Int]
        val imps = mutable.ArrayBuilder.make[Double]
        ids += head.docId; tfs += head.tf; imps += head.impact
        while (in.hasNext && in.head.bucket == head.bucket && in.head.termId == head.termId) {
          val r = in.next()
          ids += r.docId; tfs += r.tf; imps += r.impact
        }
        packList(head.bucket, head.termId, ids.result(), tfs.result(), imps.result())
      }
    }

  /** Positional twin of groupRuns. */
  private def groupRunsPos(it: Iterator[PRowP]): Iterator[PostingList] =
    new Iterator[PostingList] {
      private val in = it.buffered
      override def hasNext: Boolean = in.hasNext
      override def next(): PostingList = {
        val head = in.next()
        val ids = mutable.ArrayBuilder.make[Long]
        val tfs = mutable.ArrayBuilder.make[Int]
        val imps = mutable.ArrayBuilder.make[Double]
        val poss = mutable.ArrayBuilder.make[Array[Int]]
        ids += head.docId; tfs += head.tf; imps += head.impact; poss += head.pos
        while (in.hasNext && in.head.bucket == head.bucket && in.head.termId == head.termId) {
          val r = in.next()
          ids += r.docId; tfs += r.tf; imps += r.impact; poss += r.pos
        }
        packList(head.bucket, head.termId, ids.result(), tfs.result(),
          imps.result(), poss.result())
      }
    }

  /** Stage-1 of the salted path: partial sorted runs per (bucket,termId,salt). */
  private def groupPartialRuns(it: Iterator[(Int, Long, Long, Int, Double, Int)])
      : Iterator[PartialRun] =
    new Iterator[PartialRun] {
      private val in = it.buffered
      override def hasNext: Boolean = in.hasNext
      override def next(): PartialRun = {
        val (b, t, d0, tf0, imp0, s) = in.next()
        val ids = mutable.ArrayBuilder.make[Long]
        val tfs = mutable.ArrayBuilder.make[Int]
        val imps = mutable.ArrayBuilder.make[Double]
        ids += d0; tfs += tf0; imps += imp0
        while (in.hasNext && in.head._1 == b && in.head._2 == t && in.head._6 == s) {
          val r = in.next()
          ids += r._3; tfs += r._4; imps += r._5
        }
        PartialRun(b, t, s, ids.result(), tfs.result(), imps.result())
      }
    }

  /** Positional twin of groupPartialRuns. */
  private def groupPartialRunsPos(
      it: Iterator[(Int, Long, Long, Int, Double, Array[Int], Int)])
      : Iterator[PartialRunP] =
    new Iterator[PartialRunP] {
      private val in = it.buffered
      override def hasNext: Boolean = in.hasNext
      override def next(): PartialRunP = {
        val (b, t, d0, tf0, imp0, pos0, s) = in.next()
        val ids = mutable.ArrayBuilder.make[Long]
        val tfs = mutable.ArrayBuilder.make[Int]
        val imps = mutable.ArrayBuilder.make[Double]
        val poss = mutable.ArrayBuilder.make[Array[Int]]
        ids += d0; tfs += tf0; imps += imp0; poss += pos0
        while (in.hasNext && in.head._1 == b && in.head._2 == t && in.head._7 == s) {
          val r = in.next()
          ids += r._3; tfs += r._4; imps += r._5; poss += r._6
        }
        PartialRunP(b, t, s, ids.result(), tfs.result(), imps.result(), poss.result())
      }
    }

  /** Stage-2: k-way merge of ≤numSalts disjoint sorted runs (heap merge —
    * salts interleave docIds, so concatenation would be wrong). */
  private def mergeRuns(bucket: Int, termId: Long,
                        runsIt: Iterator[PartialRun]): PostingList = {
    val runs = runsIt.toArray
    val total = runs.map(_.docIds.length).sum
    val ids = new Array[Long](total)
    val tfs = new Array[Int](total)
    val imps = new Array[Double](total)
    implicit val ord: Ordering[(Long, Int, Int)] = Ordering.by[(Long, Int, Int), Long](_._1).reverse
    val heap = mutable.PriorityQueue.empty[(Long, Int, Int)] // (docId, runIdx, pos) min-heap
    runs.indices.foreach { r => if (runs(r).docIds.nonEmpty) heap.enqueue((runs(r).docIds(0), r, 0)) }
    var i = 0
    while (heap.nonEmpty) {
      val (d, r, p) = heap.dequeue()
      ids(i) = d; tfs(i) = runs(r).tfs(p); imps(i) = runs(r).impacts(p)
      i += 1
      if (p + 1 < runs(r).docIds.length) heap.enqueue((runs(r).docIds(p + 1), r, p + 1))
    }
    packList(bucket, termId, ids, tfs, imps)
  }

  /** Positional k-way heap merge. */
  private def mergeRunsPos(bucket: Int, termId: Long,
                           runsIt: Iterator[PartialRunP]): PostingList = {
    val runs = runsIt.toArray
    val total = runs.map(_.docIds.length).sum
    val ids = new Array[Long](total)
    val tfs = new Array[Int](total)
    val imps = new Array[Double](total)
    val poss = new Array[Array[Int]](total)
    implicit val ord: Ordering[(Long, Int, Int)] = Ordering.by[(Long, Int, Int), Long](_._1).reverse
    val heap = mutable.PriorityQueue.empty[(Long, Int, Int)]
    runs.indices.foreach { r => if (runs(r).docIds.nonEmpty) heap.enqueue((runs(r).docIds(0), r, 0)) }
    var i = 0
    while (heap.nonEmpty) {
      val (d, r, p) = heap.dequeue()
      ids(i) = d; tfs(i) = runs(r).tfs(p); imps(i) = runs(r).impacts(p)
      poss(i) = runs(r).positions(p)
      i += 1
      if (p + 1 < runs(r).docIds.length) heap.enqueue((runs(r).docIds(p + 1), r, p + 1))
    }
    packList(bucket, termId, ids, tfs, imps, poss)
  }

  private def packList(bucket: Int, termId: Long, ids: Array[Long],
                       tfs: Array[Int], imps: Array[Double],
                       poss: Array[Array[Int]] = null): PostingList = {
    val packed = PostingCodec.pack(ids, tfs, imps, poss)
    PostingList(bucket, termId, packed.numDocs, packed.lastDocIds,
      packed.maxImpacts, packed.offsets, packed.bytes)
  }
}
