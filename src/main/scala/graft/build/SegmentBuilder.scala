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
      * (SURVEY §2.3 I4) — row-encode fallback path only; the map-side
      * run path needs no salting (a term's per-partition runs are
      * already the partial aggregation salting approximates). */
    saltThreshold: Long = 1L << 20,
    numSalts: Int = 16,
    segId: Long = 0L,
    /** Store per-posting term positions (codec v2) — enables phrase
      * queries at ~1.5-2x posting bytes; scoring walks skip position
      * bytes without decoding them. */
    positional: Boolean = false,
    /** Pack sorted posting RUNS map-side and shuffle compressed bytes
      * (~5 B/posting) instead of posting rows (~40 B/posting) — the
      * classic local-index-then-merge build. Requires per-partition
      * ascending docIds (true for fresh builds from numbered rows) and a
      * driver-resident dictionary; falls back to the row shuffle
      * otherwise. Off switches every encode to the row path (test
      * cross-check). */
    mapSideRuns: Boolean = true)

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
  *   3. tf ⋈ dict on term — resolved DRIVER-SIDE (binary search against
  *      the broadcast term array) on the run path, so the tf side never
  *      shuffles on term; the row fallback broadcast-joins when the dict
  *      is small, else sort-merge
  *   4. posting encode — two plans:
  *      a. RUN path (default, fresh builds): each input partition packs
  *         its per-(bucket,term) postings into delta+VByte RUNS in one
  *         narrow pass (docIds are ascending within a partition — ids
  *         are sort ranks, so NO sort is needed anywhere), then ONLY the
  *         packed bytes (~5 B/posting incl. doc length) shuffle,
  *         grouped by (bucket,term), and concatenate + re-pack — the
  *         classic local-index/merge build (e.g. Zobel & Moffat ACM
  *         CS'06 §5). ~8x less shuffle volume than posting rows, and
  *         hot terms need no salting: a term's ≤numPartitions runs ARE
  *         its partial aggregation.
  *      b. ROW fallback (merges, non-broadcastable dicts):
  *         repartition(bucket,termId[,salt]) + sortWithinPartitions —
  *         posting runs (I3/I4); hot terms (df > saltThreshold) take
  *         the salted two-stage path: partial runs per salt, k-way
  *         merged per term.
  *      Both plans produce byte-identical artifacts (asserted in
  *      IndexBuildSpec): the run path re-packs from the same full
  *      arrays with impacts recomputed by the same IEEE expression.
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

  /** One map-side packed posting run: a partition's postings for one
    * (bucket, term), delta+VByte bytes of (gap, tf, dl[, positions]).
    * The ONLY thing the run path shuffles. */
  final case class Run(bucket: Int, termId: Long, n: Int, bytes: Array[Byte])

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
    // partitionSorted: tf flows narrowly from the range-sorted numbered
    // corpus, so docIds ascend within every partition — run path eligible.
    val postings = encodePostings(spark, tf.toDF(), dict, numDocs, avgdl, params,
      numTermsHint = numTerms, partitionSorted = true)
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

  /** `partitionSorted`: caller guarantees docIds are ascending within
    * every partition of `tfDf` (true for fresh builds — tf rows flow
    * narrowly from the range-sorted numbered corpus) — enables the
    * map-side run path. Merges/re-encodes pass false (their tf rows
    * come through joins) and take the row shuffle. */
  def encodePostings(spark: SparkSession, tfDf: DataFrame,
                     dict: Dataset[DictEntry], numDocs: Long, avgdl: Double,
                     params: BuildParams, numTermsHint: Long = -1L,
                     partitionSorted: Boolean = false): Dataset[PostingList] = {
    import spark.implicits._
    val bucketSize = params.bucketSize
    val dictSlim = dict.select($"termId", $"term", $"df")
    val numTerms = if (numTermsHint >= 0) numTermsHint else dict.count()
    if (partitionSorted && params.mapSideRuns && numTerms <= DictBroadcastLimit)
      return encodePostingsRuns(spark, tfDf, dict, numDocs, avgdl, params)
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

  /** Growable VByte stream for one map-side run. Appends must be in
    * strictly ascending docId order (the partitionSorted contract). */
  private final class RunBuilder {
    private var prev = -1L
    var n = 0
    private var buf = new Array[Byte](48)
    private var pos = 0
    @inline private def ensure(extra: Int): Unit =
      if (pos + extra > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length << 1, pos + extra))
    def add(docId: Long, tf: Int, dl: Int, ps: Array[Int]): Unit = {
      require(docId > prev,
        s"run path requires ascending docIds per partition: $docId after $prev")
      ensure((3 + (if (ps == null) 0 else ps.length)) * graft.codec.VByte.MaxBytes)
      pos = graft.codec.VByte.encode(docId - prev, buf, pos)
      pos = graft.codec.VByte.encode(tf.toLong, buf, pos)
      pos = graft.codec.VByte.encode(dl.toLong, buf, pos)
      if (ps != null) {
        var pprev = -1L
        var j = 0
        while (j < ps.length) {
          pos = graft.codec.VByte.encode(ps(j) - pprev, buf, pos)
          pprev = ps(j)
          j += 1
        }
      }
      prev = docId
      n += 1
    }
    def bytes(): Array[Byte] = java.util.Arrays.copyOf(buf, pos)
  }

  /** The run path: one narrow pass packs per-(bucket,term) runs, only
    * packed bytes shuffle, the reduce concatenates runs (disjoint
    * ascending docId ranges — partitions hold contiguous id ranges),
    * recomputes impacts with the SAME IEEE expression as the row path's
    * codegen column, and packs the final list. Term→(termId, df)
    * resolves by binary search against the broadcast term array — dense
    * termIds are assigned in term sort order (I1), so the termId IS the
    * array index. */
  private def encodePostingsRuns(spark: SparkSession, tfDf: DataFrame,
                                 dict: Dataset[DictEntry], numDocs: Long,
                                 avgdl: Double, params: BuildParams): Dataset[PostingList] = {
    import spark.implicits._
    val entries = dict.select($"termId", $"term", $"df")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    entries.indices.foreach { i =>
      require(entries(i)._1 == i, s"dict termIds not dense at $i: ${entries(i)}")
      require(i == 0 || entries(i - 1)._2 < entries(i)._2,
        "dict terms not in sort order — run path requires I1 term-ordered ids")
    }
    val terms: Array[String] = entries.map(_._2)
    val dfs: Array[Long] = entries.map(_._3)
    val bcTerms = spark.sparkContext.broadcast(terms)
    val bcDfs = spark.sparkContext.broadcast(dfs)
    val bucketSize = params.bucketSize
    val positional = params.positional

    def runsOf(rows: Iterator[(Long, String, Int, Int, Array[Int])]): Iterator[Run] = {
      val ts = bcTerms.value
      val acc = new mutable.LongMap[RunBuilder]()
      rows.foreach { case (docId, term, tf, dl, ps) =>
        val tid = java.util.Arrays.binarySearch(
          ts.asInstanceOf[Array[AnyRef]], term)
        require(tid >= 0, s"term not in dictionary: '$term'")
        val bucket = (docId / bucketSize).toInt
        val key = (bucket.toLong << 41) | tid.toLong
        acc.getOrElseUpdate(key, new RunBuilder)
          .add(docId, tf, dl, if (positional) ps else null)
      }
      acc.iterator.map { case (key, b) =>
        Run((key >>> 41).toInt, key & ((1L << 41) - 1), b.n, b.bytes())
      }
    }

    val runs: Dataset[Run] =
      if (positional)
        tfDf.select($"docId", $"term", $"tf", $"dl", $"pos")
          .as[(Long, String, Int, Int, Array[Int])]
          .mapPartitions(runsOf)
      else
        tfDf.select($"docId", $"term", $"tf", $"dl")
          .as[(Long, String, Int, Int)]
          .mapPartitions(it => runsOf(it.map(r => (r._1, r._2, r._3, r._4, null))))

    runs.groupByKey(r => (r.bucket, r.termId))
      .mapGroups { (key: (Int, Long), it: Iterator[Run]) =>
        mergeRunBytes(key._1, key._2, it, bcDfs.value(key._2.toInt),
          numDocs, avgdl, positional)
      }
  }

  /** Decode a (bucket,term)'s runs — sorted by first docId, ranges must
    * be disjoint — into full arrays, recompute impacts, pack once. The
    * output is byte-identical to the row path's pack of the same list. */
  private def mergeRunBytes(bucket: Int, termId: Long, runsIt: Iterator[Run],
                            df: Long, numDocs: Long, avgdl: Double,
                            positional: Boolean): PostingList = {
    import graft.codec.VByte
    val runs = runsIt.toArray.sortBy(r => VByte.decode(r.bytes, 0) - 1)
    val total = runs.map(_.n).sum
    val ids = new Array[Long](total)
    val tfs = new Array[Int](total)
    val imps = new Array[Double](total)
    val poss = if (positional) new Array[Array[Int]](total) else null
    val idf = BM25.idf(numDocs, df)
    var i = 0
    var last = -1L
    runs.foreach { run =>
      val c = new VByte.Cursor(run.bytes, 0)
      var prev = -1L
      var j = 0
      while (j < run.n) {
        prev += c.read()
        val tf = c.read().toInt
        val dl = c.read().toInt
        require(prev > last,
          s"overlapping docId ranges across runs of (bucket=$bucket, termId=$termId)")
        if (positional) {
          val ps = new Array[Int](tf)
          var p = -1L
          var x = 0
          while (x < tf) { p += c.read(); ps(x) = p.toInt; x += 1 }
          poss(i) = ps
        }
        ids(i) = prev
        tfs(i) = tf
        imps(i) = BM25.impact(idf, tf, dl, avgdl)
        last = prev
        i += 1
        j += 1
      }
    }
    packList(bucket, termId, ids, tfs, imps, poss)
  }

  /** Per-bucket doc-length blocks. firstDocId = the segment's first docId
    * in the bucket (chunk slices may start mid-bucket). Holes are
    * allowed — a merge over PURGED segments sees gaps where deleted
    * docIds used to be — and fill with 0, which no walk ever reads (the
    * ids are gone from every posting list); the array stays bounded by
    * bucketSize regardless of hole count. */
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
        val lens = new Array[Int]((rows.last._1 - first + 1).toInt)
        var i = 0
        while (i < rows.length) {
          lens((rows(i)._1 - first).toInt) = rows(i)._2
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
