package graft

import org.apache.spark.sql.functions._

import graft.build.{BuildParams, Segment, SegmentBuilder}
import graft.corpus.{DatasetCorpusSource, Synthesizer}
import graft.model._
import graft.search.{ExactScorer, Searcher}
import graft.tokenize.Tokenizer

/** End-to-end single-segment build + query — SURVEY §5.2/§5.3:
  * invariants, rank-identity of the WAND path vs the exact scorer, salted
  * vs unsalted equivalence, determinism across parallelism. */
class IndexBuildSpec extends SparkSpec {

  // small bucketSize so the tiny corpus spans several buckets
  lazy val params: BuildParams = BuildParams(numPartitions = 8, bucketSize = 64)
  lazy val built: (Segment, graft.build.BuildReport) = {
    val corpus = Synthesizer.tiny(spark)
    SegmentBuilder.build(spark, DatasetCorpusSource(corpus), params)
  }
  lazy val seg: Segment = built._1

  test("docIds are dense 0..N-1 in (repo,path,commit) order") {
    import spark.implicits._
    val ids = seg.docs.select("docId").as[Long].collect().sorted
    assert(ids.toSeq == (0L until seg.stats.numDocs).toSeq)
    val keys = seg.docs.orderBy("docId")
      .select("repo", "path", "commit").as[(String, String, String)].collect()
    assert(keys.toSeq == keys.sortBy(k => (k._1, k._2, k._3)).toSeq,
      "docId order must equal key order")
  }

  test("sha256 invariant: docmap hash equals source content hash per row") {
    import spark.implicits._
    val src = Synthesizer.tiny(spark)
      .select($"repo", $"path", $"commit", sha2($"content", 256).as("h"))
    val joinedBad = seg.docs.join(src, Seq("repo", "path", "commit"))
      .filter($"sha256" =!= $"h").count()
    assert(joinedBad == 0)
    assert(src.count() == seg.stats.numDocs)
  }

  test("dictionary invariants: dense termIds in term order; df/cf consistent with decoded postings") {
    import spark.implicits._
    val d = seg.dict.orderBy("termId").collect()
    assert(d.map(_.termId).toSeq == d.indices.map(_.toLong))
    assert(d.map(_.term).toSeq == d.map(_.term).sorted.toSeq)
    // df == number of decoded postings per term; cf == Σtf
    val dec = ExactScorer.decodedPostings(spark, seg)
      .groupByKey(_._1).mapGroups { (tid, it) =>
        var n = 0L; var cf = 0L
        it.foreach { r => n += 1; cf += r._3 }
        (tid, n, cf)
      }.collect().sortBy(_._1)
    assert(dec.length == d.length)
    dec.zip(d).foreach { case ((tid, n, cf), e) =>
      assert(tid == e.termId && n == e.df && cf == e.cf,
        s"term ${e.term}: dict(df=${e.df},cf=${e.cf}) decoded(df=$n,cf=$cf)")
    }
  }

  test("Σcf == ΣdocLen == total tokens") {
    import spark.implicits._
    val sumCf = seg.dict.agg(sum($"cf")).as[Long].head()
    val sumDl = seg.docs.agg(sum($"docLen".cast("long"))).as[Long].head()
    assert(sumCf == sumDl)
    assert(built._2.totalTokens == sumDl)
  }

  test("doclen blocks cover every doc with correct lengths") {
    import spark.implicits._
    val fromBlocks = seg.doclens.flatMap { b =>
      b.lens.indices.map(i => (b.firstDocId + i, b.lens(i)))
    }.collect().toMap
    val fromDocs = seg.docs.select($"docId", $"docLen").as[(Long, Int)].collect().toMap
    assert(fromBlocks == fromDocs)
  }

  /** Query mix: hot per-lang keyword, mid, rare, needle, absent. */
  def queryTerms(): Seq[String] = {
    import spark.implicits._
    val byDf = seg.dict.orderBy(desc("df")).limit(200).collect()
    val hot = byDf.head.term
    val mid = byDf(byDf.length / 2).term
    val rare = seg.dict.orderBy(asc("df")).limit(1).collect().head.term
    val needle = seg.dict.filter($"term".startsWith("uniq")).limit(1)
      .collect().headOption.map(_.term)
    Seq(hot, mid, rare) ++ needle.toSeq
  }

  test("rank identity: WAND == exhaustive == exact scorer, bit-identical scores") {
    val ts = queryTerms()
    val queries = Seq(
      ("FREE", ts.take(2).mkString(" ")),
      ("FREE", ts.mkString(" ")),
      ("FREE", ts.last),
      ("OR", ts.take(3).mkString(" OR ")),
      ("AND", ts.take(2).mkString(" AND ")),
      ("AND", s"${ts.head} AND zzz_no_such_term"),
      ("FREE", "zzz_no_such_term"))
    val searcher = new Searcher(spark, seg)
    for ((kind, text) <- queries; k <- Seq(1, 10, 100)) {
      val wand = searcher.hits(kind, text, k).collect()
        .map(h => (h.rank, h.docId, java.lang.Double.doubleToLongBits(h.score)))
      val exh = searcher.hitsExhaustive(kind, text, k).collect()
        .map(h => (h.rank, h.docId, java.lang.Double.doubleToLongBits(h.score)))
      val exact = ExactScorer.topK(spark, seg, text, kind, k).collect()
        .map(h => (h.rank, h.docId, java.lang.Double.doubleToLongBits(h.score)))
      assert(wand.toSeq == exact.toSeq, s"WAND vs exact: $kind '$text' k=$k")
      assert(exh.toSeq == exact.toSeq, s"exhaustive vs exact: $kind '$text' k=$k")
    }
  }

  test("AND results are exactly the docs containing all terms") {
    import spark.implicits._
    val ts = queryTerms().take(2)
    val searcher = new Searcher(spark, seg)
    val got = searcher.hits("AND", ts.mkString(" "), 1000).collect()
      .map(_.docId).toSet
    val src = Synthesizer.tiny(spark)
    val want = seg.docs.join(
      src, Seq("repo", "path", "commit"))
      .select($"docId", $"content").as[(Long, String)].collect()
      .filter { case (_, c) =>
        val toks = Tokenizer.tokenize(c).toSet
        ts.forall(toks.contains)
      }.map(_._1).toSet
    assert(got == want)
  }

  private def fingerprint(s: Segment): Seq[(Int, Long, Int, String, Seq[Float])] = {
    import spark.implicits._
    s.postings.map(pl => (pl.bucket, pl.termId, pl.numDocs,
      java.util.Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("SHA-256").digest(pl.bytes)),
      pl.maxImpacts.toSeq))
      .collect().sortBy(r => (r._1, r._2)).toSeq
  }

  test("salted row build (all terms hot) is byte-identical to the run build") {
    val corpus = Synthesizer.tiny(spark)
    val (segSalted, _) = SegmentBuilder.build(spark, DatasetCorpusSource(corpus),
      params.copy(saltThreshold = 2, numSalts = 4, mapSideRuns = false))
    assert(fingerprint(segSalted) == fingerprint(seg))
    segSalted.unpersist()
  }

  test("cold row build is byte-identical to the run build (incl. block maxima)") {
    val corpus = Synthesizer.tiny(spark)
    val (segRow, _) = SegmentBuilder.build(spark, DatasetCorpusSource(corpus),
      params.copy(mapSideRuns = false))
    assert(fingerprint(segRow) == fingerprint(seg))
    segRow.unpersist()
  }

  test("positional run build is byte-identical to the positional row build") {
    val corpus = Synthesizer.tiny(spark)
    val (segRuns, _) = SegmentBuilder.build(spark, DatasetCorpusSource(corpus),
      params.copy(positional = true))
    val (segRow, _) = SegmentBuilder.build(spark, DatasetCorpusSource(corpus),
      params.copy(positional = true, mapSideRuns = false))
    assert(fingerprint(segRuns) == fingerprint(segRow))
    segRuns.unpersist(); segRow.unpersist()
  }

  test("duplicate corpus rows dedup inside the id-assignment sort (no extra shuffle)") {
    import spark.implicits._
    val base = Synthesizer.tiny(spark)
    val withDups = base.union(base.limit(37)).union(base.limit(5))
    val (numbered, ranges, free) = graft.build.DocIds.assign(withDups, 8)
    val rows = numbered.collect().sortBy(_.docId)
    assert(rows.length == 200, "dups must collapse to the 200 unique keys")
    assert(rows.map(_.docId).toSeq == (0L until 200L))
    assert(ranges.map(_.count).sum == 200)
    val keys = rows.map(r => (r.repo, r.path, r.commit))
    assert(keys.distinct.length == 200)
    assert(keys.sorted.toSeq == keys.toSeq, "order must still be the global key order")
    free()
  }

  test("resident and cogroup doclen modes are rank-identical") {
    val ts = queryTerms()
    val resident = new Searcher(spark, seg)
    val cogrouped = new Searcher(spark, seg, residentDoclens = false)
    for ((kind, text) <- Seq(("FREE", ts.mkString(" ")), ("AND", ts.take(2).mkString(" AND ")))) {
      val a = resident.hits(kind, text, 25).collect()
        .map(h => (h.rank, h.docId, java.lang.Double.doubleToLongBits(h.score))).toSeq
      val b = cogrouped.hits(kind, text, 25).collect()
        .map(h => (h.rank, h.docId, java.lang.Double.doubleToLongBits(h.score))).toSeq
      assert(a == b && a.nonEmpty, s"$kind '$text'")
    }
  }

  test("determinism: different parallelism yields identical artifacts") {
    val corpus = Synthesizer.tiny(spark)
    val (seg2, _) = SegmentBuilder.build(spark, DatasetCorpusSource(corpus),
      params.copy(numPartitions = 3))
    import spark.implicits._
    val a = seg.docs.select($"docId", $"repo", $"path", $"sha256", $"docLen")
      .as[(Long, String, String, String, Int)].collect().sortBy(_._1).toSeq
    val b = seg2.docs.select($"docId", $"repo", $"path", $"sha256", $"docLen")
      .as[(Long, String, String, String, Int)].collect().sortBy(_._1).toSeq
    assert(a == b)
    val da = seg.dict.collect().sortBy(_.termId).toSeq
    val db = seg2.dict.collect().sortBy(_.termId).toSeq
    assert(da == db)
    seg2.unpersist()
  }
}
