package graft

import graft.build.{BuildParams, SegmentBuilder}
import graft.codec.PostingCodec
import graft.corpus.DatasetCorpusSource
import graft.index.IndexPruner
import graft.model.{BM25, CorpusRow}
import graft.search.Searcher

/** Static index pruning (IndexPruner): the kept set per list is exactly
  * the brute-forced top-impact postings, keepFrac = 1 is the identity,
  * kept postings score bit-identically to the full index, positions
  * survive, and head recall on the pruned index stays high. */
class IndexPrunerSpec extends SparkSpec {

  // 30 docs over a small vocab with skewed tf and varied lengths, so
  // per-list impact orderings are non-trivial
  private val texts: Seq[String] = (0 until 30).map { i =>
    val heavy = Seq.fill(1 + i % 5)("merge")
    val light = Seq.fill(1 + (i * 7) % 3)("fast")
    val pad = Seq.fill(i % 11)("filler")
    val rare = if (i % 6 == 0) Seq("sort") else Seq.empty
    (heavy ++ light ++ pad ++ rare ++ Seq("tail", "words")).mkString(" ")
  }

  lazy val seg = {
    import spark.implicits._
    val docs = texts.zipWithIndex
      .map { case (text, i) => CorpusRow("r0", f"f$i%03d.txt", "c0", "txt", text) }
    SegmentBuilder.build(spark, DatasetCorpusSource(docs.toDS()),
      BuildParams(numPartitions = 4, bucketSize = 16, positional = true))._1
  }

  private def decode(pl: graft.model.PostingList,
                     positional: Boolean): Seq[(Long, Int)] = {
    val c = new PostingCodec.Cursor(pl.numDocs, pl.lastDocIds,
      pl.maxImpacts, pl.offsets, pl.bytes, positional)
    (0 until pl.numDocs).map { _ =>
      val r = (c.docId, c.tf); if (positional) c.positions(); c.next(); r
    }
  }

  test("kept set per list == brute-forced top-impact postings") {
    val pruned = IndexPruner.prune(spark, seg, 0.5, minKeep = 2)
    val dls = seg.doclens.collect().map(b => b.bucket -> b).toMap
    val idfByTid = seg.dict.collect()
      .map(e => e.termId -> BM25.idf(seg.stats.numDocs, e.df)).toMap
    val fullByKey = seg.postings.collect()
      .map(pl => (pl.bucket, pl.termId) -> pl).toMap
    val prunedLists = pruned.postings.collect()
    assert(prunedLists.nonEmpty)
    var shrunk = 0
    prunedLists.foreach { pl =>
      val full = fullByKey((pl.bucket, pl.termId))
      val dlb = dls(pl.bucket)
      val fullPost = decode(full, positional = true)
      val want =
        if (math.max(2, math.ceil(0.5 * full.numDocs).toInt) >= full.numDocs)
          fullPost
        else {
          val idf = idfByTid(pl.termId)
          val target = math.max(2, math.ceil(0.5 * full.numDocs).toInt)
          fullPost.map { case (d, tf) =>
            (d, tf, BM25.impact(idf, tf,
              dlb.lens((d - dlb.firstDocId).toInt), seg.stats.avgDocLen))
          }.sortBy { case (d, _, imp) => (-imp, d) }
            .take(target).map(t => (t._1, t._2)).sortBy(_._1)
        }
      if (want.size < fullPost.size) shrunk += 1
      assert(decode(pl, positional = true) == want,
        s"(bucket ${pl.bucket}, term ${pl.termId})")
    }
    assert(shrunk > 0, "at least one list must actually shrink")
  }

  test("keepFrac = 1 is the identity; kept postings score bit-identically") {
    val same = IndexPruner.prune(spark, seg, 1.0, minKeep = 1)
    val a = same.postings.collect().map(pl => (pl.bucket, pl.termId) -> decode(pl, true)).toMap
    val b = seg.postings.collect().map(pl => (pl.bucket, pl.termId) -> decode(pl, true)).toMap
    assert(a == b)
    // full-keep pruned index returns bit-identical hits
    val s1 = new Searcher(spark, seg)
    val s2 = new Searcher(spark, same)
    assert(s1.hits("FREE", "fast merge", 10).collect().toSeq ==
      s2.hits("FREE", "fast merge", 10).collect().toSeq)
  }

  test("head recall stays high and phrases still run on the pruned index") {
    val pruned = IndexPruner.prune(spark, seg, 0.5, minKeep = 2)
    val s1 = new Searcher(spark, seg)
    val s2 = new Searcher(spark, pruned)
    // head recall: k = 5 of a ~30-doc match set — the regime static
    // pruning preserves (deep-tail k at half-keep on a tiny corpus
    // reaches into the cut postings by construction)
    val full = s1.hits("FREE", "fast merge", 5).collect().map(_.docId).toSet
    val cut = s2.hits("FREE", "fast merge", 5).collect().map(_.docId).toSet
    val recall = (full & cut).size.toDouble / full.size
    assert(recall >= 0.8, s"recall@5 $recall")
    // pruning only ever REMOVES contributions: every pruned-index score
    // is ≤ the full score, and a doc whose postings for every query
    // term all survived scores bit-identically
    val fullScores = s1.hits("FREE", "fast merge", 30).collect()
      .map(h => h.docId -> h.score).toMap
    val tidByTerm = seg.dict.collect().map(e => e.term -> e.termId).toMap
    val qTids = Set(tidByTerm("fast"), tidByTerm("merge"))
    val survived: Set[(Long, Long)] = pruned.postings.collect()
      .filter(pl => qTids(pl.termId))
      .flatMap(pl => decode(pl, positional = true).map(p => (p._1, pl.termId)))
      .toSet
    val fullPairs: Set[(Long, Long)] = seg.postings.collect()
      .filter(pl => qTids(pl.termId))
      .flatMap(pl => decode(pl, positional = true).map(p => (p._1, pl.termId)))
      .toSet
    var exact = 0
    s2.hits("FREE", "fast merge", 10).collect().foreach { h =>
      assert(h.score <= fullScores(h.docId), s"doc ${h.docId} gained score")
      val mine = fullPairs.filter(_._1 == h.docId)
      if (mine.subsetOf(survived)) {
        assert(fullScores(h.docId) == h.score, s"doc ${h.docId}")
        exact += 1
      }
    }
    assert(exact > 0, "at least one fully-retained doc must score identically")
    // positional payloads survive re-encoding
    val ph = s2.hits("PHRASE", "\"tail words\"", 30).collect()
    assert(ph.nonEmpty)
  }
}
