package graft.index

import org.apache.spark.sql.SparkSession

import graft.build.Segment
import graft.codec.PostingCodec
import graft.model.{BM25, DocLenBlock, PostingList}

/** Static index pruning — Carmel et al., SIGIR'01 ("Static index
  * pruning for information retrieval systems"), the uniform top-k
  * variant adapted to the bucketed layout: each (bucket, term) posting
  * list keeps only its ceil(keepFrac · n) highest-IMPACT postings
  * (never fewer than `minKeep` — short lists are the selective ones and
  * cost nothing to keep whole), re-encoded with the standard codec.
  * Kept postings score EXACTLY as before (dict/df/doclens/stats are the
  * original artifacts, and the impact expression is the builder's own),
  * so pruning trades bounded tail-recall for a smaller, faster index —
  * the classic serving-tier rung between the full index and a cache.
  *
  * Scale shape: one cogroup of postings with doclens per bucket (the
  * query walk's own distribution — postings and doclens are already
  * co-bucketed), per-list selection in a tight local pass, zero
  * corpus-scale shuffles beyond that cogroup. The idf map is
  * vocabulary-sized and broadcast (the builder's own broadcast-dict
  * regime, [[graft.search.Searcher.DictCacheLimit]] scale posture).
  *
  * WAND stays sound on the pruned index: block maxima are recomputed by
  * the codec from the surviving postings' impacts, and every surviving
  * posting's impact is unchanged.
  */
object IndexPruner {

  /** Prune `seg` to `keepFrac` of each posting list (by impact, ties to
    * the smaller docId). Returns a segment sharing every artifact but
    * the postings; `keepFrac = 1` returns lists unchanged. */
  def prune(spark: SparkSession, seg: Segment, keepFrac: Double,
            minKeep: Int = 16): Segment = {
    require(keepFrac > 0.0 && keepFrac <= 1.0,
      s"keepFrac must be in (0, 1], got $keepFrac")
    require(minKeep >= 1, s"minKeep must be >= 1, got $minKeep")
    import spark.implicits._
    val positional = seg.params.positional
    val avgdl = seg.stats.avgDocLen
    val numDocs = seg.stats.numDocs
    val idfByTid: Map[Long, Double] = seg.dict
      .select($"termId", $"df").as[(Long, Long)].collect()
      .map { case (tid, df) => tid -> BM25.idf(numDocs, df) }.toMap
    val idfB = spark.sparkContext.broadcast(idfByTid)
    val frac = keepFrac
    val keepMin = minKeep

    val pruned = seg.postings.groupByKey(_.bucket)
      .cogroup(seg.doclens.groupByKey(_.bucket)) { (_, plIt, dlIt) =>
        dlIt.toSeq.headOption match {
          case None => Iterator.empty
          case Some(dlb: DocLenBlock) =>
            val first = dlb.firstDocId
            val lens = dlb.lens
            plIt.map { pl =>
              val target = math.max(keepMin,
                math.ceil(frac * pl.numDocs).toLong.toInt)
              if (target >= pl.numDocs) pl
              else {
                val idf = idfB.value(pl.termId)
                val n = pl.numDocs
                val ids = new Array[Long](n)
                val tfs = new Array[Int](n)
                val imps = new Array[Double](n)
                val poss = if (positional) new Array[Array[Int]](n) else null
                val c = new PostingCodec.Cursor(n, pl.lastDocIds,
                  pl.maxImpacts, pl.offsets, pl.bytes, positional)
                var i = 0
                while (i < n) {
                  ids(i) = c.docId
                  tfs(i) = c.tf
                  imps(i) = BM25.impact(idf, c.tf,
                    lens((c.docId - first).toInt), avgdl)
                  if (positional) poss(i) = c.positions()
                  c.next(); i += 1
                }
                // top-`target` by (impact desc, docId asc), then back to
                // ascending docId for the encoder
                val keep = Array.range(0, n)
                  .sortBy(j => (-imps(j), ids(j))).take(target).sorted
                val kIds = keep.map(ids(_))
                val kTfs = keep.map(tfs(_))
                val kImps = keep.map(imps(_))
                val kPoss = if (positional) keep.map(poss(_)) else null
                val p = PostingCodec.pack(kIds, kTfs, kImps, kPoss)
                PostingList(pl.bucket, pl.termId, p.numDocs, p.lastDocIds,
                  p.maxImpacts, p.offsets, p.bytes)
              }
            }
        }
      }
    seg.copy(postings = pruned)
  }
}
