package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.LsmIndex
import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.{DatasetCorpusSource, Synthesizer}
import graft.index.{Compaction, IndexStorage}
import graft.model.CorpusRow
import graft.search.{MultiSearcher, Searcher}

/** The LsmIndex facade: append / delete / upsert / tombstone-aware
  * search / maintenance compose into the full index lifecycle. */
class LsmIndexSpec extends SparkSpec {

  val params: BuildParams =
    BuildParams(numPartitions = 4, bucketSize = 100, positional = true)

  private def corpus = Synthesizer.tiny(spark) // 200 docs

  private def freshLsm(): (LsmIndex, String) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-lsm").toString
    val idx = new LsmIndex(spark, dir, params)
    val rows = corpus.collect().sortBy(r => (r.repo, r.path)).toSeq
    assert(idx.append(spark.createDataset(rows.take(120))) == 0L)
    assert(idx.append(spark.createDataset(rows.drop(120))) == 1L)
    (idx, dir)
  }

  private def topTerms(idx: LsmIndex, n: Int): Array[String] = {
    val segs = idx.liveSegments()
    segs.head.dict.orderBy(desc("df")).limit(n).collect().map(_.term)
  }

  test("append twice == MultiSearcher over the same segments, bit-for-bit") {
    import spark.implicits._
    val (idx, _) = freshLsm()
    val segs = idx.liveSegments()
    assert(segs.size == 2 && segs.map(_.stats.numDocs).sum == 200)
    // docId ranges disjoint (second segment base is bucket-aligned)
    val r0 = segs(0).docs.agg(min($"docId"), max($"docId")).collect().head
    val r1 = segs(1).docs.agg(min($"docId"), max($"docId")).collect().head
    assert(r0.getLong(1) < r1.getLong(0))
    val terms = topTerms(idx, 3)
    val multi = new MultiSearcher(spark, segs)
    for ((kind, q) <- Seq(("FREE", terms.mkString(" ")),
        ("AND", terms.take(2).mkString(" AND ")),
        ("PHRASE", "\"" + terms.take(2).mkString(" ") + "\""))) {
      val got = idx.hits(kind, q, 20).collect()
        .map(h => (h.rank, h.docId, h.score)).toSeq
      val want = multi.hits(kind, q, 20).collect()
        .map(h => (h.rank, h.docId, h.score)).toSeq
      assert(got == want && got.nonEmpty, s"$kind '$q'")
    }
  }

  test("delete is durable and visible at the next query; scores keep stats") {
    import spark.implicits._
    val (idx, dir) = freshLsm()
    val terms = topTerms(idx, 2)
    val q = terms.mkString(" ")
    val before = idx.hits("FREE", q, 200).collect().map(h => (h.docId, h.score)).toSeq
    val delIds = idx.liveSegments().flatMap(
      _.docs.filter($"docId" % 3 === 1).select($"docId")
        .collect().map(_.getLong(0))).toSet
    val n = idx.delete(col("docId") % 3 === 1)
    assert(n == delIds.size && n > 0)
    // re-deleting the same docs is a no-op (log stays deduplicated)
    assert(idx.delete(col("docId") % 3 === 1) == 0L)
    val after = idx.hits("FREE", q, 200).collect().map(h => (h.docId, h.score)).toSeq
    // = the pre-delete ranking minus tombstoned docs, scores unchanged
    assert(after == before.filterNot(h => delIds(h._1)))
    // durable: a second handle on the same dir sees the deletes
    val idx2 = new LsmIndex(spark, dir, params)
    val again = idx2.hits("FREE", q, 200).collect().map(h => (h.docId, h.score)).toSeq
    assert(again == after)

    // fielded + tombstones compose: the lang-filtered post-delete ranking
    // == the unfiltered post-delete ranking restricted to that lang
    val lang = idx.liveSegments().flatMap(
      _.docs.select($"lang").as[String].collect())
      .groupBy(identity).maxBy(_._2.size)._1
    val langDocs = idx.liveSegments().flatMap(
      _.docs.filter($"lang" === lang).select($"docId")
        .collect().map(_.getLong(0))).toSet
    val fielded = idx.fieldedHits("FREE", q, 200, "lang", lang).collect()
      .map(h => (h.docId, h.score)).toSeq
    assert(fielded == after.filter(h => langDocs(h._1)) && fielded.nonEmpty)
  }

  test("highlights span segments and honor tombstones") {
    import spark.implicits._
    val (idx, _) = freshLsm()
    val terms = topTerms(idx, 2)
    val q = terms.mkString(" ")
    val hitIds = idx.hits("FREE", q, 8).collect().map(_.docId).toSet
    assert(hitIds.nonEmpty)
    // docId -> content via the docmap natural key (spans both segments)
    val byKey = corpus.collect()
      .map(r => (r.repo, r.path, r.commit) -> r.content).toMap
    val contentById = idx.liveSegments().flatMap(
      _.docs.select($"docId", $"repo", $"path", $"commit").collect()
        .map(r => r.getLong(0) ->
          byKey((r.getString(1), r.getString(2), r.getString(3))))).toMap
    val got = idx.highlights("FREE", q, 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = (for {
      d <- hitIds.toSeq
      (tok, i) <- graft.tokenize.Tokenizer.tokenize(contentById(d)).zipWithIndex
      if terms.contains(tok)
    } yield (d, tok, (i + 1).toLong)).toSet
    assert(got == want,
      s"missing: ${want.diff(got).take(5)}; extra: ${got.diff(want).take(5)}")
    // both segments contribute (hit ids from both append batches)
    val seg1Lo = idx.liveSegments().map(
      _.docs.agg(min($"docId")).collect().head.getLong(0)).max
    assert(got.exists(_._1 < seg1Lo) && got.exists(_._1 >= seg1Lo))
    // tombstoned docs drop out of the highlight set
    val victim = hitIds.head
    assert(idx.delete(col("docId") === victim) == 1L)
    val after = idx.highlights("FREE", q, 8).collect().map(_.getLong(0)).toSet
    assert(!after.contains(victim))
  }

  test("deleteByQuery tombstones exactly the kind's match set, durably") {
    import spark.implicits._
    val (idx, dir) = freshLsm()
    val terms = topTerms(idx, 2)
    val q = terms.mkString(" ")
    val before = idx.hits("FREE", q, 200).collect().map(h => (h.docId, h.score)).toSeq
    // conjunctive delete: every doc containing BOTH top terms goes
    val andQ = s"${terms(0)} AND ${terms(1)}"
    val matchIds = idx.hits("AND", andQ, 10000).collect().map(_.docId).toSet
    assert(matchIds.nonEmpty)
    val n = idx.deleteByQuery("AND", andQ)
    assert(n == matchIds.size, s"deleted $n of ${matchIds.size}")
    // idempotent: the same query deletes nothing new
    assert(idx.deleteByQuery("AND", andQ) == 0L)
    // the surviving ranking = pre-delete ranking minus the match set,
    // scores unchanged (merge-on-read keeps pre-purge statistics)
    val after = idx.hits("FREE", q, 200).collect().map(h => (h.docId, h.score)).toSeq
    assert(after == before.filterNot(h => matchIds(h._1)) && after.nonEmpty)
    // durable across handles
    val idx2 = new LsmIndex(spark, dir, params)
    assert(idx2.hits("AND", andQ, 10).isEmpty)
  }

  test("upsert replaces by natural key; maintain purges and converges") {
    import spark.implicits._
    val (idx, dir) = freshLsm()
    val terms = topTerms(idx, 2)
    val probe = terms(0)
    // pick 5 victims that CONTAIN the probe term, replace their text
    // with content that does not
    val victims = idx.hits("FREE", probe, 5, qid = 1L).collect().map(_.docId)
    assert(victims.length == 5)
    val segs = idx.liveSegments()
    val keyOf = segs.map(_.docs.select($"docId", $"repo", $"path", $"commit", $"lang")
      .as[(Long, String, String, String, String)]).reduce(_ union _)
      .collect().map(r => r._1 -> r).toMap
    val replacement = victims.toSeq.map { d =>
      val (_, repo, path, commit, lang) = keyOf(d)
      CorpusRow(repo, path, commit, lang, s"${terms(1)} ${terms(1)} upserted body")
    }
    val (deleted, newSeg) = idx.upsert(spark.createDataset(replacement))
    assert(deleted == 5 && newSeg == 2L)

    // old versions invisible; the natural keys still findable via new content
    val hitsNow = idx.hits("FREE", probe, 200).collect().map(_.docId).toSet
    assert(victims.forall(d => !hitsNow(d)))
    val paths = idx.liveSegments().map(_.docs.filter($"docId" > keyOf.keys.max)
      .select($"path").as[String]).reduce(_ union _).collect().toSet
    assert(paths == replacement.map(_.path).toSet)

    // maintenance: purge + merge to ONE segment under a permissive tier
    val made = idx.maintain(Compaction.Policy(tierFactor = 1e9, minMerge = 2, maxMerge = 16))
    assert(made.nonEmpty)
    assert(Compaction.listLive(dir).size == 1)
    assert(IndexStorage.readTombstones(spark, dir).count() == 0L)
    // exactly one live doc per natural key, 200 total
    val live = idx.liveSegments().head
    assert(live.stats.numDocs == 200)
    assert(live.docs.groupBy($"repo", $"path").count()
      .filter($"count" > 1).count() == 0L)

    // post-maintenance ranking == a fresh single-segment build over the
    // equivalent corpus (old victim texts swapped for replacements),
    // matched by path — stats fully rescored by the purge/merge
    val byPath = replacement.map(r => r.path -> r).toMap
    val fresh = corpus.collect().map(r => byPath.getOrElse(r.path, r)).toSeq
    val (mono, _) = SegmentBuilder.build(spark,
      DatasetCorpusSource(spark.createDataset(fresh)), params)
    val q = terms.mkString(" ")
    val livePath = live.docs.select($"docId", $"path").as[(Long, String)]
      .collect().toMap
    val monoPath = mono.docs.select($"docId", $"path").as[(Long, String)]
      .collect().toMap
    // full-corpus k: set equality of (path, exact score) — rank order at
    // equal scores ties by docId, and the live index's ids are batch-
    // ordered while the mono build's are globally key-ordered
    val got = idx.hits("FREE", q, 200).collect()
      .map(h => (livePath(h.docId), h.score)).toSet
    val want = new Searcher(spark, mono).hits("FREE", q, 200).collect()
      .map(h => (monoPath(h.docId), h.score)).toSet
    assert(got == want && got.nonEmpty)
    mono.unpersist()
  }

  test("result cache serves repeats bit-identically and invalidates on mutation") {
    import spark.implicits._
    val (idx, _) = freshLsm()
    val q = topTerms(idx, 2).mkString(" ")
    val first = idx.hits("FREE", q, 20).collect()
      .map(h => (h.rank, h.docId, h.score)).toSeq
    // repeat: served from the epoch-keyed cache, bit-identical
    val second = idx.hits("FREE", q, 20).collect()
      .map(h => (h.rank, h.docId, h.score)).toSeq
    assert(second == first && first.nonEmpty)
    // mutation bumps the epoch: the next read reflects the delete
    val victim = first.head._2
    idx.delete(col("docId") === victim)
    val third = idx.hits("FREE", q, 20).collect().map(_.docId).toSet
    assert(!third.contains(victim))
  }
}
