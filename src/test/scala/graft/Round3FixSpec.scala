package graft

import org.apache.spark.sql.functions._

import graft.api.DocsIndex
import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.{DatasetCorpusSource, Synthesizer}
import graft.pipeline.Dedup
import graft.search.{QueryParser, Searcher, Wand}

/** Regression tests for the round-3 fixes: dict caching in DocsIndex.get,
  * broadcast side of topDocs, open-ended scoped ranges, k<=0 top-k,
  * NEAR-window fallback, PREFIX operand normalization, and the
  * single-shuffle MinHash candidate path. */
class Round3FixSpec extends SparkSpec {

  lazy val seg = {
    val (s, _) = SegmentBuilder.build(spark,
      DatasetCorpusSource(Synthesizer.corpus(spark, 300L)),
      BuildParams(numPartitions = 4, bucketSize = 64, positional = true))
    s
  }
  lazy val searcher = new Searcher(spark, seg)

  test("DocsIndex.get leaves every segment artifact cached (incl. dict)") {
    // another suite's afterAll clearCache() may have uncached a memoized
    // segment — rebuild so the assertion tests get() itself
    DocsIndex.reset()
    val (cached, _, _) = DocsIndex.get(spark, "/root/testdata/sf0.001")
    assert(cached.dict.storageLevel.useMemory,
      "dict must be re-cached in the serving copy — seg0.unpersist() " +
        "drops the original and every dict access would recompute the " +
        "tokenize+agg lineage")
    assert(cached.postings.storageLevel.useMemory)
    assert(cached.doclens.storageLevel.useMemory)
    assert(cached.docs.storageLevel.useMemory)
  }

  test("topDocs broadcasts the hits side, never the corpus-sized docmap") {
    val (_, s, _) = DocsIndex.get(spark, "/root/testdata/sf0.001")
    val q = s.topDocs("FREE", "fast merge sort", 5)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    // hits is the left/build side: the join must build left
    assert(plan.contains("BuildLeft"),
      s"broadcast must sit on the <=k hits side (BuildLeft):\n$plan")
    assert(q.count() > 0)
  }

  test("open-ended scoped range (hi = Long.MaxValue) does not overflow the bucket filter") {
    val term = seg.dict.orderBy(desc("df")).limit(1).collect().head.term
    val scoped = searcher.scopedHits("FREE", term, 10, 1L, Long.MaxValue).collect()
    assert(scoped.nonEmpty, "open-ended scope silently returned nothing (Int overflow)")
    assert(scoped.forall(_.docId >= 1L))
    // and it matches the explicitly-bounded equivalent
    val hiBound = seg.stats.numDocs
    val bounded = searcher.scopedHits("FREE", term, 10, 1L, hiBound).collect()
    assert(scoped.map(h => (h.docId, h.score)).toSeq ==
      bounded.map(h => (h.docId, h.score)).toSeq)
  }

  test("TopK with k <= 0 never throws and WAND walks return empty") {
    val tk = new Wand.TopK(0)
    assert(tk.theta == Double.PositiveInfinity)
    tk.offer(1L, 5.0) // must be a no-op, not a heap.head crash
    assert(tk.result().isEmpty)
    val term = seg.dict.orderBy(desc("df")).limit(1).collect().head.term
    assert(searcher.hits("FREE", term, 0).collect().isEmpty)
  }

  test("nearWindow falls back to the default on connective-free text") {
    assert(QueryParser.nearWindow("merge NEAR/3 sort") == 3)
    assert(QueryParser.nearWindow("merge sort") == QueryParser.DefaultNearWindow)
  }

  test("PREFIX operand normalizes through tokenizer boundaries") {
    assert(QueryParser.termsFor("PREFIX", "sor*").sameElements(Array("sor")))
    assert(QueryParser.termsFor("PREFIX", "get_val*").sameElements(Array("val")))
    assert(QueryParser.termsFor("PREFIX", "getVal*").sameElements(Array("val")))
    assert(QueryParser.termsFor("PREFIX", "s*").sameElements(Array("s")))
    // bare `*` must not expand the whole dictionary
    assert(searcher.dictLookupPrefix("").isEmpty)
  }

  test("minhash candidates: one corpus-scale exchange, no distinct, LSH still == exact") {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(7)
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val base = (0 until 40).map { i =>
      (i.toLong, Array.fill(25 + rng.nextInt(10))(vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    val dups = (0 until 8).map { i =>
      val ws = base(i)._2.split(" "); ws(ws.length / 2) = "mutated"
      ((100 + i).toLong, ws.mkString(" "))
    }
    val docs = (base ++ dups).toDF("doc_id", "text")

    val cand = Dedup.minhashCandidates(docs, 3, 64, 16)
    val plan = cand.queryExecution.executedPlan.toString
    val shuffles = "ShuffleExchange|Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1,
      s"candidate generation must shuffle exactly once (band buckets):\n$plan")
    // first-collision ownership replaces the old distinct(): no dup pairs
    val pairs = cand.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == pairs.distinct.length, "duplicate candidate pairs emitted")

    val exact = Dedup.jaccardPairs(docs, 3, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, 3, 64, 16, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty && lsh == exact, s"${lsh.diff(exact)} / ${exact.diff(lsh)}")
  }
}
