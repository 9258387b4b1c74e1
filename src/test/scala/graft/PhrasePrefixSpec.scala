package graft

import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.DatasetCorpusSource
import graft.model.CorpusRow
import graft.search.Searcher

/** Match-phrase-prefix (Searcher.phrasePrefixHits): matches the fixed
  * terms followed by ANY vocabulary expansion of the live prefix,
  * consecutively; a single-expansion prefix collapses to the plain
  * phrase bit-identically, and a fixed-free prefix collapses to the
  * PREFIX kind bit-identically. */
class PhrasePrefixSpec extends SparkSpec {

  private val texts = Seq(
    "fast sort wins the race",        // fast s(ort) ✓
    "fast scan of the shelf",         // fast s(can) ✓
    "fast merge then sort later",     // fast s ✗ (sort not after fast)
    "sort fast reversed order",       // ✗ (prefix precedes)
    "the fast stream flows",          // fast s(tream) ✓
    "slow sort fast finish",          // ✗
    "fast fast sort doubled")         // ✓ (second fast)

  lazy val seg = {
    import spark.implicits._
    val docs = texts.zipWithIndex
      .map { case (text, i) => CorpusRow("r0", f"f$i%03d.txt", "c0", "txt", text) }
    SegmentBuilder.build(spark, DatasetCorpusSource(docs.toDS()),
      BuildParams(numPartitions = 4, bucketSize = 64, positional = true))._1
  }
  lazy val searcher = new Searcher(spark, seg)

  test("matches fixed + any expansion, consecutively only") {
    val got = searcher.phrasePrefixHits("fast s", 10).collect()
      .map(_.docId).toSet
    val paths = seg.docs.collect().map(d => d.docId -> d.path).toMap
    val idx = got.map(d => paths(d).stripSuffix(".txt").stripPrefix("f").toInt)
    assert(idx == Set(0, 1, 4, 6), s"matched planted docs $idx")
  }

  test("single-expansion prefix == the plain phrase, bit-identically") {
    // 'me' expands only to 'merge' on this corpus
    val viaPrefix = searcher.phrasePrefixHits("fast me", 10).collect().toSeq
    val viaPhrase = searcher.hits("PHRASE", "\"fast merge\"", 10).collect().toSeq
    assert(viaPrefix == viaPhrase && viaPhrase.nonEmpty)
  }

  test("no fixed terms == the PREFIX kind, bit-identically") {
    val viaPP = searcher.phrasePrefixHits("s", 10).collect().toSeq
    val viaPrefix = searcher.hits("PREFIX", "s*", 10).collect().toSeq
    assert(viaPP == viaPrefix && viaPrefix.nonEmpty)
  }

  test("unmatched prefix or empty text is empty") {
    assert(searcher.phrasePrefixHits("fast zz", 10).isEmpty)
    assert(searcher.phrasePrefixHits("   ", 10).isEmpty)
  }
}
