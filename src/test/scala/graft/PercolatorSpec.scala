package graft

import org.apache.spark.sql.functions._

import graft.api.QuerySet
import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.{DatasetCorpusSource, Synthesizer}
import graft.pipeline.Percolator
import graft.search.Searcher

/** Percolation (reverse search): a stored query matches a document iff
  * the document is in that query's INDEX match set. Proven by set
  * equality against the oracle-verified Searcher walks over the entire
  * committed query set, all kinds. */
class PercolatorSpec extends SparkSpec {

  lazy val seg = SegmentBuilder.build(spark,
    DatasetCorpusSource(Synthesizer.tiny(spark)),
    BuildParams(numPartitions = 4, bucketSize = 64, positional = true))._1
  lazy val searcher = new Searcher(spark, seg)

  /** (docId, content) of the indexed corpus — docIds via the docmap's
    * natural key so percolation sees exactly the indexed rows. */
  lazy val docsDf = {
    val c = Synthesizer.tiny(spark).toDF()
      .select(col("repo"), col("path"), col("content"))
    seg.docs.join(c, Seq("repo", "path"))
      .select(col("docId").as("doc_id"), col("content").as("text"))
  }

  test("percolate == index match set for every committed query") {
    val qs = QuerySet.load()
    val compiled = qs.map(q => Percolator.compile(q.qid.toString, q.kind, q.text))
    val got: Map[String, Set[Long]] = Percolator
      .percolate(spark, docsDf, compiled).collect()
      .groupBy(_.getString(1)).view
      .mapValues(_.map(_.getLong(0)).toSet).toMap
    qs.foreach { q =>
      val want = searcher.hits(q.kind, q.text, 1000000).collect()
        .map(_.docId).toSet
      val g = got.getOrElse(q.qid.toString, Set.empty)
      assert(g == want,
        s"q${q.qid} ${q.kind} '${q.text}': percolate ${g.size} vs index ${want.size}")
    }
  }

  test("pure-negative boolean percolates (the index path rejects it)") {
    val c = Percolator.compile("neg", "BOOL", "NOT def")
    val got = Percolator.percolate(spark, docsDf, Seq(c)).count()
    val withDef = Percolator.percolate(spark, docsDf,
      Seq(Percolator.compile("pos", "FREE", "def"))).count()
    assert(got == docsDf.count() - withDef)
  }

  test("unsupported kind is rejected at compile time") {
    intercept[IllegalArgumentException] {
      Percolator.compile("x", "NOPE", "abc")
    }
  }

  test("percolation runs INSIDE a streaming query (the alerting shape)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val compiled = Seq(
      Percolator.compile("alert1", "AND", "def AND import"),
      Percolator.compile("alert2", "BOOL", "match AND NOT import"))
    val q = Percolator
      .percolate(spark, mem.toDF().toDF("doc_id", "text"), compiled)
      .writeStream.format("memory").queryName("perc").outputMode("append")
      .start()
    try {
      val rows = Synthesizer.tiny(spark).collect().take(40)
        .zipWithIndex.map { case (r, i) => (i.toLong, r.content) }
      mem.addData(rows.take(20)); q.processAllAvailable()
      mem.addData(rows.drop(20)); q.processAllAvailable()
      val got = spark.table("perc").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      // batch twin over the same rows
      val want = Percolator.percolate(spark,
        rows.toSeq.toDF("doc_id", "text"), compiled).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("10k-saved-searches broadcast residency is ASSERTED: measured " +
    "payload far under the cap; an over-cap set fails loudly") {
    import spark.implicits._
    // the Elastic regime: 10k varied stored queries. Terms are
    // letters-only (digits/underscores would be split by the
    // code-aware tokenizer into shared subtokens and every query
    // would match everything).
    def enc(i: Int): String = i.toString.map(c => ('a' + (c - '0')).toChar)
    val kinds = Seq("AND", "OR", "PHRASE", "NEAR", "PREFIX")
    val compiled = (0 until 10000).map { i =>
      val k = kinds(i % kinds.length)
      val text = k match {
        case "AND"    => s"alpha${enc(i)} AND beta${enc(i % 97)}"
        case "OR"     => s"gamma${enc(i)} OR delta${enc(i % 89)}"
        case "PHRASE" => "\"saved search " + enc(i) + "\""
        case "NEAR"   => s"epsilon${enc(i)} NEAR/4 zeta${enc(i % 83)}"
        case "PREFIX" => s"pre${enc(i)}*"
      }
      Percolator.compile(s"q$i", k, text)
    }
    val nBytes = Percolator.serializedSize(compiled.toArray)
    assert(nBytes < (64L << 20) / 8,
      s"10k compiled queries serialize to $nBytes B — must keep an 8x " +
        "margin under the 64 MB broadcast cap")
    // the gate itself: same set, tiny cap => loud failure, no broadcast
    // (doc matches exactly q5: the AND over alpha+beta of i=5 — every
    // other kind family uses disjoint letters-only vocabularies)
    val docsDf = Seq((1L, s"alpha${enc(5)} beta${enc(5)}")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Percolator.percolate(spark, docsDf, compiled, maxBroadcastBytes = 1024L)
    }
    assert(e.getMessage.contains("term-keyed candidate join"))
    // and the real path still runs with the 10k set resident
    val hits = Percolator.percolate(spark, docsDf, compiled).collect()
    assert(hits.map(_.getString(1)).toSet == Set("q5"))
  }
}
