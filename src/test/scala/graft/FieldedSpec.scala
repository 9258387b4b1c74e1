package graft

import org.apache.spark.sql.functions._

import graft.build.{BuildParams, SegmentBuilder}
import graft.corpus.{DatasetCorpusSource, Synthesizer}
import graft.search.{QueryParser, Searcher}

/** Fielded query atoms (`lang:x`, `repo:y`): parse, and the bitset
  * filter must be exactly equivalent to filtering a global ranking. */
class FieldedSpec extends SparkSpec {

  lazy val seg = {
    val (s, _) = SegmentBuilder.build(spark,
      DatasetCorpusSource(Synthesizer.corpus(spark, 300L)),
      BuildParams(numPartitions = 4, bucketSize = 64, positional = true))
    s
  }
  lazy val searcher = new Searcher(spark, seg)

  test("parseFields extracts lang:/repo: atoms anywhere and keeps the rest") {
    assert(QueryParser.parseFields("lang:scala fast merge") ==
      (Map("lang" -> "scala"), "fast merge"))
    assert(QueryParser.parseFields("fast repo:r1 merge lang:go") ==
      (Map("repo" -> "r1", "lang" -> "go"), "fast merge"))
    assert(QueryParser.parseFields("fast merge") == (Map.empty, "fast merge"))
    // unknown fields stay query text
    assert(QueryParser.parseFields("size:3 fast")._2 == "size:3 fast")
    // numeric range atom
    assert(QueryParser.parseFields("len:40..120 fast") ==
      (Map("len" -> "40..120"), "fast"))
    // path glob atom
    assert(QueryParser.parseFields("path:src/* fast") ==
      (Map("path" -> "src/*"), "fast"))
  }

  test("globToLike translates globs and escapes LIKE metacharacters") {
    assert(QueryParser.globToLike("src/*") == "src/%")
    assert(QueryParser.globToLike("a?c") == "a_c")
    assert(QueryParser.globToLike("50%_x") == "50\\%\\_x")
    assert(QueryParser.globToLike("plain") == "plain")
  }

  test("path: glob atom == filtered global ranking (predicate bitset)") {
    val terms = seg.dict.orderBy(desc("df")).limit(2).collect().map(_.term)
    val q = s"${terms(0)} ${terms(1)}"
    // synthesizer paths are src/<dir>/<file><n>.<ext>: glob one dir —
    // a strict, non-empty subset of the corpus
    val someDir = seg.docs.select(col("path")).head().getString(0).split("/")(1)
    val glob = s"src/$someDir/*"
    val likePat = QueryParser.globToLike(glob)
    val inGlob = seg.docs.filter(col("path").like(likePat))
      .select(col("docId")).collect().map(_.getLong(0)).toSet
    assert(inGlob.nonEmpty && inGlob.size < seg.stats.numDocs)
    val got = searcher.predFieldedHits("FREE", q, 10, s"path:$glob",
        col("path").like(likePat))
      .collect().map(h => (h.docId, h.score)).toSeq
    val want = searcher.hitsExhaustive("FREE", q, seg.stats.numDocs.toInt)
      .collect().filter(h => inGlob(h.docId))
      .sortBy(h => (-h.score, h.docId)).take(10)
      .map(h => (h.docId, h.score)).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("len: range atom == filtered global ranking (predicate bitset)") {
    val terms = seg.dict.orderBy(desc("df")).limit(2).collect().map(_.term)
    val q = s"${terms(0)} ${terms(1)}"
    // pick a band that keeps a strict, non-empty subset of the corpus
    val lens = seg.docs.select(col("docLen")).collect().map(_.getInt(0)).sorted
    val (lo, hi) = (lens(lens.length / 4).toLong, lens(3 * lens.length / 4).toLong)
    val inRange = seg.docs
      .filter(col("docLen") >= lo && col("docLen") <= hi)
      .select(col("docId")).collect().map(_.getLong(0)).toSet
    assert(inRange.nonEmpty && inRange.size < seg.stats.numDocs)
    val got = searcher.predFieldedHits("FREE", q, 10, s"len:$lo..$hi",
        col("docLen") >= lo && col("docLen") <= hi)
      .collect().map(h => (h.docId, h.score)).toSeq
    val want = searcher.hitsExhaustive("FREE", q, seg.stats.numDocs.toInt)
      .collect().filter(h => inRange(h.docId))
      .sortBy(h => (-h.score, h.docId)).take(10)
      .map(h => (h.docId, h.score)).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("fielded hits == filtered global ranking (same global stats)") {
    val lang = seg.docs.groupBy(col("lang")).count()
      .orderBy(desc("count")).limit(1).collect().head.getString(0)
    val langDocs = seg.docs.filter(col("lang") === lang)
      .select(col("docId")).collect().map(_.getLong(0)).toSet
    assert(langDocs.nonEmpty)
    val terms = seg.dict.orderBy(desc("df")).limit(2).collect().map(_.term)
    val q = s"${terms(0)} ${terms(1)}"

    val fielded = searcher.fieldedHits("FREE", q, 10, "lang", lang).collect()
      .map(h => (h.docId, h.score)).toSeq
    // oracle: global exhaustive ranking, filtered to the lang set, top 10
    val global = searcher.hitsExhaustive("FREE", q, seg.stats.numDocs.toInt)
      .collect().filter(h => langDocs(h.docId))
      .sortBy(h => (-h.score, h.docId)).take(10)
      .map(h => (h.docId, h.score)).toSeq
    assert(fielded.nonEmpty && fielded == global)
  }

  test("fielded AND / PHRASE kinds honor the filter too") {
    val lang = seg.docs.groupBy(col("lang")).count()
      .orderBy(desc("count")).limit(1).collect().head.getString(0)
    val langDocs = seg.docs.filter(col("lang") === lang)
      .select(col("docId")).collect().map(_.getLong(0)).toSet
    val terms = seg.dict.orderBy(desc("df")).limit(2).collect().map(_.term)
    val got = searcher.fieldedHits("AND", s"${terms(0)} AND ${terms(1)}", 50,
      "lang", lang).collect()
    assert(got.nonEmpty)
    assert(got.forall(h => langDocs(h.docId)))
  }

  test("facets: per-lang matching-doc counts for OR and AND semantics") {
    import spark.implicits._
    val terms = seg.dict.orderBy(desc("df")).limit(2).collect().map(_.term)
    val byDoc = graft.search.ExactScorer.decodedPostings(spark, seg)
      .toDF("termId", "docId", "tf")
      .join(seg.dict.select($"termId", $"term"), "termId")
      .select($"docId", $"term").as[(Long, String)].collect()
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).toSet }
    val langOf = seg.docs.select($"docId", $"lang").as[(Long, String)]
      .collect().toMap
    def brute(pred: Set[String] => Boolean): Map[String, Long] =
      byDoc.collect { case (d, s) if pred(s) => langOf(d) }
        .groupBy(identity).map { case (l, xs) => l -> xs.size.toLong }

    val orGot = searcher.facets("FREE", s"${terms(0)} ${terms(1)}", "lang")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(orGot == brute(s => s(terms(0)) || s(terms(1))))
    val andGot = searcher.facets("AND", s"${terms(0)} AND ${terms(1)}", "lang")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(andGot == brute(s => s(terms(0)) && s(terms(1))))

    // matchCount = the facet totals (same match set, no facet grouping)
    assert(searcher.matchCount("FREE", s"${terms(0)} ${terms(1)}") ==
      orGot.values.sum)
    assert(searcher.matchCount("AND", s"${terms(0)} AND ${terms(1)}") ==
      andGot.values.sum)
    assert(searcher.matchCount("FREE", "zzznotaterm") == 0L)
    assert(searcher.matchCount("PREFIX", terms(0).take(2) + "*") >=
      searcher.matchCount("FREE", terms(0)))
  }

  test("serving tier fielded hits are bit-identical to the relational path") {
    val lang = seg.docs.groupBy(col("lang")).count()
      .orderBy(desc("count")).limit(1).collect().head.getString(0)
    val terms = seg.dict.orderBy(desc("df")).limit(2).collect().map(_.term)
    val q = s"${terms(0)} ${terms(1)}"
    val rel = searcher.fieldedHits("FREE", q, 10, "lang", lang).collect()
      .map(h => (h.rank, h.docId, h.score)).toSeq
    val serving = new graft.search.ServingSearcher(spark, seg)
    val srv = serving.fieldedHits("FREE", q, 10, "lang", lang)
      .map(h => (h.rank, h.docId, h.score)).toSeq
    serving.close()
    assert(rel.nonEmpty && srv == rel)
  }

  test("scoped + fielded compose: repo range AND lang filter") {
    val repo = seg.docs.groupBy(col("repo")).count()
      .orderBy(desc("count")).limit(1).collect().head.getString(0)
    val range = seg.docs.filter(col("repo") === repo)
      .agg(min(col("docId")), max(col("docId"))).collect().head
    val (lo, hi) = (range.getLong(0), range.getLong(1) + 1)
    val lang = seg.docs.filter(col("repo") === repo)
      .groupBy(col("lang")).count()
      .orderBy(desc("count")).limit(1).collect().head.getString(0)
    val okDocs = seg.docs
      .filter(col("repo") === repo && col("lang") === lang)
      .select(col("docId")).collect().map(_.getLong(0)).toSet
    val terms = seg.dict.orderBy(desc("df")).limit(1).collect().map(_.term)
    val got = searcher.scopedFieldedHits("FREE", terms(0), 100, lo, hi,
      "lang", lang).collect()
    assert(got.nonEmpty)
    assert(got.forall(h => okDocs(h.docId)))
  }
}
