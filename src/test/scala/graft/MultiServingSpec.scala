package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.build.BuildParams
import graft.corpus.{DatasetCorpusSource, Synthesizer}
import graft.index.{ChunkedIndexer, IndexStorage}
import graft.search.{MultiSearcher, MultiServingSearcher}

/** Multi-segment serving parity: the low-latency tier over an
  * un-compacted 2-segment (chunked) index must be bit-identical to the
  * relational merge-on-read path (MultiSearcher) for every query kind —
  * the live LSM read path at serving latency. */
class MultiServingSpec extends SparkSpec {

  lazy val (segA, segB) = {
    val dir = Files.createTempDirectory("graft-mserve").toString
    val params = BuildParams(numPartitions = 8, bucketSize = 100, positional = true)
    val indexer = new ChunkedIndexer(dir, chunkDocs = 100, params)
    val (dirs, _) = indexer.build(spark,
      DatasetCorpusSource(Synthesizer.tiny(spark)))
    assert(dirs.size == 2)
    (IndexStorage.read(spark, dirs(0)), IndexStorage.read(spark, dirs(1)))
  }

  test("multi-segment serving hits == MultiSearcher merge-on-read, all kinds") {
    val segs = Seq(segA, segB)
    val multi = new MultiSearcher(spark, segs)
    val serving = new MultiServingSearcher(spark, segs)
    val terms = segA.dict.orderBy(desc("cf")).limit(3).collect().map(_.term)
    val queries = Seq(
      ("FREE", terms.mkString(" ")),
      ("AND", terms.take(2).mkString(" AND ")),
      ("OR", terms.mkString(" OR ")),
      ("BOOL", s"(${terms(0)} OR ${terms(1)}) AND ${terms(2)}"),
      ("NEAR", s"${terms(0)} NEAR/5 ${terms(1)}"),
      ("PREFIX", terms(0).take(2) + "*"),
      ("FREE", "zzznotaterm"))
    var nonEmpty = 0
    queries.foreach { case (kind, text) =>
      val rel = multi.hits(kind, text, 20).collect()
        .map(h => (h.rank, h.docId, h.score)).toSeq
      val srv = serving.hits(kind, text, 20)
        .map(h => (h.rank, h.docId, h.score)).toSeq
      assert(srv == rel, s"$kind '$text': serving ${srv.take(3)} vs rel ${rel.take(3)}")
      if (rel.nonEmpty) nonEmpty += 1
    }
    serving.close()
    assert(nonEmpty >= 4, "fixture queries must mostly hit")
  }
}
