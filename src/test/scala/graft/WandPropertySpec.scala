package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.PostingCodec
import graft.model.BM25
import graft.search.Wand

/** Property-style tests for the block-max WAND walk — pure Scala, no
  * Spark (seeded Random loops; the scalatest↔scalacheck bridge artifact
  * is not in the offline cache). Oracle: brute-force exact scoring of
  * every candidate doc, ordered (score desc, docId asc). WAND must return
  * the identical (docId, score-bitpattern) prefix for every k, including
  * heavy tie cases and single-posting lists. */
class WandPropertySpec extends AnyFunSuite {

  private val N = 1000L
  private val avgdl = 100.0

  private def randomLists(rng: Random): (Array[Array[(Long, Int)]], Array[Int]) = {
    val nTerms = 1 + rng.nextInt(6)
    val lists = Array.fill(nTerms) {
      val n = 1 + rng.nextInt(400)
      val ids = Iterator.continually(rng.nextInt(1000).toLong).take(n * 2)
        .toSet.take(n).toArray.sorted
      ids.map(d => (d, 1 + rng.nextInt(8)))
    }
    val lens = Array.fill(1000)(5 + rng.nextInt(295))
    (lists, lens)
  }

  private def cursors(lists: Array[Array[(Long, Int)]], lens: Array[Int]) =
    lists.zipWithIndex.map { case (ps, i) =>
      val idf = BM25.idf(N, ps.length.toLong)
      val impacts = ps.map { case (d, tf) => BM25.impact(idf, tf, lens(d.toInt), avgdl) }
      val packed = PostingCodec.pack(ps.map(_._1), ps.map(_._2), impacts)
      new Wand.TermCursor(i.toLong, idf,
        graft.model.PostingList(0, i.toLong, packed.numDocs, packed.lastDocIds,
          packed.maxImpacts, packed.offsets, packed.bytes))
    }

  private def bruteOr(lists: Array[Array[(Long, Int)]], lens: Array[Int], k: Int) = {
    val idfs = lists.map(ps => BM25.idf(N, ps.length.toLong))
    val byDoc = new scala.collection.mutable.TreeMap[Long, Double]()
    lists.indices.foreach { t => // ascending termId order — engine contract
      lists(t).foreach { case (d, tf) =>
        val imp = BM25.impact(idfs(t), tf, lens(d.toInt), avgdl)
        byDoc.update(d, byDoc.getOrElse(d, 0.0) + imp)
      }
    }
    byDoc.toArray.sortBy { case (d, s) => (-s, d) }.take(k)
      .map { case (d, s) => (d, java.lang.Double.doubleToLongBits(s)) }.toSeq
  }

  private def bruteAnd(lists: Array[Array[(Long, Int)]], lens: Array[Int], k: Int) = {
    val common = lists.map(_.map(_._1).toSet).reduce(_ intersect _)
    val idfs = lists.map(ps => BM25.idf(N, ps.length.toLong))
    common.toArray.sorted.map { d =>
      var s = 0.0
      lists.indices.foreach { t =>
        s += BM25.impact(idfs(t), lists(t).find(_._1 == d).get._2, lens(d.toInt), avgdl)
      }
      (d, s)
    }.sortBy { case (d, s) => (-s, d) }.take(k)
      .map { case (d, s) => (d, java.lang.Double.doubleToLongBits(s)) }.toSeq
  }

  test("WAND top-k == brute force, 200 random cases × k ∈ {1,3,10,50,1000}") {
    val rng = new Random(20260816L)
    (1 to 200).foreach { i =>
      val (lists, lens) = randomLists(rng)
      Seq(1, 3, 10, 50, 1000).foreach { k =>
        val got = Wand.topK(cursors(lists, lens), lens, 0L, avgdl, k)
          .map(s => (s.docId, java.lang.Double.doubleToLongBits(s.score))).toSeq
        val want = bruteOr(lists, lens, k)
        assert(got == want, s"case $i k=$k: WAND != brute")
      }
    }
  }

  test("MaxScore top-k == brute force == WAND bit-for-bit, " +
       "200 random cases × k ∈ {1,3,10,50,1000}") {
    val rng = new Random(20260820L)
    (1 to 200).foreach { i =>
      val (lists, lens) = randomLists(rng)
      Seq(1, 3, 10, 50, 1000).foreach { k =>
        val got = Wand.topKMaxScore(cursors(lists, lens), lens, 0L, avgdl, k)
          .map(s => (s.docId, java.lang.Double.doubleToLongBits(s.score))).toSeq
        val want = bruteOr(lists, lens, k)
        assert(got == want, s"case $i k=$k: MaxScore != brute")
        val wand = Wand.topK(cursors(lists, lens), lens, 0L, avgdl, k)
          .map(s => (s.docId, java.lang.Double.doubleToLongBits(s.score))).toSeq
        assert(got == wand, s"case $i k=$k: MaxScore != WAND")
      }
    }
  }

  test("MaxScore: tie-heavy corpus and k<=0 behave like WAND") {
    val lists = Array(Array.tabulate(100)(i => (i * 3L, 1)),
      Array.tabulate(100)(i => (i * 3L, 1)))
    val lens = Array.fill(1000)(100)
    val got = Wand.topKMaxScore(cursors(lists, lens), lens, 0L, avgdl, 10)
    assert(got.map(_.docId).toSeq == (0 until 10).map(_ * 3L))
    assert(got.map(_.score).distinct.length == 1)
    assert(Wand.topKMaxScore(cursors(lists, lens), lens, 0L, avgdl, 0).isEmpty)
  }

  test("exhaustive OR == brute force, 100 random cases") {
    val rng = new Random(77L)
    (1 to 100).foreach { i =>
      val (lists, lens) = randomLists(rng)
      Seq(1, 10, 1000).foreach { k =>
        val got = Wand.topKOrExhaustive(cursors(lists, lens), lens, 0L, avgdl, k)
          .map(s => (s.docId, java.lang.Double.doubleToLongBits(s.score))).toSeq
        assert(got == bruteOr(lists, lens, k), s"case $i k=$k")
      }
    }
  }

  test("AND intersection == brute force, 100 random cases") {
    val rng = new Random(99L)
    (1 to 100).foreach { i =>
      val (lists, lens) = randomLists(rng)
      Seq(1, 10, 1000).foreach { k =>
        val got = Wand.topKAnd(cursors(lists, lens), lens, 0L, avgdl, k)
          .map(s => (s.docId, java.lang.Double.doubleToLongBits(s.score))).toSeq
        assert(got == bruteAnd(lists, lens, k), s"case $i k=$k")
      }
    }
  }

  test("tie-heavy corpus: equal scores resolve to smaller docId") {
    // identical tf and dl everywhere ⇒ every matching doc scores equally
    val lists = Array(Array.tabulate(100)(i => (i * 3L, 1)),
      Array.tabulate(100)(i => (i * 3L, 1)))
    val lens = Array.fill(1000)(100)
    val got = Wand.topK(cursors(lists, lens), lens, 0L, avgdl, 10)
    assert(got.map(_.docId).toSeq == (0 until 10).map(_ * 3L))
    assert(got.map(_.score).distinct.length == 1)
  }
}
