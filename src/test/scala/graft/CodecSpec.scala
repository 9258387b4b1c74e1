package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec.{PostingCodec, VByte}
import scala.util.Random

/** Property-style tests via seeded Random loops (the scalatest↔scalacheck
  * bridge artifact is not in the offline coursier cache). */
class CodecSpec extends AnyFunSuite {

  // --- VByte ---

  test("vbyte roundtrip: specific values") {
    val vals = Seq(0L, 1L, 127L, 128L, 129L, 16383L, 16384L, Int.MaxValue.toLong,
      1L << 40, (1L << 40) + 7, Long.MaxValue)
    val buf = new Array[Byte](VByte.MaxBytes * vals.size)
    var pos = 0
    vals.foreach(v => pos = VByte.encode(v, buf, pos))
    val c = new VByte.Cursor(buf, 0)
    vals.foreach(v => assert(c.read() == v))
    assert(c.pos == pos)
  }

  test("vbyte sizeOf matches encode; random roundtrip") {
    val rnd = new Random(42)
    (1 to 2000).foreach { _ =>
      val v = rnd.nextLong() & Long.MaxValue // non-negative
      val buf = new Array[Byte](VByte.MaxBytes)
      val end = VByte.encode(v, buf, 0)
      assert(end == VByte.sizeOf(v))
      assert(new VByte.Cursor(buf, 0).read() == v)
    }
  }

  // --- PostingCodec ---

  private def randIds(rnd: Random, n: Int, maxGap: Long = 1L << 20): Array[Long] = {
    var cur = -1L
    Array.fill(n) { cur += 1 + (rnd.nextLong() & Long.MaxValue) % maxGap; cur }
  }

  private def packOf(ids: Array[Long]): PostingCodec.Packed = {
    val tfs = ids.indices.map(i => 1 + (i % 7)).toArray
    val impacts = tfs.map(tf => 1.5 * tf / (tf + 3.0))
    PostingCodec.pack(ids, tfs, impacts)
  }

  private def randPositions(rnd: Random, tfs: Array[Int]): Array[Array[Int]] =
    tfs.map { tf =>
      var p = -1
      Array.fill(tf) { p += 1 + rnd.nextInt(20); p }
    }

  test("positional pack/decode roundtrip incl. block boundaries") {
    val rnd = new Random(19)
    val sizes = Seq(1, 127, 128, 129, 300) ++ Seq.fill(20)(1 + rnd.nextInt(500))
    sizes.foreach { n =>
      val ids = randIds(rnd, n)
      val tfs = ids.indices.map(i => 1 + (i % 5)).toArray
      val impacts = tfs.map(tf => 1.5 * tf / (tf + 3.0))
      val poss = randPositions(rnd, tfs)
      val p = PostingCodec.pack(ids, tfs, impacts, poss)
      val (gotIds, gotTfs, gotPos) = PostingCodec.decodeAllPos(p)
      assert(gotIds.toSeq == ids.toSeq, s"n=$n")
      assert(gotTfs.toSeq == tfs.toSeq)
      assert(gotPos.map(_.toSeq).toSeq == poss.map(_.toSeq).toSeq, s"n=$n")
    }
  }

  test("positional nextGeq: skipping positions keeps docId/tf/positions aligned") {
    val rnd = new Random(23)
    (1 to 50).foreach { _ =>
      val n = 1 + rnd.nextInt(600)
      val ids = randIds(rnd, n, maxGap = 50)
      val tfs = ids.indices.map(i => 1 + (i % 4)).toArray
      val impacts = tfs.map(_.toDouble)
      val poss = randPositions(rnd, tfs)
      val p = PostingCodec.pack(ids, tfs, impacts, poss)
      val c = PostingCodec.cursor(p, positional = true)
      // jump to a few random targets; verify landing posting is intact
      (1 to 10).foreach { _ =>
        val target = ids(rnd.nextInt(n))
        if (!c.exhausted && c.docId < target) {
          c.nextGeq(target)
          val i = ids.indexOf(c.docId)
          assert(i >= 0 && c.docId >= target)
          assert(c.tf == tfs(i))
          assert(c.positions().toSeq == poss(i).toSeq)
        }
      }
    }
  }

  test("pack/decode roundtrip incl. block boundaries") {
    val rnd = new Random(7)
    val sizes = Seq(1, 2, 127, 128, 129, 255, 256, 257, 300) ++
      Seq.fill(30)(1 + rnd.nextInt(600))
    sizes.foreach { n =>
      val ids = randIds(rnd, n)
      val p = packOf(ids)
      val (gotIds, gotTfs) = PostingCodec.decodeAll(p)
      assert(gotIds.toSeq == ids.toSeq, s"n=$n")
      assert(gotTfs.toSeq == ids.indices.map(i => 1 + (i % 7)))
      assert(p.lastDocIds.last == ids.last)
      assert(p.numDocs == n)
      assert(p.lastDocIds.length == (n + 127) / 128)
    }
  }

  test("huge gaps (2^40-scale docIds)") {
    val rnd = new Random(11)
    val ids = randIds(rnd, 300, maxGap = 1L << 40)
    assert(PostingCodec.decodeDocIds(packOf(ids)).toSeq == ids.toSeq)
  }

  test("blockMax is an upper bound for every in-block impact") {
    val rnd = new Random(13)
    (1 to 20).foreach { _ =>
      val ids = randIds(rnd, 1 + rnd.nextInt(500))
      val tfs = ids.indices.map(_ => 1 + rnd.nextInt(50)).toArray
      val impacts = tfs.map(tf => 11.734551 * tf / (tf + 0.312))
      val p = PostingCodec.pack(ids, tfs, impacts)
      ids.indices.foreach { i =>
        assert(p.maxImpacts(i / 128).toDouble >= impacts(i))
      }
    }
  }

  test("cursor nextGeq: exact, between, past-end, idempotent") {
    val ids = Array.tabulate(500)(i => (i * 3 + 1).toLong) // 1,4,7,...
    val p = packOf(ids)
    var c = PostingCodec.cursor(p)
    c.nextGeq(301); assert(!c.exhausted && c.docId == 301)
    c.nextGeq(302); assert(c.docId == 304)
    c.nextGeq(100); assert(c.docId == 304) // never goes backward
    c.nextGeq(1400); assert(c.docId == 1402) // first 3i+1 >= 1400
    c.nextGeq(ids.last + 1); assert(c.exhausted)
    c = PostingCodec.cursor(p)
    c.nextGeq(ids.last); assert(c.docId == ids.last)
    c.next(); assert(c.exhausted)
  }

  test("cursor nextGeq property: equals linear scan") {
    val rnd = new Random(17)
    (1 to 40).foreach { _ =>
      val ids = randIds(rnd, 1 + rnd.nextInt(700), maxGap = 1000)
      val targets = Seq.fill(20)(rnd.nextLong() & ((1L << 21) - 1)).sorted
      val c = PostingCodec.cursor(packOf(ids))
      targets.foreach { t =>
        if (!c.exhausted) {
          val floor = c.docId // cursor never moves backward
          c.nextGeq(t)
          val expected = ids.find(d => d >= t && d >= floor)
            .orElse(ids.find(_ >= floor)).filter(_ >= math.min(t, Long.MaxValue))
          val linear = ids.find(d => d >= math.max(t, floor))
          if (linear.isEmpty && t > floor) assert(c.exhausted)
          else if (t <= floor) assert(c.docId == floor)
          else assert(c.docId == linear.get)
        }
      }
    }
  }

  test("cursor sequential walk with tf across blocks") {
    val ids = Array.tabulate(257)(i => i.toLong * 2)
    val c = PostingCodec.cursor(packOf(ids))
    var i = 0
    while (!c.exhausted) {
      assert(c.docId == ids(i) && c.tf == 1 + (i % 7))
      c.next(); i += 1
    }
    assert(i == 257)
  }

  test("skipBlock jumps past current block") {
    val ids = Array.tabulate(400)(i => i.toLong)
    val c = PostingCodec.cursor(packOf(ids))
    assert(c.docId == 0)
    c.skipBlock(); assert(c.docId == 128)
    c.skipBlock(); assert(c.docId == 256)
    c.skipBlock(); assert(c.docId == 384)
    c.skipBlock(); assert(c.exhausted)
  }

  test("codec output is byte-stable (deterministic)") {
    val ids = Array.tabulate(300)(i => (i * 5 + 2).toLong)
    val a = packOf(ids); val b = packOf(ids)
    assert(java.util.Arrays.equals(a.bytes, b.bytes))
    assert(a.offsets.toSeq == b.offsets.toSeq)
  }

  test("single posting and error cases") {
    val p = packOf(Array(0L))
    assert(PostingCodec.decodeDocIds(p).toSeq == Seq(0L))
    intercept[IllegalArgumentException] {
      PostingCodec.pack(Array.empty[Long], Array.empty[Int], Array.empty[Double])
    }
    intercept[IllegalArgumentException] { // non-increasing
      PostingCodec.pack(Array(5L, 5L), Array(1, 1), Array(0.1, 0.1))
    }
  }

  test("upperFloat is a true upper bound") {
    val rnd = new Random(23)
    (1 to 5000).foreach { _ =>
      val d = rnd.nextDouble() * 40.0
      assert(PostingCodec.upperFloat(d).toDouble >= d)
    }
  }
}
