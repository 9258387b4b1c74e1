package graft

import org.apache.spark.sql.functions.{col, sha2}

import graft.pipeline.Bloom

/** Portable Bloom prefilter (pipeline/Bloom.scala): the no-false-
  * negative guarantee, exact brute-force membership equality (false
  * positives INCLUDED — the md5-portable hash family makes even the
  * collisions deterministic), the prefilter contract over a corpus, and
  * parallelism invariance. */
class BloomSpec extends SparkSpec {

  private def keysDf(ks: Seq[String]) = {
    import spark.implicits._
    ks.toDF("key")
  }

  test("no false negatives; membership equals the brute-force bit rule") {
    val inserted = (0 until 50).map(i => s"key-$i")
    val p = Bloom.Params(bits = 64, hashes = 3) // tiny: forces collisions
    val words = Bloom.build(keysDf(inserted), p)
    inserted.foreach(k => assert(Bloom.mightContain(k, words, p), s"FN on $k"))
    // brute-force bit set from the same portable positions
    val setPos = inserted.flatMap(Bloom.positions(_, p)).toSet
    val probes = inserted ++ (0 until 200).map(i => s"probe-$i")
    var fps = 0
    probes.foreach { k =>
      val want = Bloom.positions(k, p).forall(setPos.contains)
      assert(Bloom.mightContain(k, words, p) == want, s"mismatch on $k")
      if (want && !inserted.contains(k)) fps += 1
    }
    // 50 keys × 3 hashes into 64 bits saturates most of the array —
    // false positives MUST occur, and each one matched brute force above
    assert(fps > 0, "tiny filter produced no false positives to check")
  }

  test("prefilter: positives ⊇ members, exact flag correct, no shuffle " +
       "of the corpus, parallelism-invariant") {
    import spark.implicits._
    val docs = (0L until 120L).map(i => (i, s"text body number ${i % 40}"))
      .toDF("doc_id", "text").repartition(7)
    val block = docs.filter(col("doc_id") < 20) // texts 0..19 (each ×3 docs)
      .select(sha2(col("text"), 256).as("key"))
    val p = Bloom.Params(bits = 128, hashes = 3) // small: some FPs likely
    val got = Bloom.prefilter(docs, block, p).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    // brute force
    val texts = (0L until 120L).map(i => (i, s"text body number ${i % 40}"))
    def sha(s: String) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val memberKeys = texts.filter(_._1 < 20).map(t => sha(t._2)).toSet
    val setPos = memberKeys.flatMap(Bloom.positions(_, p))
    val want = texts.flatMap { case (id, t) =>
      val k = sha(t)
      if (Bloom.positions(k, p).forall(setPos.contains))
        Some((id, memberKeys.contains(k)))
      else None
    }.sortBy(_._1)
    assert(got.toSeq == want)
    // no false negatives: every true member is emitted with exact=true
    val exactIds = texts.filter(t => memberKeys.contains(sha(t._2))).map(_._1).toSet
    assert(exactIds.subsetOf(got.filter(_._2).map(_._1).toSet))
    // parallelism invariance
    val again = Bloom.prefilter(docs.repartition(3), block, p).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    assert(again.toSeq == got.toSeq)
    intercept[IllegalArgumentException](Bloom.Params(bits = 0))
    intercept[IllegalArgumentException](Bloom.Params(hashes = 0))
  }
}
