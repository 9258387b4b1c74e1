package graft

import graft.pipeline.Bpe

/** BPE trainer (pipeline.Bpe): the classic Sennrich fixture produces
  * the hand-computed merge sequence, training is parallelism-invariant
  * and count-weighted, and the greedy encoder round-trips words into
  * subwords consistent with the learned merges. */
class BpeSpec extends SparkSpec {

  // Sennrich et al.'s worked example: {low:5, lower:2, newest:6,
  // widest:3}. Hand-computed merge sequence (ties by pair asc):
  //   1. (e,s)   9   [newest 6 + widest 3]
  //   2. (es,t)  9
  //   3. (est,</w>) 9
  //   4. (l,o)   7   [low 5 + lower 2]
  //   5. (lo,w)  7
  private val fixture = Array(("low", 5L), ("lower", 2L),
    ("newest", 6L), ("widest", 3L))

  test("the classic fixture yields the hand-computed merges") {
    val merges = Bpe.train(fixture, 5)
    val got = merges.map(m => (m.left, m.right, m.count))
    assert(got == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", Bpe.EndOfWord, 9L),
      ("l", "o", 7L), ("lo", "w", 7L)), got.toString)
  }

  test("training exhausts gracefully when no pairs remain") {
    val merges = Bpe.train(Array(("ab", 3L)), 100)
    // ab</w>: (a,b) then (ab,</w>) — 2 merges possible, loop stops
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("a", "b"), ("ab", Bpe.EndOfWord)))
  }

  test("encode applies merges greedily by rank") {
    val merges = Bpe.train(fixture, 5)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    assert(Bpe.encode("newest", ranks).toSeq ==
      Seq("n", "e", "w", "est" + Bpe.EndOfWord))
    assert(Bpe.encode("low", ranks).toSeq == Seq("low", Bpe.EndOfWord))
    assert(Bpe.encode("lowest", ranks).toSeq ==
      Seq("low", "est" + Bpe.EndOfWord))
    // unseen word: falls back to characters + end marker
    assert(Bpe.encode("zq", ranks).toSeq == Seq("z", "q", Bpe.EndOfWord))
  }

  test("corpus training is count-weighted and parallelism-invariant") {
    import spark.implicits._
    // plant the fixture as documents: word w repeated cnt times
    val text = fixture.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
    val docs1 = Seq((0L, text.mkString(" "))).toDF("doc_id", "text")
    val docsN = text.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toSeq.toDF("doc_id", "text")
      .repartition(7)
    val m1 = Bpe.trainOn(spark, docs1, 5).collect().map(_.toSeq).toSeq
    val mN = Bpe.trainOn(spark, docsN, 5).collect().map(_.toSeq).toSeq
    assert(m1 == mN)
    assert(m1.map(r => (r(1), r(2))) == Seq(("e", "s"), ("es", "t"),
      ("est", Bpe.EndOfWord), ("l", "o"), ("lo", "w")))
  }

  test("token counts under the learned vocab match per-word encodes") {
    import spark.implicits._
    val docs = Seq((0L, "newest lowest"), (1L, "low low widest"))
      .toDF("doc_id", "text")
    val merges = Bpe.trainOn(spark, docs, 5)
    val ranks = merges.collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getInt(0)).toMap
    val got = Bpe.tokenCounts(spark, docs, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(
      0L -> (Bpe.encode("newest", ranks).length +
        Bpe.encode("lowest", ranks).length).toLong,
      1L -> (2 * Bpe.encode("low", ranks).length +
        Bpe.encode("widest", ranks).length).toLong)
    assert(got == want, s"got=$got want=$want")
  }
}
