package graft

import graft.pipeline.{Ann, Sq8}

/** Scalar (int8) quantization (pipeline/Sq8.scala): the affine
  * round-trip error bound, the [0,255] code range (incl. a degenerate
  * constant dimension), determinism, and recall of the asymmetric scan
  * against exact brute force. */
class Sq8Spec extends SparkSpec {

  lazy val embeddings = {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(41)
    val centers = Array.fill(8)(Array.fill(16)(rng.nextGaussian().toFloat))
    (0 until 160).map { i =>
      val c = centers(i % 8)
      val v = c.map(x => x + 0.1f * rng.nextGaussian().toFloat)
      v(15) = 2.5f // degenerate dimension: constant across the corpus
      (i.toLong, v)
    }.toDS()
  }

  lazy val stats: Sq8.Stats = Sq8.train(embeddings)

  test("codes land in [0,255]; a degenerate dimension codes 0") {
    val rows = embeddings.collect()
    rows.foreach { case (_, v) =>
      val code = Sq8.encode(v, stats)
      assert(code.forall(c => c >= 0 && c <= 255))
      assert(code(15) == 0) // max == min on dim 15
    }
  }

  test("reconstruction error is bounded by half a quantization step") {
    val rows = embeddings.collect()
    rows.foreach { case (_, v) =>
      val rec = Sq8.reconstruct(Sq8.encode(v, stats), stats)
      v.indices.foreach { d =>
        val range = stats.maxs(d) - stats.mins(d)
        val bound = if (range > 0) range / 255.0 / 2.0 + 1e-12 else 1e-12
        val err = math.abs(v(d).toDouble - rec(d))
        // dim 15 is degenerate: reconstruct yields min == the constant
        assert(err <= bound, s"dim $d err $err > $bound")
      }
    }
  }

  test("training is deterministic and exact (corpus min/max per dim)") {
    val a = Sq8.train(embeddings)
    val b = Sq8.train(embeddings)
    assert(a.mins.sameElements(b.mins) && a.maxs.sameElements(b.maxs))
    val rows = embeddings.collect().map(_._2)
    (0 until 16).foreach { d =>
      assert(a.mins(d) == rows.map(_(d).toDouble).min)
      assert(a.maxs(d) == rows.map(_(d).toDouble).max)
    }
  }

  test("asymmetric SQ8 scan keeps near-exact top-10 vs brute force") {
    val qs = embeddings.collect().filter(_._1 < 16)
    val codes = Sq8.codes(embeddings, stats)
    val exact = Ann.bruteTopK(embeddings, qs, 10).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val approx = Sq8.topK(codes, stats, qs, 10).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    // 8-bit per-dim quantization is fine enough that the top-10 SET
    // matches exactly on clustered data, and scores sit within the
    // accumulated per-dim quantization error
    val exactSets = exact.groupBy(_._1._1).map { case (q, rs) => q -> rs.map(_._1._2).toSet }
    val approxSets = approx.groupBy(_._1._1).map { case (q, rs) => q -> rs.map(_._1._2).toSet }
    qs.foreach { case (qid, _) =>
      val overlap = exactSets(qid).intersect(approxSets(qid)).size
      assert(overlap >= 9, s"query $qid overlap $overlap < 9 of 10")
    }
    val approxMap = approx.toMap
    exact.foreach { case (k, cos) =>
      approxMap.get(k).foreach(a => assert(math.abs(cos - a) < 0.01, s"$k $cos vs $a"))
    }
  }

  test("oversample covering the corpus makes the rescore ≡ brute force") {
    val qs = embeddings.collect().filter(_._1 < 8)
    val codes = Sq8.codes(embeddings, stats)
    // k·oversample = 160 ≥ N−1 ⇒ every vector is a candidate
    val rescored = Sq8.topKRescored(codes, stats, embeddings, qs, 10, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val exact = Ann.bruteTopK(embeddings, qs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rescored.sortBy(t => (t._1, t._4)).toSeq ==
      exact.sortBy(t => (t._1, t._4)).toSeq)
  }

  test("rescore emits exact cosines, candidates contain the result, and " +
       "per-query recall never drops below the quantized-only recall") {
    val qs = embeddings.collect().filter(_._1 < 16)
    val qmap = qs.toMap
    val all = embeddings.collect().toMap
    val codes = Sq8.codes(embeddings, stats)
    val k = 10; val m = 3
    val pool = Sq8.topK(codes, stats, qs, k * m).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val poolSets = pool.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val quant = Sq8.topK(codes, stats, qs, k).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val quantSets = quant.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val res = Sq8.topKRescored(codes, stats, embeddings, qs, k, m).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val resSets = res.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val exactSets = Ann.bruteTopK(embeddings, qs, k).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    res.foreach { case (qid, nid, cos) =>
      // every emitted score is the exact float cosine, 6-dp rounded
      val want = math.rint(Ann.cosine(qmap(qid), all(nid)) * 1e6) / 1e6
      assert(cos == want, s"($qid,$nid) $cos != $want")
      assert(poolSets(qid).contains(nid), s"$nid not in $qid's candidate pool")
    }
    qs.foreach { case (qid, _) =>
      val rRecall = exactSets(qid).intersect(resSets(qid)).size
      val qRecall = exactSets(qid).intersect(quantSets(qid)).size
      assert(rRecall >= qRecall, s"query $qid rescore recall $rRecall < quantized $qRecall")
      // the containment theorem: true top-k ∩ pool ⊆ rescored top-k
      assert(exactSets(qid).intersect(poolSets(qid)).subsetOf(resSets(qid)))
    }
    intercept[IllegalArgumentException](
      Sq8.topKRescored(codes, stats, embeddings, qs, 10, 0))
    intercept[IllegalArgumentException](
      Sq8.topKRescored(codes, stats, embeddings, qs, 0, 2))
  }
}
