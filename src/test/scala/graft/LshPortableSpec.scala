package graft

import graft.pipeline.{Ann, LshPortable, Sq8}

/** Portable (md5-plane, integer-projection) LSH top-k
  * (pipeline/LshPortable.scala): exact equality with a plain-Scala
  * simulation of the whole pipeline (buckets → candidates → exact-
  * cosine ranking), a recall gate against brute force on clustered
  * data, parallelism invariance, and validation. */
class LshPortableSpec extends SparkSpec {

  lazy val embeddings = {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(41)
    val centers = Array.fill(8)(Array.fill(16)(rng.nextGaussian().toFloat))
    (0 until 160).map { i =>
      val c = centers(i % 8)
      val v = c.map(x => x + 0.1f * rng.nextGaussian().toFloat)
      (i.toLong, v)
    }.toDS()
  }

  lazy val stats: Sq8.Stats = Sq8.train(embeddings)
  lazy val codes = Sq8.codes(embeddings, stats)
  private val p = LshPortable.Params(tables = 8, planes = 6, dim = 16)

  private def run(k: Int) = {
    val qs = embeddings.collect().filter(_._1 < 8)
    LshPortable.topK(codes, embeddings, stats, qs, k, p).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
  }

  test("portable LSH equals the plain-Scala simulation end to end") {
    val all = embeddings.collect()
    val qs = all.filter(_._1 < 8)
    val got = run(10)
    val signs = LshPortable.signs(p)
    val codeMap = all.map { case (id, emb) => (id, Sq8.encode(emb, stats)) }.toMap
    val buckets = all.flatMap { case (id, _) =>
      (0 until p.tables).map(t => ((t, LshPortable.signature(codeMap(id), signs(t))), id))
    }.groupBy(_._1).map { case (b, xs) => (b, xs.map(_._2).toSet) }
    val embMap = all.toMap
    val want = qs.flatMap { case (qid, qemb) =>
      val cand = (0 until p.tables)
        .flatMap(t => buckets.getOrElse((t, LshPortable.signature(codeMap(qid), signs(t))), Set.empty))
        .toSet - qid
      cand.toSeq
        .map(nid => (nid, math.rint(Ann.cosine(qemb, embMap(nid)) * 1e6) / 1e6))
        .sortBy { case (nid, cos) => (-cos, nid) }
        .take(10).zipWithIndex
        .map { case ((nid, cos), i) => (qid, nid, cos, i + 1) }
    }.sortBy(t => (t._1, t._4))
    assert(got.sortBy(t => (t._1, t._4)).toSeq == want.toSeq)
  }

  test("recall vs brute force holds on clustered data; deterministic " +
       "across parallelism; validation") {
    val qs = embeddings.collect().filter(_._1 < 8)
    val exact = Ann.bruteTopK(embeddings, qs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val approx = run(10)
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val recalls = qs.map { case (qid, _) =>
      exact(qid).intersect(approx.getOrElse(qid, Set.empty)).size
    }
    assert(recalls.sum >= qs.length * 7, // avg ≥ 7/10 on 8 tight clusters
      s"avg recall too low: ${recalls.toSeq}")
    assert(recalls.forall(_ >= 5), s"per-query floor: ${recalls.toSeq}")
    val again = LshPortable.topK(Sq8.codes(embeddings.repartition(7), stats),
        embeddings.repartition(3), stats, qs, 10, p).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(again.sortBy(t => (t._1, t._4)).toSeq ==
      run(10).sortBy(t => (t._1, t._4)).toSeq)
    intercept[IllegalArgumentException](LshPortable.Params(tables = 0))
    intercept[IllegalArgumentException](LshPortable.Params(planes = 31))
    intercept[IllegalArgumentException](
      LshPortable.topK(codes, embeddings, stats, qs, 0, p))
  }
}
