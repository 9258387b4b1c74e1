package graft

import graft.pipeline.{Ann, IvfPqIndex, PqIndex}

/** IVF-PQ composed index (pipeline/IvfPq.scala): the residual-ADC
  * identity (per-probe LUT sum == distance to centroid + residual
  * reconstruction), bit-determinism, the one-list/m-byte layout, probe
  * pushdown, and recall vs exact brute force on clustered data. */
class IvfPqSpec extends SparkSpec {

  private val p = IvfPqIndex.Params(nlist = 8, m = 8, ksub = 32,
    iters = 10, dim = 16, sampleCap = 1024)

  lazy val embeddings = {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(41)
    // 8 cluster centers, 160 points jittered around them — the regime
    // where routing + quantization keep the true neighbor set stable
    val centers = Array.fill(8)(Array.fill(16)(rng.nextGaussian().toFloat))
    (0 until 160).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + 0.1f * rng.nextGaussian().toFloat))
    }.toDS()
  }

  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-ivfpqidx").toString
    IvfPqIndex.build(spark, embeddings, d, p)
    d
  }

  test("residual ADC equals the distance to centroid + decoded residual") {
    val idx = IvfPqIndex.load(spark, dir)
    val rng = new java.util.SplittableRandom(99)
    (1 to 50).foreach { _ =>
      val qemb = Array.fill(16)(rng.nextGaussian().toFloat)
      val xemb = Array.fill(16)(rng.nextGaussian().toFloat)
      val (l, rx) = IvfPqIndex.residual(xemb, idx.centroids)
      val code = PqIndex.encodeRaw(rx, idx.codebooks, p.pq)
      // query residual against the SAME list the stored vector routed to
      val q = PqIndex.normalize(qemb)
      val rq = q.indices.map(i => q(i) - idx.centroids(l)(i)).toArray
      val lut = PqIndex.lutForRaw(rq, idx.codebooks, p.pq)
      val adc = (0 until p.m).map(s => lut(s)(code(s) & 0xff)).sum
      val rec = IvfPqIndex.reconstruct(l, code, idx.centroids, idx.codebooks, p)
      val direct = q.indices.map(i => { val t = q(i) - rec(i); t * t }).sum
      assert(math.abs(adc - direct) < 1e-12, s"$adc vs $direct")
    }
  }

  test("build is bit-deterministic (two builds => identical codes and ranking)") {
    val d2 = java.nio.file.Files.createTempDirectory("graft-ivfpqidx2").toString
    IvfPqIndex.build(spark, embeddings, d2, p)
    val a = IvfPqIndex.load(spark, dir)
    val b = IvfPqIndex.load(spark, d2)
    val ca = a.codes.collect().sortBy(_.vec_id)
    val cb = b.codes.collect().sortBy(_.vec_id)
    assert(ca.length == cb.length)
    ca.zip(cb).foreach { case (x, y) =>
      assert(x.list == y.list && x.vec_id == y.vec_id &&
        x.code.sameElements(y.code))
    }
    val qs = embeddings.collect().filter(_._1 < 4)
    val ra = a.topK(qs, 10, nProbe = 3).collect().toSeq
    val rb = b.topK(qs, 10, nProbe = 3).collect().toSeq
    assert(ra == rb)
  }

  test("each vector stored once, in one list, as m code bytes") {
    val idx = IvfPqIndex.load(spark, dir)
    val rows = idx.codes.collect()
    assert(rows.length == 160, "one row per vector (no LSH-style redundancy)")
    assert(rows.map(_.vec_id).toSet.size == 160)
    assert(rows.forall(_.code.length == p.m))
    assert(rows.map(_.list).toSet.subsetOf((0 until 8).toSet))
  }

  test("probe-list predicate is pushed into the parquet scan") {
    val idx = IvfPqIndex.load(spark, dir)
    val qs = embeddings.collect().filter(_._1 < 2)
    val plan = idx.topK(qs, 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(list"),
      s"probe pushdown missing from plan:\n$plan")
  }

  test("pruned probes keep high R@10 vs exact brute force on clustered data") {
    // the FAISS metric: the true nearest neighbor is inside the
    // approximate top-10 (deep-set equality is not the PQ contract)
    val qs = embeddings.collect().filter(_._1 < 16)
    val trueNn = Ann.bruteTopK(embeddings, qs, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val top = IvfPqIndex.load(spark, dir).topK(qs, 10, nProbe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val hits = qs.count(q => top.getOrElse(q._1, Set.empty).contains(trueNn(q._1)))
    val r10 = hits.toDouble / qs.length
    assert(r10 >= 0.85, s"IVF-PQ R@10 $r10 too low at nProbe=3/8")
  }

  test("reconstruction cosine is within quantization error of exact cosine") {
    val qs = embeddings.collect().filter(_._1 < 4)
    val exact = Ann.bruteTopK(embeddings, qs, 10).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val approx = IvfPqIndex.load(spark, dir).topK(qs, 10, nProbe = 8).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val shared = exact.keySet.intersect(approx.keySet)
    assert(shared.nonEmpty)
    shared.foreach { k =>
      assert(math.abs(exact(k) - approx(k)) < 0.15,
        s"$k exact=${exact(k)} ivfpq=${approx(k)}")
    }
  }
}
