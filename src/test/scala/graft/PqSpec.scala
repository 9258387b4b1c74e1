package graft

import graft.pipeline.{Ann, PqIndex}

/** Product-quantization index (pipeline/Pq.scala): the ADC identity
  * (LUT sum == distance to the reconstruction), determinism, the 32×
  * compression, and recall against exact brute force on clustered data. */
class PqSpec extends SparkSpec {

  // dsub = 2 with 32 centroids per subspace: fine enough to resolve the
  // within-cluster jitter that separates true neighbors
  private val p = PqIndex.Params(m = 8, ksub = 32, iters = 10, dim = 16,
    sampleCap = 1024)

  lazy val embeddings = {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(31)
    // 8 cluster centers, 160 points jittered around them — the regime
    // where the true neighbor set is stable under quantization
    val centers = Array.fill(8)(Array.fill(16)(rng.nextGaussian().toFloat))
    (0 until 160).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + 0.1f * rng.nextGaussian().toFloat))
    }.toDS()
  }

  lazy val pqDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-pqidx").toString
    PqIndex.build(spark, embeddings, d, p)
    d
  }

  test("ADC via LUT equals the distance to the reconstructed vector") {
    val sample = embeddings.collect().map(_._2)
    val books = PqIndex.train(sample, p)
    val rng = new java.util.SplittableRandom(77)
    (1 to 50).foreach { _ =>
      val q = Array.fill(16)(rng.nextGaussian().toFloat)
      val x = Array.fill(16)(rng.nextGaussian().toFloat)
      val code = PqIndex.encode(x, books, p)
      val lut = PqIndex.lutFor(q, books, p)
      val adc = (0 until p.m).map(s => lut(s)(code(s) & 0xff)).sum
      val qn = PqIndex.normalize(q)
      val rec = PqIndex.decode(code, books, p)
      val direct = qn.indices.map(i => { val t = qn(i) - rec(i); t * t }).sum
      assert(math.abs(adc - direct) < 1e-12, s"$adc vs $direct")
    }
  }

  test("training and encoding are deterministic") {
    val sample = embeddings.collect().map(_._2)
    val a = PqIndex.train(sample, p)
    val b = PqIndex.train(sample, p)
    assert(a.zip(b).forall { case (x, y) =>
      x.zip(y).forall { case (u, v) => u.sameElements(v) }
    })
    val v = sample(17)
    assert(PqIndex.encode(v, a, p).sameElements(PqIndex.encode(v, b, p)))
  }

  test("codes are m bytes per vector — the compression that scans 100 TB") {
    val idx = PqIndex.load(spark, pqDir)
    val rows = idx.codes.collect()
    assert(rows.length == 160)
    assert(rows.forall(_.code.length == p.m))
    assert(rows.map(_.vec_id).toSet.size == 160)
  }

  test("ADC keeps high R@10 vs exact brute force on clustered data") {
    // the standard PQ metric (FAISS): is each query's TRUE nearest
    // neighbor inside the approximate top-10? (Set-equality of deep
    // top-k is NOT the PQ contract — codes collapse jitter-level
    // distinctions within a cluster by design.)
    val qs = embeddings.collect().filter(_._1 < 16)
    val trueNn = Ann.bruteTopK(embeddings, qs, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pqTop = PqIndex.load(spark, pqDir).topK(qs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val hits = qs.count(q => pqTop.getOrElse(q._1, Set.empty).contains(trueNn(q._1)))
    val r10 = hits.toDouble / qs.length
    assert(r10 >= 0.85, s"PQ R@10 $r10 too low (m=${p.m}, ksub=${p.ksub})")
  }

  test("reconstruction cosine is within quantization error of exact cosine") {
    val qs = embeddings.collect().filter(_._1 < 4)
    val exact = Ann.bruteTopK(embeddings, qs, 10).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val approx = PqIndex.load(spark, pqDir).topK(qs, 10).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val shared = exact.keySet.intersect(approx.keySet)
    assert(shared.nonEmpty)
    shared.foreach { k =>
      assert(math.abs(exact(k) - approx(k)) < 0.15,
        s"$k exact=${exact(k)} pq=${approx(k)}")
    }
  }
}
