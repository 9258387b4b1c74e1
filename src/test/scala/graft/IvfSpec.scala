package graft

import graft.pipeline.{Ann, IvfIndex}

/** IVF-Flat coarse-quantizer index (pipeline/Ivf.scala): determinism,
  * exactness at full probe width, recall under pruning, and the
  * probe-list pushdown that makes it the billion-scale layout. */
class IvfSpec extends SparkSpec {

  lazy val embeddings = {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(23)
    // 8 cluster centers, 160 points jittered around them
    val centers = Array.fill(8)(Array.fill(16)(rng.nextGaussian().toFloat))
    (0 until 160).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + 0.1f * rng.nextGaussian().toFloat))
    }.toDS()
  }

  lazy val ivfDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-ivfidx").toString
    IvfIndex.build(spark, embeddings, d,
      IvfIndex.Params(nlist = 8, iters = 10, dim = 16))
    d
  }

  test("k-means training is deterministic (same sample => identical centroids)") {
    val sample = IvfIndex.sampleFor(embeddings, 100)
    val p = IvfIndex.Params(nlist = 8, iters = 10, dim = 16)
    val a = IvfIndex.train(sample, p)
    val b = IvfIndex.train(sample, p)
    assert(a.length == 8)
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) })
    // unit-norm centroids
    a.foreach { c =>
      val n = c.map(x => x * x).sum
      assert(math.abs(n - 1.0) < 1e-9, s"centroid norm $n not 1")
    }
  }

  test("nProbe = nlist is EXACTLY brute-force top-k (every list probed)") {
    val qs = embeddings.collect().filter(_._1 < 8)
    val brute = Ann.bruteTopK(embeddings, qs, 5)
      .orderBy("query_id", "rank").collect().toSeq
    val ivf = IvfIndex.load(spark, ivfDir).topK(qs, 5, nProbe = 8)
      .orderBy("query_id", "rank").collect().toSeq
    assert(ivf == brute)
  }

  test("pruned probes keep high recall on clustered data") {
    val qs = embeddings.collect().filter(_._1 < 8)
    val brute = Ann.bruteTopK(embeddings, qs, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = IvfIndex.load(spark, ivfDir).topK(qs, 5, nProbe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"IVF recall $recall too low at nProbe=3/8")
  }

  test("each vector lands in exactly one list; lists cover the corpus") {
    val idx = IvfIndex.load(spark, ivfDir)
    val rows = idx.lists.collect()
    assert(rows.length == 160, "IVF stores each vector once (no LSH-style redundancy)")
    assert(rows.map(_.getAs[Long]("vec_id")).toSet.size == 160)
    val lists = rows.map(_.getAs[Int]("list")).toSet
    assert(lists.subsetOf((0 until 8).toSet))
  }

  test("probe-list predicate is pushed into the parquet scan") {
    val idx = IvfIndex.load(spark, ivfDir)
    val qs = embeddings.collect().filter(_._1 < 2)
    val plan = idx.topK(qs, 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(list"),
      s"probe pushdown missing from plan:\n$plan")
  }

  test("probesFor ranks lists by cosine desc with id tie-break, capped at nlist") {
    val idx = IvfIndex.load(spark, ivfDir)
    val q = embeddings.collect().head._2
    val p2 = idx.probesFor(q, 2)
    val pAll = idx.probesFor(q, 99)
    assert(p2.length == 2 && pAll.length == 8)
    assert(pAll.take(2).sameElements(p2), "probe order must be a stable prefix")
    assert(pAll.toSet == (0 until 8).toSet)
  }
}
