package graft

import org.apache.spark.sql.Dataset

import graft.pipeline.{Ann, IvfIndex, SemDedup}

/** Semantic dedup (pipeline/SemDedup.scala): within-cluster pairs ≡
  * brute force given the assignment, the lowest-centroid-similarity
  * keep rule, exactly one survivor per duplicate group, drop counting,
  * and bit-determinism. */
class SemDedupSpec extends SparkSpec {

  private val p = SemDedup.Params(nlist = 8, iters = 10, dim = 16,
    sampleCap = 1024, tau = 0.995, listCap = 10000)

  /** 8 well-separated cluster centers; base points have jitter 0.1 (NOT
    * near-dups at tau=0.995); ids 1000+ are planted near-dup copies of
    * base points (jitter 0.001 ⇒ cosine ≈ 0.99999). */
  lazy val embeddings: Dataset[(Long, Array[Float])] = {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(53)
    val centers = Array.fill(8)(Array.fill(16)(rng.nextGaussian().toFloat))
    val base = (0 until 160).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + 0.1f * rng.nextGaussian().toFloat))
    }
    val dups = (0 until 24).map { i =>
      val (_, v) = base(i * 5)
      (1000L + i, v.map(x => x + 0.001f * rng.nextGaussian().toFloat))
    }
    (base ++ dups).toDS()
  }

  test("pairs == brute-force within-cluster pairs at tau") {
    val assigned = SemDedup.assign(spark, embeddings, p).collect()
    val got = SemDedup.pairs(
        SemDedup.assign(spark, embeddings, p), p.tau, p.listCap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val byList = assigned.groupBy(_.list)
    val want = (for {
      (_, rows) <- byList.toSeq
      sorted = rows.sortBy(_.vec_id)
      i <- sorted.indices
      j <- (i + 1) until sorted.length
      if Ann.cosine(sorted(i).embedding, sorted(j).embedding) >= p.tau
    } yield (sorted(i).vec_id, sorted(j).vec_id)).toSet
    assert(got == want)
    assert(got.nonEmpty, "fixture must contain planted within-cluster dups")
  }

  test("prune keeps exactly one member per group: the lowest centroid cosine") {
    val assigned = SemDedup.assign(spark, embeddings, p).collect()
      .map(a => a.vec_id -> a).toMap
    val pairs = SemDedup.pairs(
        SemDedup.assign(spark, embeddings, p), p.tau, p.listCap)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // brute-force union-find over the pairs
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val px = parent.getOrElse(x, x)
      if (px == x) x else { val r = find(px); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val groups = pairs.flatMap(pr => Seq(pr._1, pr._2)).distinct
      .groupBy(find)
    val keep = SemDedup.prune(spark, embeddings, p).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(keep.size == 184, "one verdict per vector")
    groups.values.foreach { members =>
      val kept = members.filter(keep)
      assert(kept.length == 1, s"group $members kept ${kept.toSeq}")
      val want = members.minBy(id =>
        (assigned(id).centroid_cos, id))
      assert(kept.head == want,
        s"group keeps $want (lowest centroid cos), got ${kept.head}")
    }
    // every un-grouped vector survives
    val grouped = groups.values.flatten.toSet
    keep.foreach { case (id, k) =>
      if (!grouped.contains(id)) assert(k, s"un-grouped $id must keep")
    }
    assert(grouped.nonEmpty && grouped.size < 184)
  }

  test("over-cap cells are dropped AND counted") {
    val acc = spark.sparkContext.longAccumulator("semDropped")
    val tiny = p.copy(listCap = 2)
    val got = SemDedup.pairs(
      SemDedup.assign(spark, embeddings, tiny), tiny.tau, tiny.listCap,
      Some(acc))
    assert(got.count() == 0, "every cell exceeds cap 2 in this fixture")
    assert(acc.value > 0, "drops must be counted, never silent")
  }

  test("prune is bit-deterministic across runs and parallelism") {
    val a = SemDedup.prune(spark, embeddings, p).collect().toSeq
    val b = SemDedup.prune(spark,
      embeddings.repartition(7), p).collect().toSeq
    assert(a == b)
  }

  test("assignment matches the IVF coarse quantizer's nearest-centroid rule") {
    val cents = IvfIndex.train(
      IvfIndex.sampleFor(embeddings, p.sampleCap), p.coarse)
    val got = SemDedup.assign(spark, embeddings, p).collect()
    got.foreach { a =>
      val v = graft.pipeline.PqIndex.normalize(
        embeddings.collect().find(_._1 == a.vec_id).get._2)
      val best = cents.indices.maxBy(c =>
        (v.indices.map(i => v(i) * cents(c)(i)).sum, -c))
      assert(a.list == best, s"vec ${a.vec_id}")
    }
  }
}
