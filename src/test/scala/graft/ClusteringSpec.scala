package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Dataset

import graft.pipeline.{Clustering, IvfIndex}
import graft.tokenize.Tokenizer

/** Labeled corpus clustering (pipeline/Clustering.scala): the whole
  * output — sizes, exact-integer cohesion, tf·idf labels — against an
  * independent driver-side recount (own normalize/nearest/score
  * reimplementation, not the pipeline's), bit-determinism under input
  * repartitioning, the label-vocabulary law, and validation. */
class ClusteringSpec extends SparkSpec {

  private val p = IvfIndex.Params(nlist = 4, iters = 10, dim = 16,
    sampleCap = 1024, seed = 77L)

  /** 4 well-separated topics × 12 docs. Every doc holds BOTH its
    * topic's words (one of them 3× extra) plus corpus-wide words whose
    * idf is exactly 0 — so topic words are the only positive scores. */
  private lazy val fixture: (Seq[(Long, Array[Float])], Seq[(Long, String)]) = {
    val rng = new java.util.SplittableRandom(91)
    val centers = Array.fill(4)(Array.fill(16)(rng.nextGaussian().toFloat))
    val topicWords = Array(
      Array("alpha", "beta"), Array("gamma", "delta"),
      Array("epsilon", "zeta"), Array("eta", "theta"))
    val rows = (0 until 48).map { i =>
      val c = i % 4
      val emb = centers(c).map(x => x + 0.05f * rng.nextGaussian().toFloat)
      val words = Seq.fill(3)(topicWords(c)(i % 2)) ++
        topicWords(c).toSeq ++ Seq("common", "filler")
      (i.toLong, emb, words.mkString(" "))
    }
    (rows.map(r => (r._1, r._2)), rows.map(r => (r._1, r._3)))
  }

  private def embDS: Dataset[(Long, Array[Float])] = {
    import spark.implicits._
    fixture._1.toDS()
  }
  private def docsDF: DataFrame = {
    import spark.implicits._
    fixture._2.toDF("doc_id", "content")
  }

  // independent reimplementation of the assignment arithmetic
  private def normalize(v: Array[Float]): Array[Double] = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
    val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
    v.map(_.toDouble * inv)
  }
  private def nearestCos(v: Array[Double], cents: Array[Array[Double]])
      : (Int, Double) = {
    // left-to-right dot like the engine's
    def dot(c: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < v.length) { d += v(i) * c(i); i += 1 }
      d
    }
    var best = 0
    var bd = dot(cents(0))
    var c = 1
    while (c < cents.length) {
      val d = dot(cents(c))
      if (d > bd) { best = c; bd = d }
      c += 1
    }
    (best, bd)
  }

  /** Full expected output, recomputed driver-side. */
  private def expected(topTerms: Int): Seq[(Int, Long, Double, Seq[String])] = {
    val (embs, docs) = fixture
    val cents = IvfIndex.train(IvfIndex.sampleFor(embDS, p.sampleCap), p)
    val assigned = embs.map { case (id, emb) =>
      val (list, cos) = nearestCos(normalize(emb), cents)
      (id, list, math.floor(cos * 1e6 + 0.5) / 1e6)
    }
    val listOf = assigned.map(a => a._1 -> a._2).toMap
    val nDocs = assigned.length.toDouble
    // per-(list, term): ctf and doc count; df across lists
    val docTerms = docs.map { case (id, text) =>
      (listOf(id), Tokenizer.tokenize(text).groupBy(identity)
        .map { case (t, xs) => t -> xs.length.toLong })
    }
    val ltf = scala.collection.mutable.Map.empty[(Int, String), (Long, Long)]
    docTerms.foreach { case (list, tfs) =>
      tfs.foreach { case (t, c) =>
        val (a, b) = ltf.getOrElse((list, t), (0L, 0L))
        ltf((list, t)) = (a + c, b + 1L)
      }
    }
    val df = ltf.toSeq.groupBy(_._1._2)
      .map { case (t, xs) => t -> xs.map(_._2._2).sum }
    assigned.groupBy(_._2).toSeq.map { case (list, members) =>
      val n = members.length.toLong
      val microSum = members.map(m => math.floor(m._3 * 1e6 + 0.5).toLong).sum
      val cohesion = math.floor(microSum.toDouble / n + 0.5) / 1e6
      val terms = ltf.toSeq.collect { case ((l, t), (ctf, _)) if l == list =>
        val score = math.floor(
          ctf.toDouble * math.log(nDocs / df(t).toDouble) * 1e6 + 0.5) / 1e6
        (t, score)
      }.sortBy { case (t, s) => (-s, t) }.take(topTerms).map(_._1)
      (list, n, cohesion, terms)
    }.sortBy(_._1)
  }

  private def collect(df: DataFrame): Seq[(Int, Long, Double, Seq[String])] =
    df.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
      r.getSeq[String](3).toSeq)).toSeq

  test("clusterTopics == driver-side brute force (sizes, cohesion, labels)") {
    val got = collect(Clustering.clusterTopics(spark, docsDF, embDS, p, 2))
    assert(got == expected(2))
    assert(got.map(_._2).sum == 48L)
    assert(got.forall(_._3 > 0.9), "tight clusters must be cohesive")
  }

  test("output is bit-identical under input repartitioning") {
    val a = collect(Clustering.clusterTopics(spark, docsDF, embDS, p, 3))
    val b = collect(Clustering.clusterTopics(
      spark, docsDF.repartition(7), embDS.repartition(5), p, 3))
    assert(a == b)
  }

  test("labels draw only from topic vocabulary (idf-0 words excluded)") {
    val planted = Set("alpha", "beta", "gamma", "delta",
      "epsilon", "zeta", "eta", "theta")
    val got = collect(Clustering.clusterTopics(spark, docsDF, embDS, p, 2))
    assert(got.flatMap(_._4).toSet.subsetOf(planted),
      s"corpus-wide (idf 0) words leaked into labels: ${got.flatMap(_._4)}")
    assert(got.forall(_._4.size == 2))
  }

  test("parameter validation") {
    intercept[IllegalArgumentException] {
      Clustering.clusterTopics(spark, docsDF, embDS, p, 0)
    }
  }
}
