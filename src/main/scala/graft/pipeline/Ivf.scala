package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-Flat ANN index — a coarse spherical-k-means quantizer routes each
  * vector to one inverted list; queries probe only the nProbe nearest
  * lists (the inverted-file design of Jégou/Douze/Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 §III — without
  * the PQ residual compression, i.e. FAISS's IndexIVFFlat layout).
  *
  * Complements [[AnnIndex]] (hyperplane LSH): LSH buys recall with
  * redundant tables (each vector stored `tables` times), IVF stores each
  * vector ONCE and trades recall via nProbe — at 100 TB the index is
  * corpus-sized, not `tables`× corpus-sized, which is why IVF is the
  * standard billion-scale layout.
  *
  * Scale posture:
  *  - TRAIN on a bounded deterministic sample (hash-ordered global top-k
  *    — a per-partition TakeOrdered + driver merge, never a corpus
  *    collect), Lloyd iterations driver-side over ≤ sampleCap vectors.
  *  - ASSIGN in one narrow pass (broadcast centroids, no shuffle of the
  *    embedding data beyond the one-off list-sort write).
  *  - QUERY computes probe lists driver-side (|q|·nlist dot products),
  *    pushes `list IN (probes)` into the parquet scan — the list-sorted
  *    layout turns it into row-group pruning, so a query reads
  *    ~nProbe/nlist of the corpus — then broadcast-joins the tiny query
  *    table and scores exactly.
  *
  * Determinism (the rank-identity contract): seeded k-means++ init over
  * the hash-ordered sample, fixed Lloyd iteration count, Double
  * arithmetic in fixed left-to-right order, argmax ties broken by lowest
  * list id, empty clusters keep their previous centroid. Same input +
  * params ⇒ bit-identical centroids, assignments, and rankings on any
  * cluster size.
  */
object IvfIndex {

  /** One inverted-list entry. Public: Spark encoders fail codegen on
    * private case classes. */
  final case class ListRow(list: Int, vec_id: Long, embedding: Array[Float])

  final case class Params(nlist: Int = 16, iters: Int = 10,
                          sampleCap: Int = 65536, dim: Int = 64,
                          seed: Long = 9000L)

  private def normalize(v: Array[Float]): Array[Double] = {
    var n = 0.0
    var i = 0
    while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
    val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
    val out = new Array[Double](v.length)
    i = 0
    while (i < v.length) { out(i) = v(i).toDouble * inv; i += 1 }
    out
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < a.length) { d += a(i) * b(i); i += 1 }
    d
  }

  /** Nearest centroid by cosine (= dot, both sides unit-norm); ties →
    * lowest list id (strict `>` keeps the first maximum). */
  private[pipeline] def nearest(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestDot = dot(v, cents(0))
    var c = 1
    while (c < cents.length) {
      val d = dot(v, cents(c))
      if (d > bestDot) { best = c; bestDot = d }
      c += 1
    }
    best
  }

  /** Spherical k-means over a driver-side sample: seeded k-means++ init
    * (Arthur & Vassilvitskii, SODA 2007) then `iters` Lloyd rounds.
    * Returns unit-norm centroids, deterministically. */
  def train(sample: Array[Array[Float]], p: Params): Array[Array[Double]] = {
    require(sample.nonEmpty, "IVF training sample is empty")
    val xs = sample.map(normalize)
    val n = xs.length
    val k = math.min(p.nlist, n)
    val rng = new java.util.SplittableRandom(p.seed)

    // k-means++ on cosine distance (1 - dot)
    val cents = new Array[Array[Double]](k)
    cents(0) = xs(rng.nextInt(n)).clone()
    val d2 = new Array[Double](n)
    var i = 0
    while (i < n) { d2(i) = math.max(0.0, 1.0 - dot(xs(i), cents(0))); i += 1 }
    var c = 1
    while (c < k) {
      var total = 0.0
      i = 0
      while (i < n) { total += d2(i); i += 1 }
      var pick = 0
      if (total <= 0.0) pick = rng.nextInt(n)
      else {
        var r = rng.nextDouble() * total
        while (pick < n - 1 && r >= d2(pick)) { r -= d2(pick); pick += 1 }
      }
      cents(c) = xs(pick).clone()
      i = 0
      while (i < n) {
        val d = math.max(0.0, 1.0 - dot(xs(i), cents(c)))
        if (d < d2(i)) d2(i) = d
        i += 1
      }
      c += 1
    }

    // Lloyd: assign (ties → lowest id), mean, re-normalize; empty
    // cluster keeps its previous centroid.
    var it = 0
    while (it < p.iters) {
      val sums = Array.fill(k)(new Array[Double](xs(0).length))
      val counts = new Array[Long](k)
      i = 0
      while (i < n) {
        val a = nearest(xs(i), cents)
        val s = sums(a)
        val x = xs(i)
        var j = 0
        while (j < x.length) { s(j) += x(j); j += 1 }
        counts(a) += 1
        i += 1
      }
      c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var norm = 0.0
          var j = 0
          while (j < sums(c).length) { norm += sums(c)(j) * sums(c)(j); j += 1 }
          if (norm > 0.0) {
            val inv = 1.0 / math.sqrt(norm)
            j = 0
            while (j < sums(c).length) { sums(c)(j) *= inv; j += 1 }
            cents(c) = sums(c)
          }
        }
        c += 1
      }
      it += 1
    }
    cents
  }

  /** Bounded deterministic training sample: global top-`sampleCap` rows
    * by xxhash64(vec_id) — per-partition TakeOrdered + driver merge, so
    * driver memory is O(sampleCap·dim) regardless of corpus size. */
  def sampleFor(embeddings: Dataset[(Long, Array[Float])], cap: Int): Array[Array[Float]] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings.toDF("vec_id", "embedding")
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(cap)
      .select(col("embedding")).as[Array[Float]]
      .collect()
  }

  /** Train + one narrow assignment pass → list-sorted parquet under
    * `dir` (lists + centroids + params). */
  def build(spark: SparkSession, embeddings: Dataset[(Long, Array[Float])],
            dir: String, p: Params = Params()): IvfIndex = {
    import spark.implicits._
    val cents = train(sampleFor(embeddings, p.sampleCap), p)
    val bc = spark.sparkContext.broadcast(cents)
    embeddings.map { case (id, emb) =>
      ListRow(nearest(normalize(emb), bc.value), id, emb)
    }.toDF()
      .repartitionByRange(col("list"), col("vec_id"))
      .sortWithinPartitions("list", "vec_id")
      .write.mode("overwrite").parquet(s"$dir/lists")
    cents.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
      .toDF("list", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    Files.writeString(Paths.get(dir, "params.json"),
      s"""{"nlist":${p.nlist},"iters":${p.iters},"sampleCap":${p.sampleCap},""" +
        s""""dim":${p.dim},"seed":${p.seed}}""")
    load(spark, dir)
  }

  def load(spark: SparkSession, dir: String): IvfIndex = {
    val json = Files.readString(Paths.get(dir, "params.json"))
    def num(key: String): Long = {
      val m = java.util.regex.Pattern.compile("\"" + key + "\":(-?[0-9]+)").matcher(json)
      require(m.find(), s"missing $key in params.json")
      m.group(1).toLong
    }
    val p = Params(num("nlist").toInt, num("iters").toInt,
      num("sampleCap").toInt, num("dim").toInt, num("seed"))
    import spark.implicits._
    val cents = spark.read.parquet(s"$dir/centroids")
      .select(col("list"), col("centroid")).as[(Int, Array[Double])]
      .collect().sortBy(_._1).map(_._2)
    new IvfIndex(spark, dir, p, cents)
  }
}

final class IvfIndex(spark: SparkSession, dir: String,
                     val params: IvfIndex.Params,
                     val centroids: Array[Array[Double]]) {
  import IvfIndex._
  import spark.implicits._

  /** The persisted inverted lists, list-sorted. Read fresh per query
    * (pruned by the pushed `list IN` predicate); a serving tier can
    * `.cache()` it. */
  def lists: DataFrame = spark.read.parquet(s"$dir/lists")

  /** The nProbe nearest lists for one query vector, by (cos desc, list
    * asc) — driver-side: nlist·dim dot products. */
  def probesFor(emb: Array[Float], nProbe: Int): Array[Int] = {
    val v = {
      var n = 0.0; var i = 0
      while (i < emb.length) { n += emb(i).toDouble * emb(i).toDouble; i += 1 }
      val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
      val out = new Array[Double](emb.length)
      i = 0
      while (i < emb.length) { out(i) = emb(i).toDouble * inv; i += 1 }
      out
    }
    centroids.indices
      .map(c => (c, {
        var d = 0.0; var i = 0
        while (i < v.length) { d += v(i) * centroids(c)(i); i += 1 }
        d
      }))
      .sortBy { case (c, d) => (-d, c) }
      .take(math.min(nProbe, centroids.length))
      .map(_._1).toArray
  }

  /** Approximate top-k neighbors per query: probe-list pushdown scan +
    * broadcast query join + exact cosine on the survivors. Output
    * (query_id, neighbor_id, cos, rank) ranked by (round(cos,6) desc,
    * neighbor_id) — the same contract as Ann.bruteTopK, to which this is
    * EXACTLY equal when nProbe ≥ nlist (every list probed). */
  def topK(queries: Array[(Long, Array[Float])], k: Int, nProbe: Int): DataFrame = {
    require(queries.nonEmpty)
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val qrows = queries.flatMap { case (qid, qemb) =>
      probesFor(qemb, nProbe).map(l => (qid, l, qemb))
    }
    val allProbes = qrows.map(_._2).distinct.sorted
    val qdf = broadcast(qrows.toSeq.toDF("query_id", "qlist", "qemb"))
    lists.filter(col("list").isin(allProbes.map(Int.box): _*))
      .join(qdf, col("list") === col("qlist"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(AnnIndex.nativeCos(spark, col("qemb"), col("embedding")), 6).as("cos"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }
}
