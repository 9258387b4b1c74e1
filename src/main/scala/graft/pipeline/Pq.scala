package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Product-quantization ANN index (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — the FAISS
  * IndexPQ layout): vectors are unit-normalized, split into `m`
  * subspaces, and each subvector is replaced by the id of its nearest
  * codebook centroid — one BYTE per subspace (ksub ≤ 256). A dim-64
  * float vector compresses 256 B → 8 B (32×), which is what makes a
  * 10^12-vector corpus scannable: at 100 TB of raw embeddings the code
  * table is ~3 TB and the scan is narrow, sequential, and
  * codegen-friendly.
  *
  * Query = ADC, asymmetric distance computation (TPAMI'11 §IV.A): the
  * query stays un-quantized; per subspace a 256-entry LUT of partial
  * squared L2 distances to every centroid is computed ONCE driver-side
  * and broadcast, and each stored code's distance is m LUT lookups —
  * exactly the squared distance between the query and the RECONSTRUCTED
  * vector (PqSpec pins that identity). Unit-norm both sides ⇒ L2 rank ==
  * cosine rank; reported score is cos = 1 − d²/2 of the reconstruction.
  *
  * Approximate BY DESIGN (quantization error ⇒ no exact SQL twin — the
  * same posture as the LSH index: recall is gated in PqSpec against the
  * exact brute force, on clustered data where the answer is stable).
  * Complements the ladder: brute force (exact oracle) → hyperplane LSH
  * (redundant tables) → IVF-Flat (pruned scan, full vectors) → PQ
  * (compressed scan). The IVF router composes: assign codes to IVF
  * lists and the probe filter prunes the code scan the same way —
  * FAISS's IndexIVFPQ; kept out of v1 since testdata lists hold ~100
  * codes.
  *
  * Determinism: seeded per-subspace k-means (k-means++ init over a
  * hash-ordered bounded sample, fixed Lloyd rounds, ties to the lowest
  * centroid id), Double arithmetic in fixed order — same input + params
  * ⇒ bit-identical codebooks, codes, and rankings at any parallelism.
  */
object PqIndex {

  /** One encoded vector. Public: Spark encoders fail codegen on private
    * case classes. */
  final case class CodeRow(vec_id: Long, code: Array[Byte])

  final case class Params(m: Int = 8, ksub: Int = 256, iters: Int = 10,
                          sampleCap: Int = 65536, dim: Int = 64,
                          seed: Long = 11000L) {
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    require(ksub >= 1 && ksub <= 256, "ksub must fit one byte")
    def dsub: Int = dim / m
  }

  /** Unit-normalize (L2 rank == cosine rank depends on it; public so
    * the spec can pin the ADC/reconstruction identity). */
  def normalize(v: Array[Float]): Array[Double] = {
    var n = 0.0
    var i = 0
    while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
    val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
    val out = new Array[Double](v.length)
    i = 0
    while (i < v.length) { out(i) = v(i).toDouble * inv; i += 1 }
    out
  }

  /** Squared L2 between `v[off, off+len)` and `c[0, len)`. */
  @inline private def sub2(v: Array[Double], off: Int, c: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < c.length) { val t = v(off + i) - c(i); d += t * t; i += 1 }
    d
  }

  /** Plain k-means (squared L2) over sub-vectors: seeded k-means++ init,
    * fixed Lloyd rounds, ties → lowest id, empty clusters keep their
    * previous centroid. Deterministic. */
  private def kmeans(xs: Array[Array[Double]], k: Int, iters: Int,
                     rng: java.util.SplittableRandom): Array[Array[Double]] = {
    val n = xs.length
    val kk = math.min(k, n)
    val cents = new Array[Array[Double]](kk)
    cents(0) = xs(rng.nextInt(n)).clone()
    val d2 = xs.map(x => sub2(x, 0, cents(0)))
    var c = 1
    while (c < kk) {
      var total = 0.0
      var i = 0
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
        val d = sub2(xs(i), 0, cents(c))
        if (d < d2(i)) d2(i) = d
        i += 1
      }
      c += 1
    }
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](xs(0).length))
      val counts = new Array[Long](kk)
      var i = 0
      while (i < n) {
        var best = 0
        var bd = sub2(xs(i), 0, cents(0))
        c = 1
        while (c < kk) {
          val d = sub2(xs(i), 0, cents(c))
          if (d < bd) { best = c; bd = d }
          c += 1
        }
        val s = sums(best)
        val x = xs(i)
        var j = 0
        while (j < x.length) { s(j) += x(j); j += 1 }
        counts(best) += 1
        i += 1
      }
      c = 0
      while (c < kk) {
        if (counts(c) > 0) {
          var j = 0
          while (j < sums(c).length) { sums(c)(j) /= counts(c); j += 1 }
          cents(c) = sums(c)
        }
        c += 1
      }
      it += 1
    }
    cents
  }

  /** Per-subspace codebooks trained on normalized sample vectors:
    * codebooks(s)(j) is centroid j of subspace s. */
  def train(sample: Array[Array[Float]], p: Params): Array[Array[Array[Double]]] = {
    require(sample.nonEmpty, "PQ training sample is empty")
    trainRaw(sample.map(normalize), p)
  }

  /** Codebooks over raw (already-prepared) vectors — the residual-PQ
    * entry point ([[IvfPqIndex]] trains on q − centroid residuals, which
    * must NOT be re-normalized). */
  def trainRaw(xs: Array[Array[Double]], p: Params): Array[Array[Array[Double]]] = {
    require(xs.nonEmpty, "PQ training sample is empty")
    val rng = new java.util.SplittableRandom(p.seed)
    Array.tabulate(p.m) { s =>
      val sub = xs.map(_.slice(s * p.dsub, (s + 1) * p.dsub))
      kmeans(sub, p.ksub, p.iters, rng)
    }
  }

  /** Encode one vector: per subspace, the nearest codebook centroid id
    * (squared L2, ties → lowest id). */
  def encode(emb: Array[Float], books: Array[Array[Array[Double]]],
             p: Params): Array[Byte] =
    encodeRaw(normalize(emb), books, p)

  /** Encode a raw vector (no normalization) — residuals go through here. */
  def encodeRaw(v: Array[Double], books: Array[Array[Array[Double]]],
                p: Params): Array[Byte] = {
    val code = new Array[Byte](p.m)
    var s = 0
    while (s < p.m) {
      val book = books(s)
      var best = 0
      var bd = sub2(v, s * p.dsub, book(0))
      var j = 1
      while (j < book.length) {
        val d = sub2(v, s * p.dsub, book(j))
        if (d < bd) { best = j; bd = d }
        j += 1
      }
      code(s) = best.toByte
      s += 1
    }
    code
  }

  /** Reconstruct the quantized vector a code denotes. */
  def decode(code: Array[Byte], books: Array[Array[Array[Double]]],
             p: Params): Array[Double] = {
    val out = new Array[Double](p.dim)
    var s = 0
    while (s < p.m) {
      val c = books(s)(code(s) & 0xff)
      System.arraycopy(c, 0, out, s * p.dsub, p.dsub)
      s += 1
    }
    out
  }

  /** The per-query ADC lookup table: lut(s)(j) = ‖q_s − books(s)(j)‖².
    * ADC distance of a code = Σ_s lut(s)(code(s)) — exactly
    * ‖q − decode(code)‖² (per-subspace squares partition the sum). */
  def lutFor(qemb: Array[Float], books: Array[Array[Array[Double]]],
             p: Params): Array[Array[Double]] =
    lutForRaw(normalize(qemb), books, p)

  /** LUT over a raw vector (no normalization) — the residual-query entry
    * point: ‖(q − c_list) − r̂‖² partitions per subspace the same way. */
  def lutForRaw(q: Array[Double], books: Array[Array[Array[Double]]],
                p: Params): Array[Array[Double]] = {
    Array.tabulate(p.m) { s =>
      val book = books(s)
      Array.tabulate(book.length)(j => sub2(q, s * p.dsub, book(j)))
    }
  }

  /** Train + one narrow encode pass → code parquet (+ codebooks, params)
    * under `dir`. Each vector is stored ONCE, m bytes. */
  def build(spark: SparkSession, embeddings: Dataset[(Long, Array[Float])],
            dir: String, p: Params = Params()): PqIndex = {
    import spark.implicits._
    val books = train(IvfIndex.sampleFor(embeddings, p.sampleCap), p)
    val bc = spark.sparkContext.broadcast(books)
    embeddings.map { case (id, emb) => CodeRow(id, encode(emb, bc.value, p)) }
      .toDF()
      .repartitionByRange(col("vec_id"))
      .sortWithinPartitions("vec_id")
      .write.mode("overwrite").parquet(s"$dir/codes")
    val flat = for {
      s <- books.indices; j <- books(s).indices
    } yield (s, j, books(s)(j))
    flat.toDF("sub", "cent", "vec").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/codebooks")
    Files.writeString(Paths.get(dir, "params.json"),
      s"""{"m":${p.m},"ksub":${p.ksub},"iters":${p.iters},""" +
        s""""sampleCap":${p.sampleCap},"dim":${p.dim},"seed":${p.seed}}""")
    load(spark, dir)
  }

  def load(spark: SparkSession, dir: String): PqIndex = {
    val json = Files.readString(Paths.get(dir, "params.json"))
    def num(key: String): Long = {
      val mm = java.util.regex.Pattern.compile("\"" + key + "\":(-?[0-9]+)").matcher(json)
      require(mm.find(), s"missing $key in params.json")
      mm.group(1).toLong
    }
    val p = Params(num("m").toInt, num("ksub").toInt, num("iters").toInt,
      num("sampleCap").toInt, num("dim").toInt, num("seed"))
    import spark.implicits._
    val rows = spark.read.parquet(s"$dir/codebooks")
      .select(col("sub"), col("cent"), col("vec")).as[(Int, Int, Array[Double])]
      .collect()
    val books = Array.tabulate(p.m) { s =>
      rows.filter(_._1 == s).sortBy(_._2).map(_._3)
    }
    new PqIndex(spark, dir, p, books)
  }
}

final class PqIndex(spark: SparkSession, dir: String,
                    val params: PqIndex.Params,
                    val codebooks: Array[Array[Array[Double]]]) {
  import PqIndex._
  import spark.implicits._

  /** The persisted code table (vec_id, code: m bytes). */
  def codes: Dataset[CodeRow] = {
    val schema = org.apache.spark.sql.Encoders.product[CodeRow].schema
    spark.read.schema(schema).parquet(s"$dir/codes").as[CodeRow]
  }

  /** Approximate top-k neighbors per query via one ADC scan of the code
    * table: per-partition BOUNDED heaps (k + slack per query, by exact
    * reconstruction cosine — the Ann.knnJoin discipline), so only
    * ≤ (k+slack) rows per (query, partition) leave the scan; a final
    * windowed rank merges the partial lists. Output
    * (query_id, neighbor_id, cos, rank) — cos is the cosine of the
    * RECONSTRUCTED neighbor (1 − d²/2), ranked by (round(cos,6) desc,
    * neighbor_id), the cross-engine-reproducible order the exact paths
    * use; the slack keeps 6-dp tie groups intact across the heap cut. */
  def topK(queries: Array[(Long, Array[Float])], k: Int): DataFrame = {
    require(queries.nonEmpty)
    val p = params
    val keep = k + 8
    val luts = queries.map { case (qid, qemb) => (qid, lutFor(qemb, codebooks, p)) }
    val bc = spark.sparkContext.broadcast(luts)
    // heap ordering: the WORST kept entry (lowest cos, then highest
    // neighbor id) dequeues first
    val heapOrd: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)
    codes.mapPartitions { it =>
      val ls = bc.value
      val heaps = Array.fill(ls.length)(
        scala.collection.mutable.PriorityQueue.empty[(Double, Long)](heapOrd))
      it.foreach { row =>
        var qi = 0
        while (qi < ls.length) {
          val (qid, lut) = ls(qi)
          if (row.vec_id != qid) {
            var d = 0.0
            var s = 0
            while (s < lut.length) { d += lut(s)(row.code(s) & 0xff); s += 1 }
            val c = 1.0 - d / 2.0
            val h = heaps(qi)
            if (h.size < keep) h.enqueue((c, row.vec_id))
            else if (heapOrd.lt((c, row.vec_id), h.head)) {
              // less-than under heapOrd = strictly better than the worst
              h.dequeue(); h.enqueue((c, row.vec_id))
            }
          }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.iterator.map { case (c, n) => (ls(qi)._1, n, c) }
      }
    }
      .toDF("query_id", "neighbor_id", "cos")
      .withColumn("cos", round(col("cos"), 6))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }
}
