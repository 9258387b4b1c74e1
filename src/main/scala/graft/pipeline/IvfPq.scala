package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ ANN index — the composed rung of the ANN ladder (Jégou, Douze,
  * Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI
  * 2011 §V; FAISS's IndexIVFPQ, the standard billion-scale layout): a
  * coarse spherical-k-means quantizer routes each vector to one inverted
  * list ([[IvfIndex]]'s router), and the RESIDUAL q − centroid is
  * product-quantized to `m` one-byte codes ([[PqIndex]]'s codec, trained
  * on residuals — TPAMI'11 shows residual quantization beats direct
  * quantization because residuals concentrate near 0 once the coarse
  * structure is removed).
  *
  * Why this is THE 10^12-vector layout, and neither parent suffices:
  * IVF-Flat prunes the scan to ~nProbe/nlist of the corpus but still
  * stores full vectors (256 B at dim 64 — 100 TB of raw embeddings stay
  * 100 TB); PQ compresses 32× but scans every code. IVF-PQ does both:
  * each vector is stored ONCE as m bytes inside one list, and a query
  * reads ~nProbe/nlist of a 32×-smaller table — the pushed
  * `list IN (probes)` predicate prunes parquet row groups exactly as in
  * [[IvfIndex]] (lists are list-sorted on disk).
  *
  * Query = per-probe ADC: for each probed list the query's residual
  * q − c_list gets its own 256-entry-per-subspace LUT (driver-side,
  * nProbe·m·ksub doubles, broadcast); a stored code's LUT sum is exactly
  * ‖q − (c_list + decode(code))‖² — the distance to the reconstruction
  * (IvfPqSpec pins the identity). Scores report cos = 1 − d²/2 of the
  * reconstruction (equal to dot(q, recon) when ‖recon‖ = 1, and the
  * monotone rank of d² always), rounded to 6 dp with a neighbor-id
  * tie-break — the cross-engine-reproducible contract every ANN path
  * here shares.
  *
  * Approximate BY DESIGN (coarse routing can miss + quantization error ⇒
  * no exact SQL twin — the ann_lsh/ann_pq posture): IvfPqSpec gates
  * recall against the exact brute force on clustered data, pins the ADC
  * identity, bit-determinism, the m-byte/one-list-per-vector layout, and
  * the probe pushdown plan.
  *
  * Determinism: both trainers are the seeded deterministic k-means of
  * the parents (coarse: [[IvfIndex.train]]; residual books:
  * [[PqIndex.trainRaw]] on the SAME sample's residuals), assignment ties
  * to the lowest id, Double arithmetic in fixed order — same input +
  * params ⇒ bit-identical lists, codes, and rankings at any parallelism.
  */
object IvfPqIndex {

  /** One encoded entry: the list it routes to and m residual code bytes.
    * Public: Spark encoders fail codegen on private case classes. */
  final case class CodeRow(list: Int, vec_id: Long, code: Array[Byte])

  final case class Params(nlist: Int = 16, m: Int = 8, ksub: Int = 64,
                          iters: Int = 10, sampleCap: Int = 65536,
                          dim: Int = 64, seed: Long = 13000L) {
    require(dim % m == 0, s"dim $dim must be divisible by m $m")
    require(ksub >= 1 && ksub <= 256, "ksub must fit one byte")
    def coarse: IvfIndex.Params =
      IvfIndex.Params(nlist = nlist, iters = iters, sampleCap = sampleCap,
        dim = dim, seed = seed)
    def pq: PqIndex.Params =
      PqIndex.Params(m = m, ksub = ksub, iters = iters,
        sampleCap = sampleCap, dim = dim, seed = seed + 1)
  }

  /** The residual a vector quantizes to: normalize(v) − c_nearest, and
    * the list it routes to. */
  def residual(emb: Array[Float], cents: Array[Array[Double]]): (Int, Array[Double]) = {
    val v = PqIndex.normalize(emb)
    val l = IvfIndex.nearest(v, cents)
    val c = cents(l)
    val r = new Array[Double](v.length)
    var i = 0
    while (i < v.length) { r(i) = v(i) - c(i); i += 1 }
    (l, r)
  }

  /** Reconstruction a (list, code) pair denotes: c_list + decode(code). */
  def reconstruct(list: Int, code: Array[Byte], cents: Array[Array[Double]],
                  books: Array[Array[Array[Double]]], p: Params): Array[Double] = {
    val rec = PqIndex.decode(code, books, p.pq)
    val c = cents(list)
    var i = 0
    while (i < rec.length) { rec(i) += c(i); i += 1 }
    rec
  }

  /** Train coarse + residual codebooks on one bounded sample, encode the
    * corpus in one narrow pass, write list-sorted code parquet (+
    * centroids, codebooks, params) under `dir`. */
  def build(spark: SparkSession, embeddings: Dataset[(Long, Array[Float])],
            dir: String, p: Params = Params()): IvfPqIndex = {
    import spark.implicits._
    val sample = IvfIndex.sampleFor(embeddings, p.sampleCap)
    val cents = IvfIndex.train(sample, p.coarse)
    val books = PqIndex.trainRaw(sample.map(e => residual(e, cents)._2), p.pq)
    val bcC = spark.sparkContext.broadcast(cents)
    val bcB = spark.sparkContext.broadcast(books)
    embeddings.map { case (id, emb) =>
      val (l, r) = residual(emb, bcC.value)
      CodeRow(l, id, PqIndex.encodeRaw(r, bcB.value, p.pq))
    }.toDF()
      .repartitionByRange(col("list"), col("vec_id"))
      .sortWithinPartitions("list", "vec_id")
      .write.mode("overwrite").parquet(s"$dir/codes")
    cents.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
      .toDF("list", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    val flat = for {
      s <- books.indices; j <- books(s).indices
    } yield (s, j, books(s)(j))
    flat.toDF("sub", "cent", "vec").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/codebooks")
    Files.writeString(Paths.get(dir, "params.json"),
      s"""{"nlist":${p.nlist},"m":${p.m},"ksub":${p.ksub},""" +
        s""""iters":${p.iters},"sampleCap":${p.sampleCap},""" +
        s""""dim":${p.dim},"seed":${p.seed}}""")
    load(spark, dir)
  }

  def load(spark: SparkSession, dir: String): IvfPqIndex = {
    val json = Files.readString(Paths.get(dir, "params.json"))
    def num(key: String): Long = {
      val mm = java.util.regex.Pattern.compile("\"" + key + "\":(-?[0-9]+)").matcher(json)
      require(mm.find(), s"missing $key in params.json")
      mm.group(1).toLong
    }
    val p = Params(num("nlist").toInt, num("m").toInt, num("ksub").toInt,
      num("iters").toInt, num("sampleCap").toInt, num("dim").toInt,
      num("seed"))
    import spark.implicits._
    val cents = spark.read.parquet(s"$dir/centroids")
      .select(col("list"), col("centroid")).as[(Int, Array[Double])]
      .collect().sortBy(_._1).map(_._2)
    val rows = spark.read.parquet(s"$dir/codebooks")
      .select(col("sub"), col("cent"), col("vec")).as[(Int, Int, Array[Double])]
      .collect()
    val books = Array.tabulate(p.m) { s =>
      rows.filter(_._1 == s).sortBy(_._2).map(_._3)
    }
    new IvfPqIndex(spark, dir, p, cents, books)
  }
}

final class IvfPqIndex(spark: SparkSession, dir: String,
                       val params: IvfPqIndex.Params,
                       val centroids: Array[Array[Double]],
                       val codebooks: Array[Array[Array[Double]]]) {
  import IvfPqIndex._
  import spark.implicits._

  /** The persisted code table (list, vec_id, m code bytes), list-sorted
    * — queries read it with `list IN (probes)` pushed down. */
  def codes: Dataset[CodeRow] = {
    val schema = org.apache.spark.sql.Encoders.product[CodeRow].schema
    spark.read.schema(schema).parquet(s"$dir/codes").as[CodeRow]
  }

  /** The nProbe nearest lists for one query (cos desc, list asc) —
    * driver-side, nlist·dim dot products (the IvfIndex contract). */
  def probesFor(emb: Array[Float], nProbe: Int): Array[Int] = {
    val v = PqIndex.normalize(emb)
    centroids.indices
      .map { c =>
        var d = 0.0
        var i = 0
        while (i < v.length) { d += v(i) * centroids(c)(i); i += 1 }
        (c, d)
      }
      .sortBy { case (c, d) => (-d, c) }
      .take(math.min(nProbe, centroids.length))
      .map(_._1).toArray
  }

  /** Approximate top-k per query: probe selection driver-side, pushed
    * `list IN (probes)` scan, per-(query, probe) residual LUTs broadcast,
    * ADC with BOUNDED per-partition heaps (k + slack, the knnJoin
    * discipline — only ≤ k+slack rows per (query, partition) leave the
    * scan), then one windowed rank merge. Output (query_id, neighbor_id,
    * cos, rank), cos = reconstruction cosine rounded to 6 dp, ranked
    * (cos desc, neighbor_id asc). */
  def topK(queries: Array[(Long, Array[Float])], k: Int, nProbe: Int): DataFrame = {
    require(queries.nonEmpty)
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val p = params
    val keep = k + 8
    // per (query, probed list): the residual's LUT, grouped by list so
    // the scan probes only its own list's queries
    val byList: Map[Int, Array[(Int, Array[Array[Double]])]] = {
      val pairs = for {
        qi <- queries.indices
        (qid, qemb) = queries(qi)
        q = PqIndex.normalize(qemb)
        l <- probesFor(qemb, nProbe)
      } yield {
        val rq = new Array[Double](q.length)
        val c = centroids(l)
        var i = 0
        while (i < q.length) { rq(i) = q(i) - c(i); i += 1 }
        (l, (qi, PqIndex.lutForRaw(rq, codebooks, p.pq)))
      }
      pairs.groupBy(_._1).map { case (l, xs) => (l, xs.map(_._2).toArray) }
    }
    val allProbes = byList.keys.toArray.sorted
    val qids = queries.map(_._1)
    val bcLuts = spark.sparkContext.broadcast(byList)
    val bcQids = spark.sparkContext.broadcast(qids)
    val heapOrd: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)
    codes.filter(col("list").isin(allProbes.map(Int.box): _*))
      .mapPartitions { it =>
        val luts = bcLuts.value
        val ids = bcQids.value
        val heaps = Array.fill(ids.length)(
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](heapOrd))
        it.foreach { row =>
          luts.get(row.list).foreach { qs =>
            var x = 0
            while (x < qs.length) {
              val (qi, lut) = qs(x)
              if (row.vec_id != ids(qi)) {
                var d = 0.0
                var s = 0
                while (s < lut.length) { d += lut(s)(row.code(s) & 0xff); s += 1 }
                val c = 1.0 - d / 2.0
                val h = heaps(qi)
                if (h.size < keep) h.enqueue((c, row.vec_id))
                else if (heapOrd.lt((c, row.vec_id), h.head)) {
                  h.dequeue(); h.enqueue((c, row.vec_id))
                }
              }
              x += 1
            }
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (c, n) => (ids(qi), n, c) }
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
