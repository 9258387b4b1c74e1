package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * `bruteTopK` is the exact baseline: broadcast the (small) query set,
  * one narrow pass over the corpus, per-query TakeOrdered — no shuffle of
  * the embedding data at all. `lshTopK` is the scale path: random
  * hyperplane signatures bucket the corpus; only colliding buckets are
  * scored (candidates ⊆ corpus), trading recall for a corpus-scan-free
  * plan at 100 TB (the bucket join replaces the full scan).
  */
object Ann {

  /** Cosine in Double, fixed left-to-right summation order (determinism). */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Exact top-k neighbors for each query vector (excludes self).
    * Output: (query_id, neighbor_id, cos, rank) ranked by
    * (round(cos,6) desc, neighbor_id) — the rounding makes the rank
    * reproducible across engines that sum in different orders. */
  def bruteTopK(embeddings: Dataset[(Long, Array[Float])],
                queries: Array[(Long, Array[Float])], k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val qs = spark.sparkContext.broadcast(queries)
    val scoredAll = embeddings.flatMap { case (vid, emb) =>
      qs.value.iterator.collect {
        case (qid, qemb) if qid != vid => (qid, vid, cosine(qemb, emb))
      }
    }.toDF("query_id", "neighbor_id", "cos")
      .withColumn("cos", round($"cos", 6))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    scoredAll.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"neighbor_id", $"cos", $"rank")
  }

  /** The [[bruteTopK]] contract through the NATIVE-EXPRESSION plan:
    * cosine computed by [[graft.functions.CosineF32]] inside
    * whole-stage codegen over the raw ArrayData buffers (no typed-path
    * deserialization to Array[Float], no UDF boxing), queries
    * broadcast as a 1-row-per-query frame. The expression's
    * accumulation order is bit-identical to [[cosine]], so output
    * equals bruteTopK EXACTLY (spec-asserted) and ann_topk's oracle
    * transfers unchanged. */
  def bruteTopKNative(embeddings: Dataset[(Long, Array[Float])],
                      queries: Array[(Long, Array[Float])], k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val q = broadcast(queries.toSeq.toDF("query_id", "qemb"))
    embeddings.toDF("neighbor_id", "emb")
      .crossJoin(q)
      .filter($"query_id" =!= $"neighbor_id")
      .withColumn("cos",
        round(call_function("graft_cosine", $"qemb", $"emb"), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)))
      .filter($"rank" <= k)
      .select($"query_id", $"neighbor_id", $"cos", $"rank")
  }

  /** Radius (similarity-threshold) vector search — the ES `knn` query's
    * `similarity` floor / FAISS range_search: EVERY neighbor of each
    * query with cosine ≥ `minCos`, unbounded by k (the recall-first
    * retrieval mode: dedup candidate pools, near-duplicate audits).
    * One narrow pass over the corpus — broadcast queries, per-row
    * cosine, filter; the predicate keeps whole-stage codegen and the
    * output is result-sized, never corpus-sized. Threshold compares the
    * 6-dp ROUNDED cosine (≥ is then exact cross-engine); order
    * (query_id, cos desc, neighbor_id) pinned. */
  def radius(embeddings: Dataset[(Long, Array[Float])],
             queries: Array[(Long, Array[Float])], minCos: Double): DataFrame = {
    require(minCos >= -1.0 && minCos <= 1.0,
      s"cosine threshold must be in [-1,1], got $minCos")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val qs = spark.sparkContext.broadcast(queries)
    embeddings.flatMap { case (vid, emb) =>
      qs.value.iterator.collect {
        case (qid, qemb) if qid != vid => (qid, vid, cosine(qemb, emb))
      }
    }.toDF("query_id", "neighbor_id", "cos")
      .withColumn("cos", round($"cos", 6))
      .filter($"cos" >= minCos)
      .orderBy($"query_id", $"cos".desc, $"neighbor_id")
  }

  /** Matryoshka (MRL) two-tier retrieval (Kusupati et al., NeurIPS'22
    * "Matryoshka Representation Learning"; the embedding-truncation
    * practice ES/OpenAI expose as dimension reduction): rank candidates
    * by cosine over the FIRST `dPrime` dimensions only — an MRL-trained
    * embedding front-loads its information, so the prefix scan reads
    * and multiplies dPrime/dim of the bytes (the cheap corpus pass at
    * 100 TB) — then recompute EXACT full-dimension cosine for the
    * k·oversample survivors and re-rank. Both tiers pin the
    * (round(cos,6) desc, neighbor_id) order.
    *
    * The candidate list is QUERY-batch-sized (≤|q|·k·m — the Sq8
    * rescore posture), so it collects and pushes back down as a vec_id
    * IN filter: the full-dim rescore is a pushdown-pruned point read,
    * never a second corpus scan. The same containment theorem applies:
    * a true top-k neighbor surviving into the candidate pool always
    * survives the rescore. */
  def truncatedTopK(embeddings: Dataset[(Long, Array[Float])],
                    queries: Array[(Long, Array[Float])],
                    k: Int, dPrime: Int, oversample: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(dPrime >= 1, s"dPrime must be >= 1, got $dPrime")
    require(oversample >= 1, s"oversample must be >= 1, got $oversample")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val qs = spark.sparkContext.broadcast(
      queries.map { case (id, e) => (id, e.take(dPrime)) })
    val prefixScores = embeddings.flatMap { case (vid, emb) =>
      val pe = emb.take(dPrime)
      qs.value.iterator.collect {
        case (qid, qp) if qid != vid => (qid, vid, cosine(qp, pe))
      }
    }.toDF("query_id", "neighbor_id", "cos")
      .withColumn("cos", round($"cos", 6))
    val wp = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    val cand = prefixScores.withColumn("rank", row_number().over(wp))
      .filter($"rank" <= k * oversample)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect() // ≤ |q|·k·m rows — query-batch-sized
    val byNeighbor = cand.groupBy(_._2).map { case (n, xs) => (n, xs.map(_._1)) }
    val qmap = spark.sparkContext.broadcast(queries.toMap)
    val bByN = spark.sparkContext.broadcast(byNeighbor)
    val ids = byNeighbor.keys.toSeq
    val rescored = embeddings.toDF("vec_id", "embedding")
      .filter(col("vec_id").isin(ids: _*))
      .as[(Long, Array[Float])]
      .flatMap { case (vid, emb) =>
        bByN.value.getOrElse(vid, Array.empty[Long]).iterator
          .map(qid => (qid, vid, cosine(qmap.value(qid), emb)))
      }.toDF("query_id", "neighbor_id", "cos")
      .withColumn("cos", round($"cos", 6))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    rescored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"neighbor_id", $"cos", $"rank")
  }

  /** Deterministic random hyperplanes (SplittableRandom gaussians). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rng = new java.util.SplittableRandom(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rng.nextGaussian().toFloat))
  }

  def signature(emb: Array[Float], planes: Array[Array[Float]]): Int = {
    var sig = 0
    var p = 0
    while (p < planes.length) {
      var dot = 0.0
      var i = 0
      while (i < emb.length) { dot += emb(i).toDouble * planes(p)(i).toDouble; i += 1 }
      if (dot >= 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** One block of vectors, id-sorted. Public: Spark encoders fail
    * codegen on private case classes. */
  final case class VecBlock(block: Int, ids: Array[Long], vecs: Array[Array[Float]])

  /** Exact k-nearest-neighbor JOIN: for EVERY vector, its k nearest
    * neighbors by cosine — the kNN-graph construction step semantic
    * curation pipelines run over embedding tables (cluster-then-prune
    * dedup, neighborhood quality filters). Same block-pair decomposition
    * as [[nearDupPairs]], but each task keeps only a bounded per-vector
    * top heap (k + slack by exact cosine), so the post-task exchange
    * carries ≤ (k+slack) rows per (vector, block-pair) — never the
    * quadratic pair set — and one windowed aggregation merges the
    * ≤ numBlocks partial lists per vector. Quadratic in COMPUTE by
    * definition (every pair is measured once); the LSH/IVF indexes are
    * the approximate scale path, with this as their oracle twin.
    *
    * Output (query_id, neighbor_id, cos, rank), ranked by
    * (round(cos,6) desc, neighbor_id) — the cross-engine-reproducible
    * order; the slack keeps every 6-dp tie group intact across the
    * local-heap cut. */
  def knnJoin(embeddings: Dataset[(Long, Array[Float])], k: Int,
              numBlocks: Int = 32): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val keep = k + 8
    val blocks = embeddings
      .groupByKey(t => (t._1 % numBlocks).toInt)
      .mapGroups { (b, it) =>
        val arr = it.toArray.sortBy(_._1)
        VecBlock(b, arr.map(_._1), arr.map(_._2))
      }
    val bp = spark.createDataset(
      for { i <- 0 until numBlocks; j <- i until numBlocks } yield (i, j))
      .toDF("bi", "bj")
    // evict the WORST kept entry first: min cosine, then max neighbor id
    val worstFirst: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long.reverse)
    bp.join(blocks.toDF("bi", "lids", "lvecs"), "bi")
      .join(blocks.toDF("bj", "rids", "rvecs"), "bj")
      .as[(Int, Int, Array[Long], Array[Array[Float]], Array[Long], Array[Array[Float]])]
      .flatMap { case (bi, bj, lids, lvecs, rids, rvecs) =>
        val heaps = scala.collection.mutable.Map.empty[Long,
          scala.collection.mutable.PriorityQueue[(Double, Long)]]
        def offer(q: Long, n: Long, c: Double): Unit = {
          val h = heaps.getOrElseUpdate(q,
            scala.collection.mutable.PriorityQueue.empty(worstFirst.reverse))
          if (h.size < keep) h.enqueue((c, n))
          else if (worstFirst.gt((c, n), h.head)) { h.dequeue(); h.enqueue((c, n)) }
        }
        var i = 0
        while (i < lids.length) {
          var j = if (bi == bj) i + 1 else 0
          while (j < rids.length) {
            val c = cosine(lvecs(i), rvecs(j))
            offer(lids(i), rids(j), c)
            offer(rids(j), lids(i), c)
            j += 1
          }
          i += 1
        }
        heaps.iterator.flatMap { case (q, h) =>
          h.iterator.map { case (c, n) => (q, n, c) }
        }
      }
      .toDF("query_id", "neighbor_id", "cos")
      .withColumn("cos", round($"cos", 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)))
      .filter($"rank" <= k)
      .select($"query_id", $"neighbor_id", $"cos", $"rank")
  }

  /** Exact embedding near-duplicate pairs: cosine ≥ tau, doc_a < doc_b.
    * Quadratic by definition — this is the small-scale ORACLE twin of
    * `AnnIndex.nearDupPairs` (the bucketed scale path), mirroring the
    * jaccardPairs / minhashLshPairs pairing.
    *
    * Executed as the classic BLOCK-PAIR decomposition (the distributed
    * all-pairs shape): vectors hash into `numBlocks` blocks, the
    * B(B+1)/2 block pairs join against the block table (broadcast-hash
    * at these sizes), and each task runs a tight primitive-array double
    * loop over its two blocks. No driver-side collect of the embedding
    * table, and no per-pair Catalyst row overhead — a naive
    * nested-loop-join over row pairs measured ~30x slower at sf0.1. At
    * cluster scale each block ships B times; pick numBlocks ≈ √tasks. */
  def nearDupPairs(embeddings: Dataset[(Long, Array[Float])], tau: Double,
                   numBlocks: Int = 32): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val blocks = embeddings
      .groupByKey(t => (t._1 % numBlocks).toInt)
      .mapGroups { (b, it) =>
        val arr = it.toArray.sortBy(_._1)
        VecBlock(b, arr.map(_._1), arr.map(_._2))
      }
    val bp = spark.createDataset(
      for { i <- 0 until numBlocks; j <- i until numBlocks } yield (i, j))
      .toDF("bi", "bj")
    bp.join(blocks.toDF("bi", "lids", "lvecs"), "bi")
      .join(blocks.toDF("bj", "rids", "rvecs"), "bj")
      .as[(Int, Int, Array[Long], Array[Array[Float]], Array[Long], Array[Array[Float]])]
      .flatMap { case (bi, bj, lids, lvecs, rids, rvecs) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var i = 0
        while (i < lids.length) {
          var j = if (bi == bj) i + 1 else 0
          while (j < rids.length) {
            val c = cosine(lvecs(i), rvecs(j))
            if (c >= tau) {
              val a = math.min(lids(i), rids(j))
              val b = math.max(lids(i), rids(j))
              out += ((a, b, c))
            }
            j += 1
          }
          i += 1
        }
        out
      }
      .toDF("doc_a", "doc_b", "cos")
      .withColumn("cos", round(col("cos"), 6))
  }
}
