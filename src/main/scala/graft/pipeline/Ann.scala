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

  /** LSH-bucketed approximate top-k: `tables` independent signatures of
    * `planesPerTable` hyperplanes each; candidates = corpus vectors
    * sharing any table-bucket with the query; exact-cosine rank within
    * candidates. Recall rises with tables, cost with bucket sizes. */
  def lshTopK(embeddings: Dataset[(Long, Array[Float])],
              queries: Array[(Long, Array[Float])], k: Int,
              tables: Int = 8, planesPerTable: Int = 8, dim: Int = 64): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val planes = (0 until tables).map(t =>
      hyperplanes(planesPerTable, dim, seed = 1000L + t)).toArray
    val qs = spark.sparkContext.broadcast(
      queries.map { case (qid, e) =>
        (qid, e, planes.indices.map(t => signature(e, planes(t))).toArray)
      })
    val scored = embeddings.flatMap { case (vid, emb) =>
      val sigs = planes.indices.map(t => signature(emb, planes(t)))
      qs.value.iterator.collect {
        case (qid, qemb, qsigs)
            if qid != vid && planes.indices.exists(t => sigs(t) == qsigs(t)) =>
          (qid, vid, cosine(qemb, emb))
      }
    }.toDF("query_id", "neighbor_id", "cos")
      .withColumn("cos", round($"cos", 6))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"neighbor_id", $"cos", $"rank")
  }

  /** Exact embedding near-duplicate pairs: cosine ≥ tau, doc_a < doc_b.
    * Quadratic — the oracle; at scale route through lsh buckets. */
  def nearDupPairs(embeddings: Dataset[(Long, Array[Float])], tau: Double): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val all = spark.sparkContext.broadcast(embeddings.collect().sortBy(_._1))
    embeddings.flatMap { case (vid, emb) =>
      all.value.iterator.collect {
        case (oid, oemb) if oid > vid =>
          (vid, oid, cosine(emb, oemb))
      }.filter(_._3 >= tau)
    }.toDF("doc_a", "doc_b", "cos").withColumn("cos", round($"cos", 6))
  }
}
