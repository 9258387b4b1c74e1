package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization for embedding vectors — the FAISS
  * IndexScalarQuantizer(QT_8bit) family (Jégou et al. TPAMI'11 discuss
  * scalar quantizers as the PQ baseline): per-dimension affine
  * [min, max] → {0..255} codes (4× smaller than float32 at recall close
  * to exact), searched asymmetrically — the float query against the
  * RECONSTRUCTED candidate. Unlike product quantization (PqIndex, whose
  * k-means codebooks are iterative), the scalar quantizer is a
  * closed-form deterministic map: training stats, codes, reconstruction
  * and scores all have exact ANSI-SQL twins, so this path is
  * oracle-checked end-to-end (`ann_sq8` in CORRECTNESS — the one
  * quantized-ANN operator with a full DuckDB twin); the
  * quantization-error recall bound is additionally gated in Sq8Spec.
  *
  * Scale posture: training = one narrow posexplode + ONE dim-keyed
  * partial+final aggregation (|dim| rows out, skew-free — every vector
  * contributes exactly one value per dimension), stats broadcast back;
  * encode = one narrow pass writing the 4×-smaller code table (the
  * persisted artifact a serving pipeline stores INSTEAD of the floats);
  * search = the Ann.bruteTopK regime over codes — broadcast queries,
  * one narrow scan, per-query top-k — reading a quarter of the bytes
  * the float scan pays, which is the point of SQ8 at 100 TB.
  */
object Sq8 {

  /** Per-dimension affine training stats: exact corpus min/max. */
  final case class Stats(mins: Array[Double], maxs: Array[Double])

  def train(embeddings: Dataset[(Long, Array[Float])]): Stats = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val stats = embeddings.toDF("vec_id", "embedding")
      .select(posexplode(col("embedding")))
      .select(col("pos"), col("col").cast("double").as("v"))
      .groupBy("pos").agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    Stats(stats.map(_._2), stats.map(_._3))
  }

  /** code_d = floor((x_d − min_d)/(max_d − min_d)·255 + 0.5), computed
    * in Double from the exact float→double cast — a closed-form map
    * both engines produce bit-identically (codes are exact Ints). A
    * degenerate dimension (max == min) codes 0. */
  def encode(emb: Array[Float], st: Stats): Array[Int] = {
    val out = new Array[Int](emb.length)
    var i = 0
    while (i < emb.length) {
      val mn = st.mins(i); val mx = st.maxs(i)
      out(i) =
        if (mx > mn)
          math.floor((emb(i).toDouble - mn) / (mx - mn) * 255.0 + 0.5).toInt
        else 0
      i += 1
    }
    out
  }

  /** x̂_d = min_d + code_d·(max_d − min_d)/255 — the decode half of the
    * affine map (mirrored operation-for-operation in the SQL twin). */
  def reconstruct(code: Array[Int], st: Stats): Array[Double] = {
    val out = new Array[Double](code.length)
    var i = 0
    while (i < code.length) {
      out(i) = st.mins(i) + code(i) * (st.maxs(i) - st.mins(i)) / 255.0
      i += 1
    }
    out
  }

  /** The 4×-compressed code table (vec_id, code: array<int>) — one
    * narrow broadcast-stats pass over the float table. */
  def codes(embeddings: Dataset[(Long, Array[Float])], st: Stats): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(st)
    embeddings.map { case (id, emb) => (id, encode(emb, bc.value)) }
      .toDF("vec_id", "code")
  }

  /** Asymmetric cosine: float query vs reconstructed candidate, the
    * Ann.cosine fixed left-to-right summation order. */
  def cosineRecon(q: Array[Float], code: Array[Int], st: Stats): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < q.length) {
      val x = st.mins(i) + code(i) * (st.maxs(i) - st.mins(i)) / 255.0
      val qd = q(i).toDouble
      dot += qd * x; na += qd * qd; nb += x * x
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Oversampled quantized retrieval + exact float rescore — the ES
    * quantized-kNN `rescore_vector` oversample pattern / FAISS
    * IndexRefineFlat: the 4×-smaller CODE table answers the corpus-scale
    * scan for the top k·oversample candidates per query, then EXACT
    * float cosine is recomputed for those ≤|q|·k·oversample candidates
    * only and the top k re-ranked by (round(exactCos,6) desc,
    * neighbor_id) — the [[topK]]/Ann.bruteTopK order.
    *
    * Scale posture: the only corpus-scale pass is the quantized scan
    * (a quarter of the float bytes — the SQ8 point at 100 TB); the
    * candidate list is QUERY-sized (≤|q|·k·m rows — bounded by the
    * query batch, never by the corpus), so it collects to the driver
    * and pushes back down as a vec_id IN filter, turning the rescore
    * into a pushdown-pruned point read of the float table (parquet
    * row-group pruning on vec_id), not a second corpus scan.
    *
    * Containment theorem (tested in Sq8Spec): a true top-k neighbor
    * that survives into the candidate pool ALWAYS survives the rescore
    * (fewer than k vectors outrank it globally, so fewer than k pool
    * members do) — per-query recall is ≥ the quantized-only recall,
    * and with oversample covering the corpus the result is bit-identical
    * to Ann.bruteTopK. */
  def topKRescored(codeTable: DataFrame, st: Stats,
                   floats: Dataset[(Long, Array[Float])],
                   queries: Array[(Long, Array[Float])],
                   k: Int, oversample: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(oversample >= 1, s"oversample must be >= 1, got $oversample")
    val spark = codeTable.sparkSession
    import spark.implicits._
    val cand = topK(codeTable, st, queries, k * oversample)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect() // ≤ |q|·k·m rows — query-batch-sized
    val byNeighbor: Map[Long, Array[Long]] =
      cand.groupBy(_._2).map { case (n, xs) => (n, xs.map(_._1)) }
    val qmap = spark.sparkContext.broadcast(queries.toMap)
    val bByN = spark.sparkContext.broadcast(byNeighbor)
    val ids = byNeighbor.keys.toSeq
    val rescored = floats.toDF("vec_id", "embedding")
      .filter(col("vec_id").isin(ids: _*))
      .as[(Long, Array[Float])]
      .flatMap { case (vid, emb) =>
        bByN.value.getOrElse(vid, Array.empty[Long]).iterator
          .map(qid => (qid, vid, Ann.cosine(qmap.value(qid), emb)))
      }.toDF("query_id", "neighbor_id", "cos")
      .withColumn("cos", round(col("cos"), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Exact top-k over the CODE table (excludes self): broadcast
    * queries, one narrow scan, per-query top-k — ranked by
    * (round(cos,6) desc, neighbor_id), the cross-engine-reproducible
    * order Ann.bruteTopK pins. */
  def topK(codeTable: DataFrame, st: Stats,
           queries: Array[(Long, Array[Float])], k: Int): DataFrame = {
    val spark = codeTable.sparkSession
    import spark.implicits._
    val qs = spark.sparkContext.broadcast(queries)
    val bst = spark.sparkContext.broadcast(st)
    val scoredAll = codeTable.as[(Long, Array[Int])].flatMap { case (vid, code) =>
      qs.value.iterator.collect {
        case (qid, qemb) if qid != vid =>
          (qid, vid, cosineRecon(qemb, code, bst.value))
      }
    }.toDF("query_id", "neighbor_id", "cos")
      .withColumn("cos", round(col("cos"), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scoredAll.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }
}
