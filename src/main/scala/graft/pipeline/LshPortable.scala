package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fully PORTABLE hyperplane LSH top-k (Charikar STOC'02 sign-random-
  * projection, determinized): the random ±1 hyperplanes are derived
  * from the md5-portable family — sign(t,p,d) = +1 iff the 60-bit
  * md5("t:p:d") is odd — and projections run over the SQ8 INTEGER
  * codes, so every signature bit is an exact-integer comparison with
  * no float-summation-order hazard at the ≥0 boundary. The result is
  * an LSH retrieval that is approximate (bucket misses lose recall,
  * as LSH is designed to) yet bit-identical across engines and
  * parallelism — which is what closes the `ann_lsh` family's oracle
  * gap: `ann_lsh_md5` is DuckDB-checked byte-for-byte, while the
  * float-hyperplane `AnnIndex` stays the recall-gated production path.
  *
  * Scale posture: corpus signatures are ONE narrow pass over the code
  * table (signs are a broadcast |tables|·|planes|·dim array); query
  * signatures hash driver-side; candidates come from a bucket
  * equi-join against the |q|·|tables| driver-literal bucket list
  * (broadcast), so only colliding rows are scored — the corpus-scan-
  * free plan — and the exact-cosine verify pays only the candidate
  * set. ±1 signs lose ~2/π of the angular resolution vs Gaussian
  * planes (Achlioptas JCSS'03 justifies sign-only projections); the
  * recall gate in LshPortableSpec holds at 8×12 on clustered data.
  */
object LshPortable {

  final case class Params(tables: Int = 8, planes: Int = 12, dim: Int = 64) {
    require(tables >= 1, s"tables must be >= 1, got $tables")
    require(planes >= 1 && planes <= 30, s"planes must be in [1,30], got $planes")
    require(dim >= 1, s"dim must be >= 1, got $dim")
  }

  /** sign(t,p,d) ∈ {+1,−1} from md5 parity — the engine-portable rule. */
  def sign(table: Int, plane: Int, d: Int): Long =
    if ((PortableHash.md5HexPrefixLong(s"$table:$plane:$d", 15) & 1L) == 1L) 1L
    else -1L

  /** All signs as [table][plane][dim] — broadcast to the corpus pass. */
  def signs(p: Params): Array[Array[Array[Long]]] =
    Array.tabulate(p.tables, p.planes, p.dim)(sign)

  /** Table-t signature of an SQ8 code vector: bit p set iff
    * Σ_d sign(t,p,d)·code_d ≥ 0 — exact integer arithmetic. */
  def signature(code: Array[Int], tSigns: Array[Array[Long]]): Int = {
    var sig = 0
    var p = 0
    while (p < tSigns.length) {
      val row = tSigns(p)
      var acc = 0L
      var d = 0
      while (d < code.length) { acc += row(d) * code(d); d += 1 }
      if (acc >= 0L) sig |= 1 << p
      p += 1
    }
    sig
  }

  /** LSH top-k: candidates = vectors sharing the query's bucket in ANY
    * table (self excluded), ranked by exact float cosine
    * (round(cos,6) desc, neighbor_id) — the Ann.bruteTopK order — and
    * cut at k. Queries are (id, float vec, SQ8 code) triples; `floats`
    * provides the exact-rescore side. */
  def topK(codes: DataFrame, floats: Dataset[(Long, Array[Float])],
           st: Sq8.Stats, queries: Array[(Long, Array[Float])],
           k: Int, p: Params): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = codes.sparkSession
    import spark.implicits._
    val allSigns = signs(p)
    val bSigns = spark.sparkContext.broadcast(allSigns)
    val corpusBuckets = codes.toDF("vec_id", "code")
      .as[(Long, Array[Int])]
      .flatMap { case (id, code) =>
        (0 until p.tables).iterator
          .map(t => (t, signature(code, bSigns.value(t)), id))
      }.toDF("tbl", "sig", "vec_id")
    // query buckets: |q|·tables rows, hashed driver-side
    val qBuckets = queries.toSeq.flatMap { case (qid, emb) =>
      val code = Sq8.encode(emb, st)
      (0 until p.tables).map(t => (qid, t, signature(code, allSigns(t))))
    }.toDF("query_id", "tbl", "sig")
    val cands = broadcast(qBuckets)
      .join(corpusBuckets, Seq("tbl", "sig"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id")).distinct()
    // exact-cosine verify: a candidate-keyed equi-join — the candidate
    // side is query-batch-bucket-sized, so AQE picks a broadcast and
    // the float table is never shuffled; the persisted-artifact
    // production path with (table,sig) pushdown is AnnIndex, which
    // this portable op deliberately mirrors inline
    val qmap = spark.sparkContext.broadcast(queries.toMap)
    val scored = cands
      .join(floats.toDF("vec_id", "embedding"), "vec_id")
      .select(col("query_id"), col("vec_id"), col("embedding"))
      .as[(Long, Long, Array[Float])]
      .map { case (qid, vid, emb) => (qid, vid, Ann.cosine(qmap.value(qid), emb)) }
      .toDF("query_id", "neighbor_id", "cos")
      .withColumn("cos", round(col("cos"), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }
}
