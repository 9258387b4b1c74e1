package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25F — the multi-weighted-field BM25 extension of Robertson,
  * Zaragoza & Taylor (CIKM'04, "Simple BM25 extension to multiple
  * weighted fields"): per-field term frequencies are combined into ONE
  * weighted pseudo-frequency BEFORE saturation (tf̃ = Σ_f w_f·tf_f,
  * dl̃ = Σ_f w_f·dl_f), then the standard BM25 curve applies once.
  * This is NOT a linear mix of per-field BM25 scores — saturating
  * after the merge is the whole point (a term matching three fields
  * weakly must not outscore one strong match three times over).
  *
  * Field weights are INTEGER, so tf̃ and dl̃ stay exact Longs and the
  * only floats are the shared scoring expression — mirrored textually
  * in the DuckDB twin (same k1=1.2, b=0.75, (k1+1) numerator and
  * half-up 6-dp boundary as every BM25 twin in SparkEntry).
  *
  * Scale posture: this is the RELATIONAL form (the oracle path, like
  * ExactScorer): tf̃/dl̃/df/avgdl are one tokenize + two aggregations.
  * At the design point the same quantities are index-build artifacts —
  * tf̃ is a per-(doc,term) pre-aggregation computable inside
  * SegmentBuilder's existing tokenize-fused tf pass with a field tag,
  * after which the WAND/MaxScore walks score it unchanged (the
  * saturation sees only tf̃/dl̃). */
object Bm25f {

  /** Weighted-field tf̃/dl̃/df/stats tables shared by the scorers. */
  private def corpusTables(docs: DataFrame, fields: Seq[(String, Long)])
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(fields.nonEmpty && fields.forall(_._2 >= 1),
      s"field weights must be >= 1: $fields")
    def fieldTok(f: String, w: Long) =
      docs.select(col("doc_id").cast("long").as("doc_id"),
        explode(filter(split(col(f).cast("string"), " "),
          t => length(t) >= 2)).as("term"),
        lit(w).as("w"))
    val tok = fields.map { case (f, w) => fieldTok(f, w) }.reduce(_ unionByName _)
    val tf = tok.groupBy("doc_id", "term").agg(sum("w").as("tf"))
    val dl = tok.groupBy("doc_id").agg(sum("w").as("dl"))
    val alldl = docs.select(col("doc_id").cast("long").as("doc_id"))
      .join(dl, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("dl"), lit(0L)).as("dl"))
    val stats = alldl.agg(count(lit(1)).as("n"),
      (sum("dl") * lit(1.0) / count(lit(1))).as("avgdl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    (tf, alldl, stats, df)
  }

  /** Score with `contrib`, take global top-k, rank the k rows —
    * identical to ranking-then-limiting, without a corpus-wide
    * window. */
  private def rank(tf: DataFrame, alldl: DataFrame, stats: DataFrame,
                   df: DataFrame, terms: Seq[String], contrib: Column,
                   k: Int): DataFrame = {
    require(terms.nonEmpty, "empty term list")
    val sc = tf.filter(col("term").isin(terms: _*))
      .join(df, "term")
      .join(alldl, "doc_id")
      .crossJoin(stats)
      .groupBy("doc_id").agg(sum(contrib).as("score0"))
      // explicit half-up-from-zero 6-dp boundary (floor(x·1e6+0.5)) —
      // the repo's cross-engine rounding convention; scores here are
      // positive, so this equals round-half-up while never depending on
      // an engine's round() tie rule
      .select(col("doc_id"),
        (floor(col("score0") * lit(1e6) + lit(0.5)) / lit(1e6)).as("score"))
    val top = sc.orderBy(col("score").desc, col("doc_id")).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("score"), col("rank"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** Top-k BM25F hits over `docs` for `terms`, with `fields` =
    * (column, integer weight). Returns (doc_id, score, rank) in the
    * shared ranked-hits shape. */
  def rankedHits(docs: DataFrame, fields: Seq[(String, Long)],
                 terms: Seq[String], k: Int): DataFrame = {
    val (tf, alldl, stats, df) = corpusTables(docs, fields)
    val contrib: Column =
      log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        col("tf") * lit(2.2) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    rank(tf, alldl, stats, df, terms, contrib, k)
  }

  /** BM25+ (Lv & Zhai, CIKM'11 "Lower-bounding term frequency
    * normalization"): each matched term's saturated contribution is
    * lifted by idf·δ, so a long document matching a term can never
    * score below a short one that lacks it — the long-doc
    * over-penalization fix. δ = 1 is the paper's default. Single
    * unit-weight field ⇒ tf/dl are the plain corpus statistics; the
    * expression is the standard BM25 tree with the (sat + δ) lift,
    * mirrored textually in the DuckDB twin. */
  def bm25PlusHits(docs: DataFrame, field: String, terms: Seq[String],
                   delta: Double, k: Int): DataFrame = {
    require(delta > 0.0, s"bm25+ needs delta > 0, got $delta")
    val (tf, alldl, stats, df) = corpusTables(docs, Seq((field, 1L)))
    val contrib: Column =
      log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        (col("tf") * lit(2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))) +
          lit(delta))
    rank(tf, alldl, stats, df, terms, contrib, k)
  }
}
