package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear-model fitting by EXACT sufficient statistics —
  * the scalable training pattern for models whose normal equations
  * close over sums: ONE corpus pass computes X^T X and X^T y as exact
  * integer sums (map-side combinable, skew-free — the same shape as
  * any hash aggregation), the tiny k×k system solves in closed form,
  * and scoring is a second narrow pass with the coefficients inlined.
  * Gradient-descent training would pay one corpus pass PER STEP and
  * produce order-dependent float sums; for linear least squares the
  * sufficient-statistics route is both cheaper (2 passes total) and
  * bit-deterministic, which is what makes a full SQL twin possible.
  *
  * Determinism contract (the oracle-portability trick): features and
  * targets are INTEGERS, so every entry of X^T X / X^T y is an exact
  * Long no matter how partitions combine; the 3×3 ridge system then
  * solves via Cramer's rule through one PINNED IEEE-double expression
  * tree (identical in the DuckDB twin), so the coefficients — and the
  * per-document predictions derived from them — are bit-identical
  * cross-engine. Overflow budget: entries are Σ x², Σ x·y ≤ n·max²;
  * with 32-bit-bounded features this holds to ~10¹⁴ documents.
  *
  * Model here: predict a document's token count from its byte-level
  * stats (n_chars, space count) — a tokenization cost model of the
  * kind a planner uses to budget tokenize/build stages without running
  * the tokenizer. Ridge λ keeps the system nonsingular on degenerate
  * corpora (λ = 0 gives plain OLS).
  */
object Regression {

  /** Exact integer sufficient statistics of (1, x1, x2) → y. */
  final case class Stats(n: Long, sx1: Long, sx2: Long, sy: Long,
                         sx1x1: Long, sx1x2: Long, sx2x2: Long,
                         sx1y: Long, sx2y: Long, syy: Long)

  /** Ridge coefficients (b0, b1, b2) and R², each from the pinned
    * Cramer tree over the exact stats. */
  final case class Fit(b0: Double, b1: Double, b2: Double, r2: Double)

  /** The feature/target columns over the driver `documents` schema:
    * x1 = n_chars, x2 = space count, y = tokens (split on ' ', length
    * ≥ 2 — the corpus-wide tokenize convention). All integers. */
  def featureFrame(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("n_chars").cast("long").as("x1"),
      (length(col("text")) -
        length(regexp_replace(col("text"), " ", ""))).cast("long").as("x2"),
      size(filter(split(col("text"), " "),
        t => length(t) >= 2)).cast("long").as("y"))

  /** ONE corpus-scale aggregation → the ten exact Longs. */
  def sufficientStats(feats: DataFrame): Stats = {
    val r = feats.agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("sx1"), sum(col("x2")).as("sx2"),
      sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("sx1x1"),
      sum(col("x1") * col("x2")).as("sx1x2"),
      sum(col("x2") * col("x2")).as("sx2x2"),
      sum(col("x1") * col("y")).as("sx1y"),
      sum(col("x2") * col("y")).as("sx2y"),
      sum(col("y") * col("y")).as("syy")).head()
    Stats(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
      r.getLong(9))
  }

  /** Solve (X^T X + λ·diag(0,1,1)) b = X^T y by Cramer's rule — the
    * intercept is not penalized (standard ridge practice). EVERY
    * arithmetic step below is mirrored operation-for-operation in the
    * SQL twin; do not reassociate. */
  def solve(s: Stats, lambda: Long): Fit = {
    // normal matrix (exact Longs widened once to double)
    val a11 = s.n.toDouble; val a12 = s.sx1.toDouble; val a13 = s.sx2.toDouble
    val a22 = (s.sx1x1 + lambda).toDouble; val a23 = s.sx1x2.toDouble
    val a33 = (s.sx2x2 + lambda).toDouble
    val c1 = s.sy.toDouble; val c2 = s.sx1y.toDouble; val c3 = s.sx2y.toDouble
    def det3(m11: Double, m12: Double, m13: Double,
             m21: Double, m22: Double, m23: Double,
             m31: Double, m32: Double, m33: Double): Double =
      m11 * (m22 * m33 - m23 * m32) -
        m12 * (m21 * m33 - m23 * m31) +
        m13 * (m21 * m32 - m22 * m31)
    val d = det3(a11, a12, a13, a12, a22, a23, a13, a23, a33)
    require(d != 0.0, "singular normal matrix — raise lambda")
    val b0 = det3(c1, a12, a13, c2, a22, a23, c3, a23, a33) / d
    val b1 = det3(a11, c1, a13, a12, c2, a23, a13, c3, a33) / d
    val b2 = det3(a11, a12, c1, a12, a22, c2, a13, a23, c3) / d
    // R² from the same stats: SSE = y'y − 2 b'X'y + b'X'X b,
    //                         SST = y'y − (Σy)²/n   (exact Longs in)
    val sse = s.syy.toDouble -
      2.0 * (b0 * c1 + b1 * c2 + b2 * c3) +
      (b0 * (a11 * b0 + a12 * b1 + a13 * b2) +
        b1 * (a12 * b0 + s.sx1x1.toDouble * b1 + a23 * b2) +
        b2 * (a13 * b0 + a23 * b1 + s.sx2x2.toDouble * b2))
    val sst = s.syy.toDouble - s.sy.toDouble * s.sy.toDouble / s.n.toDouble
    Fit(b0, b1, b2, if (sst == 0.0) 0.0 else 1.0 - sse / sst)
  }

  private def r6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

  /** Train + score: per-document prediction and residual through one
    * fixed IEEE tree over the bit-deterministic coefficients. */
  def fitPredict(docs: DataFrame, lambda: Long = 1L): DataFrame = {
    val feats = featureFrame(docs)
    val fit = solve(sufficientStats(feats), lambda)
    feats.select(col("doc_id"),
        (lit(fit.b0) + lit(fit.b1) * col("x1") + lit(fit.b2) * col("x2"))
          .as("p"),
        col("y"))
      .select(col("doc_id"), r6(col("p")).as("pred"),
        r6(col("y") - col("p")).as("resid"))
      .orderBy("doc_id")
  }

  /** The fit summary as a one-row frame (coefficients + R², 6-dp). */
  def fitSummary(docs: DataFrame, lambda: Long = 1L): DataFrame = {
    val spark = docs.sparkSession
    val fit = solve(sufficientStats(featureFrame(docs)), lambda)
    spark.range(1).select(
      r6(lit(fit.b0)).as("b0"), r6(lit(fit.b1)).as("b1"),
      r6(lit(fit.b2)).as("b2"), r6(lit(fit.r2)).as("r2"))
  }
}
