package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Regression

/** Algebraic gates for the sufficient-statistics ridge fit; the DuckDB
  * twin (`ols_fit`) pins cross-engine bit-equality of the whole
  * train+score pipeline. */
class RegressionSpec extends SparkSpec {
  import spark.implicits._

  private def statsOf(rows: Seq[(Long, Long, Long)]) = {
    val df = rows.zipWithIndex
      .map { case ((x1, x2, y), i) => (i.toLong, x1, x2, y) }
      .toDF("doc_id", "x1", "x2", "y")
    Regression.sufficientStats(df)
  }

  test("lambda=0 recovers an exact linear law to machine precision") {
    // y = 3 + 2*x1 - x2 on a non-degenerate integer grid
    val pts = for (x1 <- 0L to 9L; x2 <- 0L to 9L)
      yield (x1, x2, 3L + 2 * x1 - x2)
    val fit = Regression.solve(statsOf(pts), lambda = 0L)
    assert(math.abs(fit.b0 - 3.0) < 1e-9 && math.abs(fit.b1 - 2.0) < 1e-9 &&
      math.abs(fit.b2 + 1.0) < 1e-9, fit.toString)
    assert(math.abs(fit.r2 - 1.0) < 1e-9)
  }

  test("sufficient stats are exact: parallelism cannot change the fit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Regression.fitPredict(docs.repartition(1)).collect().toSeq
    val b = Regression.fitPredict(docs.repartition(13)).collect().toSeq
    assert(a == b, "fit must be bit-invariant to input partitioning")
  }

  test("fit on the real corpus explains token count well (R^2 > 0.9)") {
    // token count ~ linear in (chars, spaces) by construction of text —
    // the model must find that; a broken solve would not
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fit = Regression.solve(
      Regression.sufficientStats(Regression.featureFrame(docs)), 1L)
    assert(fit.r2 > 0.9 && fit.r2 <= 1.0, s"r2=${fit.r2}")
    // residuals from fitPredict agree with y - pred recomputed
    val out = Regression.fitPredict(docs)
    assert(out.columns.toSeq == Seq("doc_id", "pred", "resid"))
    assert(out.count() == docs.count())
  }

  test("singular system without ridge raises; ridge recovers") {
    // x2 = 2*x1 exactly -> collinear, det = 0 at lambda = 0
    val pts = (0L to 20L).map(x => (x, 2 * x, 5 * x + 1))
    intercept[IllegalArgumentException](
      Regression.solve(statsOf(pts), lambda = 0L))
    val fit = Regression.solve(statsOf(pts), lambda = 1L)
    assert(fit.r2 > 0.99, s"ridge fit should still explain: $fit")
  }
}
