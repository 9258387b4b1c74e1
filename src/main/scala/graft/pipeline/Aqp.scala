package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate query processing over a deterministic sample — the
  * BlinkDB posture (Agarwal et al., EuroSys'13): answer an aggregate
  * from a p-fraction sample and RETURN THE ERROR BAR with the estimate
  * (±1.96·s/√n, the CLT 95% interval). At 100 TB the sample is the
  * only table scanned — a 1% sample turns a full-corpus aggregation
  * into a 1%-scan with a quantified accuracy contract.
  *
  * Everything is engine-portable: the sample membership rule is the
  * repo's md5 micro-bucket (hash6 mod 10⁶ < rate — growth-stable: a
  * doc's membership never changes as the corpus grows, so samples are
  * consistent across snapshots), the moments are EXACT Long sums over
  * the sample, and the mean/CI derive through one fixed IEEE tree,
  * 6-dp floor-rounded at the output boundary. The exact mean rides
  * along so the estimate's quality is visible in the output itself.
  */
object Aqp {

  /** Per-lang sampled mean of n_chars with a 95% CI, next to the exact
    * mean: (lang, n_sample, mean_est, ci95, mean_exact). `ratePerM` of
    * 10⁶ docs enter the sample. Langs whose sample holds < 2 docs are
    * dropped (no variance estimate exists — pinned). */
  def sampledMean(docs: DataFrame, ratePerM: Int): DataFrame = {
    require(ratePerM >= 1 && ratePerM <= 999999,
      s"sample rate must be in [1, 999999] per million, got $ratePerM")
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
      .cast("long") % 1000000L
    val x = col("n_chars").cast("long")
    val samp = docs.filter(h < ratePerM)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(x).as("s1"), sum(x * x).as("s2"))
      .filter(col("n") >= 2)
    val exact = docs.groupBy("lang")
      .agg(sum(x).as("es1"), count(lit(1)).as("en"))
    val n = col("n").cast("double")
    val mean = col("s1") / n
    val variance = greatest(lit(0.0),
      (col("s2") - col("s1") * col("s1") / n) / (n - 1))
    samp.join(exact, "lang")
      .select(col("lang"), col("n").as("n_sample"),
        round(mean, 6).as("mean_est"),
        round(lit(1.96) * sqrt(variance / n), 6).as("ci95"),
        round(col("es1") / col("en").cast("double"), 6).as("mean_exact"))
      .orderBy("lang")
  }
}
