package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values / theta) distinct-count sketch — Beyer et al.
  * SIGMOD'07 "On synopses for distinct-value estimation under multiset
  * operations" (the estimator family behind Apache DataSketches' theta
  * sketch): keep the k SMALLEST hash values of a set; with U_(k) the
  * k-th smallest hash normalized to (0,1), the unbiased estimate is
  * (k−1)/U_(k). Sketches MERGE by keeping the k smallest of the union —
  * the property that makes distinct-counting map-side combinable and
  * cross-partition cheap at 100 TB (ship k Longs per partition, not the
  * value set). A scope with ≤ k distinct values is EXACT by
  * construction (the sketch holds the whole set).
  *
  * Hashes are the repo's md5-portable 60-bit family, so — unlike
  * HLL++ (`ft_cardinality`'s approx sibling, scalatest-gated) — the
  * KMV estimate is bit-identical cross-engine and the whole operator
  * has a byte-equal SQL twin, estimates included.
  *
  * Plan shape here: ONE distinct shuffle reduces events to (scope,
  * member) pairs, a scope-keyed rank window keeps the k smallest
  * hashes, and the estimate is one fixed IEEE division per scope row,
  * 4-dp floor-rounded. (A production ingest would fold the same k-min
  * heaps map-side in a typed Aggregator — identical output by the
  * merge law below, which KmvSpec pins.)
  */
object Kmv {

  /** 2^60 — the hash-space size of the 15-hex md5 prefix, exact in
    * Double. */
  private val HashSpace = 1152921504606846976.0

  /** The member hash — driver/test twin of the column rule. */
  def memberHash(member: String): Long =
    PortableHash.md5HexPrefixLong(s"u:$member", 15)

  /** The KMV estimate from a scope's k smallest hashes (ascending) and
    * its true-if-small cardinality: exact below k, (k−1)/U_(k) above,
    * 4-dp half-up rounded. */
  def estimate(kSmallest: Seq[Long], nDistinct: Long, k: Int): Double =
    if (nDistinct <= k) nDistinct.toDouble
    else {
      val uk = kSmallest(k - 1).toDouble / HashSpace
      math.floor((k - 1).toDouble / uk * 1e4 + 0.5) / 1e4
    }

  /** Per-scope distinct-member estimates over a two-column (scope,
    * member) frame, plus the merged 'ALL' scope (the union sketch):
    * (scope, n_exact, n_est) ordered by scope. `n_exact` is carried so
    * the estimate's quality is visible in the output itself. */
  def distinctEstimates(pairs: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val spark = pairs.sparkSession
    val base = pairs.toDF("scope", "member").distinct()
    val withAll = base.union(
      base.select(lit("ALL").as("scope"), col("member")).distinct())
    val hashed = withAll.withColumn("h",
      conv(substring(md5(concat(lit("u:"), col("member").cast("string"))),
        1, 15), 16, 10).cast("long"))
    // member tie-break: a (vanishingly unlikely) 60-bit hash collision
    // must not make the rank nondeterministic
    val w = Window.partitionBy("scope").orderBy(col("h"), col("member"))
    val ranked = hashed.withColumn("r", row_number().over(w))
    val nex = hashed.groupBy("scope")
      .agg(count(lit(1)).as("n_exact"))
    val kth = ranked.filter(col("r") === k)
      .select(col("scope"), col("h").as("hk"))
    nex.join(kth, Seq("scope"), "left")
      .select(col("scope"), col("n_exact"),
        when(col("hk").isNull, col("n_exact").cast("double"))
          .otherwise(floor(lit((k - 1).toDouble * HashSpace) / col("hk")
            * 1e4 + 0.5) / 1e4).as("n_est"))
      .orderBy("scope")
  }
}
