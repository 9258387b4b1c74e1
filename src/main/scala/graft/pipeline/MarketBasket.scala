package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pairwise association-rule mining (Agrawal & Srikant VLDB'94's
  * support/confidence frame plus lift — the Apriori level-2 pass,
  * which in practice carries most of the value of basket analysis):
  * rules a→b over orders-as-baskets with support n(ab), confidence
  * n(ab)/n(a), and lift n(ab)·N / (n(a)·n(b)).
  *
  * Scale shape: item counts are ONE order-distinct hash agg; pair
  * counts reuse the bounded-basket pair expansion of
  * [[Graph.partCopurchaseEdges]] (quadratic only in basket size, which
  * is bounded by the domain — plus the cap); the two stats joins hit a
  * |items|-sized table, explicitly broadcast. Nothing shuffles the
  * corpus more than the order-keyed pass + the pair agg. All derived
  * ratios go through one pinned IEEE tree and a floor-round at the
  * boundary, so the DuckDB twin is byte-equal.
  */
object MarketBasket {

  /** Canonical (a < b) co-occurrence pair counts over orders-as-baskets
    * — n(ab) = number of orders containing BOTH parts.
    *
    * Cap contract: a basket larger than `maxGroup` is dropped whole and
    * COUNTED in `dropped` (the [[Dedup.minhashCandidates]] discipline —
    * no silent truncation). The DuckDB twins enumerate baskets uncapped,
    * so oracled rows are only valid while the count is 0; TPC-H baskets
    * are ≤7 lines, so at every tested scale it is. Callers that cannot
    * tolerate any drop should gate on `dropped.value == 0` after the
    * action, as the driver rows' specs do. */
  def pairCounts(spark: SparkSession, dir: String,
      maxGroup: Int = 10000,
      dropped: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    import spark.implicits._
    val lp = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as[(Long, Long)]
    val acc = dropped
    lp.groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val parts = it.map(_._2).toArray
        if (parts.length > maxGroup) { acc.foreach(_.add(1L)); Iterator.empty }
        else {
          java.util.Arrays.sort(parts)
          for {
            i <- parts.indices.iterator
            j <- (i + 1 until parts.length).iterator
          } yield (parts(i), parts(j))
        }
      }
      .toDF("a", "b")
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
  }

  private def r6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5) / 1e6

  /** Canonical (a < b < c) triple counts — the Apriori LEVEL-3 pass
    * (X173). Candidate triples enumerate basket-locally (cubic only in
    * the DOMAIN-BOUNDED basket size, same argument + cap as
    * [[pairCounts]]); classic Apriori would generate candidates by
    * L2 ⋈ L2 and re-scan, which costs two extra corpus passes that the
    * bounded-basket regime makes strictly worse. The support filter
    * afterward IS the Apriori prune (any frequent triple's pairs are
    * frequent a fortiori). Same cap contract as [[pairCounts]]:
    * over-cap baskets are dropped AND counted via `dropped`. */
  def tripleCounts(spark: SparkSession, dir: String,
      maxGroup: Int = 10000,
      dropped: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    import spark.implicits._
    val lp = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as[(Long, Long)]
    val acc = dropped
    lp.groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val parts = it.map(_._2).toArray
        if (parts.length > maxGroup) { acc.foreach(_.add(1L)); Iterator.empty }
        else {
          java.util.Arrays.sort(parts)
          for {
            i <- parts.indices.iterator
            j <- (i + 1 until parts.length).iterator
            k <- (j + 1 until parts.length).iterator
          } yield (parts(i), parts(j), parts(k))
        }
      }
      .toDF("a", "b", "c")
      .groupBy("a", "b", "c").agg(count(lit(1)).as("n_abc"))
  }

  /** Level-3 rules {x, y} → z with support ≥ `minSupport`: one row per
    * qualifying triple per consequent choice, confidence =
    * n(abc)/n(pair), lift = confidence / (n(z)/N). Pair and item
    * tables are |items|²-bounded and broadcast; every ratio goes
    * through the shared pinned IEEE tree + floor-round. */
  def tripleRules(spark: SparkSession, dir: String, minSupport: Long = 2L,
      maxGroup: Int = 10000,
      dropped: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val lp = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = lp.select(col("l_orderkey")).distinct().count()
    val itemCounts = lp.groupBy(col("l_partkey").as("item"))
      .agg(count(lit(1)).as("n_item"))
    val pc = pairCounts(spark, dir, maxGroup, dropped)
      .select(col("a").as("pa"), col("b").as("pb"), col("n_ab"))
    val triples = tripleCounts(spark, dir, maxGroup, dropped)
      .filter(col("n_abc") >= minSupport)
    // the three {pair} → consequent orientations; antecedent kept in
    // canonical (ante1 < ante2) order so the pair join is direct
    val directed =
      triples.select(col("a").as("ante1"), col("b").as("ante2"),
          col("c").as("cons"), col("n_abc"))
        .union(triples.select(col("a"), col("c"), col("b"), col("n_abc")))
        .union(triples.select(col("b"), col("c"), col("a"), col("n_abc")))
    directed
      .join(broadcast(pc),
        col("ante1") === col("pa") && col("ante2") === col("pb"))
      .join(broadcast(itemCounts.select(col("item").as("cons"),
        col("n_item").as("n_c"))), "cons")
      .select(col("ante1"), col("ante2"), col("cons"),
        col("n_abc").as("support"),
        r6(col("n_abc").cast("double") / col("n_ab").cast("double"))
          .as("confidence"),
        r6((col("n_abc").cast("double") * lit(nOrders.toDouble)) /
          (col("n_ab").cast("double") * col("n_c").cast("double")))
          .as("lift"))
      .orderBy("ante1", "ante2", "cons")
  }

  /** Directed rules (both orientations of every qualifying pair) with
    * support ≥ `minSupport` and confidence ≥ `minConf` (on the ROUNDED
    * value, so the threshold is engine-portable). */
  def rules(spark: SparkSession, dir: String, minSupport: Long = 2L,
      minConf: Double = 0.0, maxGroup: Int = 10000,
      dropped: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val lp = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = lp.select(col("l_orderkey")).distinct().count()
    val itemCounts = lp.groupBy(col("l_partkey").as("item"))
      .agg(count(lit(1)).as("n_item"))
    val pairs = pairCounts(spark, dir, maxGroup, dropped)
      .filter(col("n_ab") >= minSupport)
    // both orientations of each canonical pair
    val directed = pairs.select(col("a").as("ante"), col("b").as("cons"), col("n_ab"))
      .union(pairs.select(col("b").as("ante"), col("a").as("cons"), col("n_ab")))
    val joined = directed
      .join(broadcast(itemCounts.select(col("item").as("ante"),
        col("n_item").as("n_a"))), "ante")
      .join(broadcast(itemCounts.select(col("item").as("cons"),
        col("n_item").as("n_b"))), "cons")
    joined.select(col("ante"), col("cons"), col("n_ab").as("support"),
        r6(col("n_ab").cast("double") / col("n_a").cast("double"))
          .as("confidence"),
        r6((col("n_ab").cast("double") * lit(nOrders.toDouble)) /
          (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("lift"))
      .filter(col("confidence") >= minConf)
      .orderBy("ante", "cons")
  }
}
