package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.pipeline.Lineage._

/** Connected components over an undirected pair list — the clustering
  * step of a dedup pipeline: near-dup PAIRS (from MinHash-LSH, SimHash,
  * or embedding LSH) become duplicate GROUPS, from which one canonical
  * document per group survives.
  *
  * Algorithm: alternating large-star / small-star per Kiveris et al.,
  * "Connected Components in MapReduce and Beyond" (SoCC'14) — converges
  * in O(log² n) rounds independent of graph diameter (a min-label
  * propagation loop would need diameter rounds: a 10⁶-long chain of
  * near-dups would take 10⁶ shuffles). Each round is one groupBy
  * shuffle over the CURRENT edge set, which only shrinks toward stars.
  *
  * Scale note: the per-node neighbor set is collected in memory inside
  * one group; by convergence the component root's group holds its whole
  * component. Dedup components are overwhelmingly small (pairs/chains);
  * a component too large for one task's memory is itself a data-quality
  * signal (near-identical spam) better handled by exact-hash grouping
  * upstream.
  */
object Components {

  /** (doc_id, component) for every node in `pairs`, where component =
    * the minimum doc_id reachable — deterministic canonical label.
    * `pairs` columns: (doc_a, doc_b). */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._

    def largeStar(e: Dataset[(Long, Long)]): Dataset[(Long, Long)] =
      e.union(e.map(p => (p._2, p._1)))
        .groupByKey(_._1)
        .flatMapGroups { (u, it) =>
          val nbrs = it.map(_._2).toArray.distinct
          var m = u
          var i = 0
          while (i < nbrs.length) { if (nbrs(i) < m) m = nbrs(i); i += 1 }
          val mm = m
          nbrs.iterator.filter(_ > u).map(v => (v, mm))
        }
        .distinct()

    def smallStar(e: Dataset[(Long, Long)]): Dataset[(Long, Long)] =
      // orient every edge larger -> smaller, then star the small side
      e.map(p => if (p._1 > p._2) p else (p._2, p._1))
        .groupByKey(_._1)
        .flatMapGroups { (u, it) =>
          val nbrs = it.map(_._2).toArray.distinct // all < u by orientation
          var m = u
          var i = 0
          while (i < nbrs.length) { if (nbrs(i) < m) m = nbrs(i); i += 1 }
          val mm = m
          (nbrs.iterator ++ Iterator.single(u)).filter(_ != mm).map(v => (v, mm))
        }
        .distinct()

    var edges = pairs
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)]
      .filter(p => p._1 != p._2)
      .distinct()
      .cutLineage()
    var converged = edges.isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      // localCheckpoint truncates the lineage each round — an iterative
      // Dataset loop otherwise stacks N rounds of union/distinct plans
      // and blows the driver on analysis alone
      val next = smallStar(largeStar(edges)).cutLineage()
      // true fixpoint test: the edge SET is unchanged. (Cheaper proxies
      // — count equality, unique sources — are both satisfied by a
      // still-converging chain whose pointers merely halve each round.)
      converged = next.toDF("a", "b").except(edges.toDF("a", "b")).isEmpty &&
        edges.toDF("a", "b").except(next.toDF("a", "b")).isEmpty
      edges.unpersist()
      edges = next
      iter += 1
    }
    // components = star edges + the roots themselves
    edges.flatMap(p => Iterator((p._1, p._2), (p._2, p._2)))
      .distinct()
      .toDF("doc_id", "component")
  }

  /** Duplicate groups (size ≥ 2) with the canonical (minimum) id first. */
  def dupGroups(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .groupBy(col("component"))
      .agg(count(lit(1)).as("sz"), sort_array(collect_list(col("doc_id"))).as("ids"))
      .select(col("component").as("canonical"), col("sz"), col("ids"))

  /** The dedup pipeline's final step: every doc_id that should be
    * DROPPED (a non-canonical member of some duplicate group). */
  def nonCanonical(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id"), col("component").as("kept"))
}
