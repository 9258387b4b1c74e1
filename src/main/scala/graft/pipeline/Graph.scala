package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Lineage._

/** Iterative graph analytics over edge-list DataFrames — the missing
  * capability class next to [[Components]] (which handles the
  * connectivity case): PageRank centrality, BFS hop distance, and
  * triangle counting, each expressed as a driver-side loop over pure
  * DataFrame joins/aggregations so Catalyst plans every step and the
  * data never leaves the executors.
  *
  * Scale posture (the 100 TB question):
  *  - Edges are hash-partitioned ON `src` ONCE and cached; every
  *    iteration's `ranks ⋈ edges` then reuses that partitioning, so the
  *    per-iteration cost is one shuffle of the RANK table (node-sized,
  *    2 cols) plus the groupBy(dst) combine — the edge table, the big
  *    side, never re-shuffles. Map-side partial aggregation bounds the
  *    contribution shuffle by (#distinct dst per partition), not #edges.
  *  - Each iteration materializes to a cached plan and unpersists the
  *    previous one, so lineage stays O(1) deep — no exponential replan
  *    at iteration 20, no stack overflow at iteration 1000 (the classic
  *    iterative-DataFrame trap).
  *  - Triangle counting orients each edge from its lower-(degree, id)
  *    endpoint to the higher one, which bounds every out-neighborhood
  *    by O(√m) [Schank & Wagner, SEA'05; Suri & Vassilvitskii, WWW'11
  *    "Counting triangles and the curse of the last reducer"] — the
  *    wedge self-join is then Σ outdeg² ≤ m^1.5, not the Σ deg² blowup
  *    a hub node causes under naive id-orientation.
  *
  * PageRank follows the GraphX/Pregel unnormalized convention
  * (rank₀ = 1, rankₜ₊₁(v) = (1−d) + d·Σ_{u→v} rankₜ(u)/outdeg(u)):
  * ranks have mean ≈ 1, so a round-6 boundary keeps ~7 significant
  * digits (the normalized 1/N form would round away at corpus scale).
  * Callers must hand in a graph where every node has outdegree ≥ 1
  * (e.g. a bidirectional edge list); dangling mass is then impossible
  * and no global dangling-sum pass is needed.
  */
object Graph {

  /** Undirected edge list → both directions, for algorithms that want
    * outdegree ≥ 1 everywhere. `edges` columns: (src, dst). */
  def bidirectional(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))

  /** PageRank over a directed edge list where EVERY node has
    * outdegree ≥ 1 (see class doc). Returns (node, pr) with pr rounded
    * to 6 decimals at the output boundary only — iterations run at full
    * double precision. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    val spark = edges.sparkSession
    // CONTRACT: `edges` rows are distinct (src, dst) pairs — every
    // builder in this object guarantees it, and re-deduplicating here
    // would cost one corpus-scale shuffle per call for nothing. A
    // multigraph input simply weights its repeated edges, which is the
    // standard weighted-PageRank reading, not an error.
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg"))
    // one-time partition of the big side; reused by every iteration's join
    val withDeg = e.join(deg, "src")
      .repartition(col("src"))
      .cache()
    withDeg.count()

    var ranks = deg.select(col("src").as("node"), lit(1.0).as("rank")).cache()
    ranks.count()
    var it = 0
    while (it < iters) {
      val next = withDeg
        .join(ranks, withDeg("src") === ranks("node"))
        .select(col("dst"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("dst")
        .agg(sum("c").as("contrib"))
        .select(col("dst").as("node"),
          (lit(1.0 - damping) + lit(damping) * col("contrib")).as("rank"))
        .cache()
      next.count() // materialize → lineage depth stays O(1)
      ranks.unpersist()
      ranks = next
      it += 1
    }
    // snapshot the node-sized result eagerly so the LAST iteration's
    // cached table can be released too (it used to outlive the call,
    // parked in the CacheManager until LRU eviction)
    val out = ranks.select(col("node"), round(col("rank"), 6).as("pr"))
      .cutLineage()
    ranks.unpersist()
    withDeg.unpersist()
    out
  }

  /** BFS hop distance from `source` over a directed edge list, expanded
    * `maxHops` times. Returns (node, dist) for every reached node with
    * its MINIMUM distance ≤ maxHops. Frontier-style: each round joins
    * only the not-yet-settled frontier (small) against the cached,
    * pre-partitioned edges, then min-merges — the standard Pregel BFS
    * shape without per-round full-graph scans. */
  def bfs(edges: DataFrame, source: Long, maxHops: Int): DataFrame = {
    val spark = edges.sparkSession
    // duplicate edges cannot change a min-distance, so no dedup pass
    // is spent here either (see the pageRank contract note)
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).cache()
    e.count()

    var dist = spark.range(1).select(lit(source).as("node"), lit(0L).as("dist")).cache()
    var frontier = dist
    var hop = 0
    while (hop < maxHops) {
      val expanded = e.join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node"), (col("dist") + lit(1L)).as("dist"))
      val nextDist = dist.union(expanded)
        .groupBy("node").agg(min("dist").as("dist")).cache()
      nextDist.count()
      // next frontier = nodes whose settled distance is exactly hop+1
      // (first reached this round); nodes re-reached at a larger
      // distance contribute nothing and are dropped by the min-merge
      val nextFrontier = nextDist.filter(col("dist") === lit(hop + 1L)).cache()
      nextFrontier.count()
      if (hop > 0) frontier.unpersist()
      dist.unpersist()
      dist = nextDist
      frontier = nextFrontier
      hop += 1
    }
    // snapshot + release the final round's cached tables (see pageRank)
    val out = dist.select(col("node"), col("dist").cast("long").as("dist"))
      .cutLineage()
    frontier.unpersist()
    dist.unpersist()
    e.unpersist()
    out
  }

  /** k-core membership (X174 — Seidman, Social Networks 1983; the
    * classic graph-curation filter that strips low-engagement fringe
    * before community/quality analysis): the maximal subgraph in which
    * every node has degree ≥ k, computed by synchronous peeling —
    * each round drops every node whose SURVIVING degree is < k — to
    * the unique fixpoint. Input: canonical undirected pairs (a < b).
    * Returns (node, deg) for core members, deg = degree inside the
    * core.
    *
    * Determinism/oracle contract: the fixpoint is unique and peeling
    * is IDEMPOTENT once converged, so a fixed `maxRounds`-round unroll
    * (the DuckDB twin) equals the converged answer exactly — this
    * method REQUIRES convergence within maxRounds and fails loudly
    * otherwise rather than returning a half-peeled subgraph.
    *
    * Scale: per round one degree agg (node-sized) + two semi-joins of
    * the edge list against the survivor set; edges cached once,
    * per-round results materialized + unpersisted (O(1) lineage, the
    * pageRank/bfs posture). Rounds are data-bounded: each non-final
    * round removes ≥1 node, and real graphs converge in a handful. */
  def kcore(pairs: DataFrame, k: Int, maxRounds: Int = 12): DataFrame = {
    require(k >= 1, s"k-core needs k >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    // each round references the surviving edge list THREE times (the
    // list itself + twice through the degree filter), so a cache-based
    // loop TRIPLES the logical plan per round — exponential analyzer
    // cost (measured: round 6 took 42 s on a 4k-edge graph). An eager
    // localCheckpoint truncates the plan to a LogicalRDD each round,
    // keeping per-round planning O(1); the checkpoint blocks are freed
    // by the ContextCleaner as each round's frame is dropped.
    var sym = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src")).cutLineage()
    var nEdges = sym.count()
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val keep = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("src").as("node"))
      val next = sym
        .join(keep, sym("src") === keep("node"), "left_semi")
        .join(keep.withColumnRenamed("node", "node2"),
          sym("dst") === col("node2"), "left_semi")
        .repartition(col("src")).cutLineage()
      val n = next.count()
      sym = next
      if (n == nEdges) converged = true
      nEdges = n
      round += 1
    }
    require(converged || nEdges == 0L,
      s"k-core did not converge within $maxRounds rounds — raise maxRounds " +
        "(and the twin's unroll) together")
    sym.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .orderBy("node")
      .cutLineage()
  }

  /** Per-node triangle counts over an UNDIRECTED graph given as
    * canonical pairs (a < b). Each triangle contributes 1 to each of
    * its three corners. Degree-ordered wedge join (see class doc):
    * orient a→b iff (deg(a), a) < (deg(b), b), self-join the oriented
    * list on its source to enumerate wedges, then semi-verify the
    * closing edge against the oriented list — every triangle is found
    * exactly once, from its lowest-ranked corner. */
  def triangleCounts(pairs: DataFrame): DataFrame = {
    val a = col("a"); val b = col("b")
    val undirected = bidirectional(pairs.select(a.as("src"), b.as("dst")))
    val deg = undirected.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("n"), col("deg"))

    // rank each endpoint by (degree, id); orient low → high
    val ranked = pairs
      .join(deg.select(col("n").as("a"), col("deg").as("dega")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("degb")), "b")
    val oriented = ranked.select(
      when(col("dega") < col("degb") ||
        (col("dega") === col("degb") && a < b), a).otherwise(b).as("lo"),
      when(col("dega") < col("degb") ||
        (col("dega") === col("degb") && a < b), b).otherwise(a).as("hi"))

    // wedges from each oriented source: (hi1, hi2) ordered by the same
    // rank so the closing edge is looked up in oriented form
    val o1 = oriented.select(col("lo").as("w"), col("hi").as("x"))
    val o2 = oriented.select(col("lo").as("w"), col("hi").as("y"))
    val wedges = o1.join(o2, "w").filter(col("x") < col("y"))
    // (x, y) with x < y is NOT necessarily rank-oriented; the closing
    // edge between two higher-ranked corners may be stored either way
    // in id order — check the canonical (a<b) pair list instead, which
    // is orientation-free
    val closing = pairs.select(a.as("x"), b.as("y"))
    val tris = wedges.join(closing, Seq("x", "y"), "left_semi")

    tris.select(col("w").as("node"))
      .union(tris.select(col("x").as("node")))
      .union(tris.select(col("y").as("node")))
      .groupBy("node")
      .agg(count(lit(1)).as("triangles"))
  }

  /** Customer↔supplier bipartite graph from the TPC-H-ish tables:
    * distinct (customer, supplier) pairs linked through an order's line
    * items, node-encoded custkey→2k, suppkey→2k+1 so the two key
    * spaces cannot collide. Returned directed BOTH ways (outdeg ≥ 1 for
    * every appearing node). */
  def customerSupplierEdges(spark: SparkSession, dir: String): DataFrame = {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val line = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    val one = orders.join(line, orders("o_orderkey") === line("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    bidirectional(one)
  }

  /** Parts-bought-together (market-basket co-occurrence) pairs: two
    * parts are linked iff they appear in at least `minSupport` common
    * orders. Canonical (a < b).
    *
    * The support threshold is what makes this graph SCALE-STABLE: the
    * support-1 co-purchase graph densifies as the corpus grows (any two
    * popular parts eventually share one random order and the graph
    * approaches a clique — triangle counting on it is Ω(n³)), while
    * repeated co-purchase stays signal. `maxGroup` caps the per-order
    * pair expansion — real order sizes are bounded (~4 lines here), so
    * the quadratic step is a constant per order; a pathological group
    * beyond the cap is dropped, the same bounded-bucket pattern as
    * MinHash-LSH banding — and, like there, every over-cap basket is
    * COUNTED in `dropped` (no silent truncation; the graph twins
    * enumerate uncapped, so oracled rows require the count stay 0 —
    * TPC-H baskets are ≤7 lines). One order-keyed shuffle + one
    * pair-keyed count agg; nothing else touches the corpus. */
  def partCopurchaseEdges(spark: SparkSession, dir: String,
      minSupport: Int = 2, maxGroup: Int = 10000,
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
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport)
      .select("a", "b")
  }

  /** Bounded weighted single-source shortest paths (Bellman-Ford,
    * `maxEdges` relaxation rounds): minimum total edge cost from
    * `source` over paths of at most `maxEdges` edges — the weighted
    * sibling of [[bfs]] (which this reduces to when every weight is 1).
    * `wedges` columns: (src, dst, w: long). Integer costs keep every
    * path sum EXACT — min-merge order, partitioning, and engine cannot
    * change a Long comparison, which is what makes the unrolled
    * relational twin bit-identical.
    *
    * Plan: the big side (edges) is hash-partitioned on src ONCE and
    * cached; each round shuffles only the node-sized distance table
    * into the join and min-merges (map-side partial min). Lineage is
    * cut per round by materialize-and-unpersist, the same O(1)-depth
    * posture as [[pageRank]]. Rounds are a fixed small constant — the
    * diameter bound the caller chooses — so the total cost is
    * maxEdges × (one node-table shuffle + one bounded join). */
  def sssp(wedges: DataFrame, source: Long, maxEdges: Int): DataFrame = {
    val spark = wedges.sparkSession
    val e = wedges.select(col("src"), col("dst"), col("w"))
      .repartition(col("src")).cache()
    e.count()

    var dist = spark.range(1)
      .select(lit(source).as("node"), lit(0L).as("dist")).cache()
    var round = 0
    while (round < maxEdges) {
      val relaxed = e.join(dist, e("src") === dist("node"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      val next = dist.union(relaxed)
        .groupBy("node").agg(min("dist").as("dist")).cache()
      next.count()
      dist.unpersist()
      dist = next
      round += 1
    }
    // snapshot + release the final round's cached table (see pageRank)
    val out = dist.select(col("node").cast("long").as("node"),
      col("dist").cast("long").as("dist"))
      .cutLineage()
    dist.unpersist()
    e.unpersist()
    out
  }

  /** Customer↔supplier edges weighted by link strength: w = the number
    * of order lines connecting the pair (so SSSP reads as "reach this
    * supplier through the FEWEST total order-lines" — weight-1 edges
    * are the weakest links and the cheapest to traverse). Same 2k/2k+1
    * node encoding as [[customerSupplierEdges]], returned both ways. */
  def customerSupplierWeightedEdges(spark: SparkSession, dir: String): DataFrame = {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val line = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    val one = orders.join(line, orders("o_orderkey") === line("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    one.select(col("src"), col("dst"), col("w"))
      .union(one.select(col("dst").as("src"), col("src").as("dst"), col("w")))
  }
}
