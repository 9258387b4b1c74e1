package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Semantic deduplication — SemDeDup (Abbas et al., "SemDeDup: Data-
  * efficient learning at web-scale through semantic deduplication",
  * 2023): cluster the embedding space with a coarse k-means quantizer,
  * find near-duplicate pairs ONLY within each cluster, and keep one
  * representative per duplicate group — the paper's rule: the example
  * with the LOWEST cosine similarity to its cluster centroid (the most
  * atypical member survives; prototypical redundancy is pruned).
  *
  * This is the embedding-space answer to MinHash dedup: textually
  * distinct but semantically redundant documents (translations,
  * paraphrases, template expansions) collide in NO lexical bucket but
  * sit in the same k-means cell.
  *
  * Scale posture (the reason SemDeDup works at web scale and an exact
  * pair scan cannot): the coarse quantizer is the [[IvfIndex]] trainer —
  * bounded deterministic sample, driver-side Lloyd — so clustering costs
  * ONE narrow assignment pass; pair generation is per-cluster pairwise
  * with a hard `listCap` (over-cap cells SKIPPED AND COUNTED via
  * accumulator — the D3/D6 drop discipline), so candidate work is
  * Σ|cell|² bounded by nlist·listCap², never corpus²; grouping is the
  * O(log n)-round large-star/small-star of [[Components]]; the keep rule
  * needs only the (vec_id, centroid-cos) sidecar already produced by
  * assignment. Everything downstream of the one assignment pass touches
  * only pair/group-sized data.
  *
  * Determinism (cross-run, any parallelism): seeded deterministic
  * k-means ([[IvfIndex.train]]), assignment ties to the lowest list id,
  * pair cosines rounded to 6 dp, keep rule compares (ROUNDED centroid
  * cos asc, vec_id asc). Approximate BY DESIGN versus an exact all-pairs
  * sweep (clustering can split a true near-dup pair across cells ⇒ no
  * exact SQL twin — the ann_lsh/ann_pq/simhash posture); SemDedupSpec
  * pins pairs ≡ brute-force within-cluster pairs, the keep rule, drop
  * counting, and bit-determinism.
  */
object SemDedup {

  /** One assigned vector: its cluster and its (rounded) cosine to the
    * cluster centroid. Public: Spark encoders fail on private classes. */
  final case class Assigned(vec_id: Long, list: Int, centroid_cos: Double,
                            embedding: Array[Float])

  final case class Params(nlist: Int = 16, iters: Int = 10,
                          sampleCap: Int = 65536, dim: Int = 64,
                          seed: Long = 15000L, tau: Double = 0.97,
                          listCap: Int = 10000) {
    def coarse: IvfIndex.Params =
      IvfIndex.Params(nlist = nlist, iters = iters, sampleCap = sampleCap,
        dim = dim, seed = seed)
  }

  /** Train + assign: one narrow pass (broadcast centroids), emitting the
    * cluster id and the rounded centroid cosine the keep rule ranks on. */
  def assign(spark: SparkSession, embeddings: Dataset[(Long, Array[Float])],
             p: Params): Dataset[Assigned] = {
    import spark.implicits._
    val cents = IvfIndex.train(IvfIndex.sampleFor(embeddings, p.sampleCap), p.coarse)
    val bc = spark.sparkContext.broadcast(cents)
    embeddings.map { case (id, emb) =>
      val v = PqIndex.normalize(emb)
      val cs = bc.value
      var best = 0
      var bd = {
        var d = 0.0; var i = 0
        while (i < v.length) { d += v(i) * cs(0)(i); i += 1 }
        d
      }
      var c = 1
      while (c < cs.length) {
        var d = 0.0; var i = 0
        while (i < v.length) { d += v(i) * cs(c)(i); i += 1 }
        if (d > bd) { best = c; bd = d }
        c += 1
      }
      Assigned(id, best, math.floor(bd * 1e6 + 0.5) / 1e6, emb)
    }
  }

  /** Within-cluster near-duplicate pairs at cosine ≥ tau: per-cell
    * pairwise with the hard cap (over-cap cells dropped AND counted).
    * Output (doc_a, doc_b, cos) with doc_a < doc_b, cos rounded —
    * the D3/D6 pair contract, so [[Components]] consumes it directly. */
  def pairs(assigned: Dataset[Assigned], tau: Double, listCap: Int,
            dropped: Option[LongAccumulator] = None): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val acc = dropped
    assigned.groupByKey(_.list)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(_.vec_id)
        if (rows.length > listCap) {
          acc.foreach(_.add(1L))
          Iterator.empty
        } else if (rows.length < 2) Iterator.empty
        else for {
          i <- rows.indices.iterator
          j <- (i + 1 until rows.length).iterator
          c = Ann.cosine(rows(i).embedding, rows(j).embedding)
          if c >= tau
        } yield (rows(i).vec_id, rows(j).vec_id, c)
      }
      .toDF("doc_a", "doc_b", "cos")
      .withColumn("cos", round(col("cos"), 6))
  }

  /** The full SemDeDup pass: (vec_id, list, centroid_cos, keep) — keep
    * is true for every un-grouped vector and for exactly ONE member of
    * each duplicate group: the (rounded centroid_cos asc, vec_id asc)
    * minimum, the paper's lowest-centroid-similarity rule. */
  def prune(spark: SparkSession, embeddings: Dataset[(Long, Array[Float])],
            p: Params = Params(),
            dropped: Option[LongAccumulator] = None): DataFrame = {
    import spark.implicits._
    val assigned = assign(spark, embeddings, p).cache()
    val prs = pairs(assigned, p.tau, p.listCap, dropped)
    // group membership is PAIR-sized data; the keep rule's window ranks
    // only group members (never the corpus — an outer-join window would
    // sort every un-grouped row into one NULL partition), and the
    // per-member verdicts broadcast back onto the corpus-sized sidecar
    val member = Components.connectedComponents(prs) // (doc_id, component)
    val verdicts = assigned.toDF()
      .join(member, col("vec_id") === col("doc_id"))
      .withColumn("pick", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("component"))
          .orderBy(col("centroid_cos").asc, col("vec_id").asc)))
      .select(col("vec_id"), (col("pick") === 1).as("keepg"))
    assigned.toDF()
      .join(broadcast(verdicts), Seq("vec_id"), "left")
      .withColumn("keep", coalesce(col("keepg"), lit(true)))
      .select(col("vec_id"), col("list"), col("centroid_cos"), col("keep"))
      .orderBy(col("vec_id"))
  }
}
