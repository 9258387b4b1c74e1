package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.tokenize.Tokenizer

/** Labeled corpus clustering — the exploration/reporting primitive a
  * training-data pipeline runs before mixture balancing: partition the
  * corpus in embedding space (the [[IvfIndex]] coarse spherical-k-means
  * quantizer) and CHARACTERIZE each cluster with its size, its cohesion
  * (mean cosine of members to their centroid), and its most
  * characteristic terms by cluster-tf·idf — the "what is this cluster
  * about" label (the standard cluster-labeling rule; cf. Manning,
  * Raghavan & Schütze, "Introduction to Information Retrieval", ch. 17
  * on cluster labeling by differential terms).
  *
  * Scale posture (the 100 TB walk-through):
  *  - clustering = the IvfIndex trainer (bounded deterministic sample,
  *    driver-side Lloyd) + ONE narrow assignment pass (broadcast
  *    centroids) — no corpus shuffle;
  *  - docs ⋈ assignment is the only corpus-scale JOIN (both sides keyed
  *    by doc_id — co-partitionable/bucketable at the design point);
  *  - term statistics cost ONE corpus-scale aggregation: a narrow
  *    fused tokenize+tf flatMap (the P7 shape — per-doc term counts
  *    computed inside the row, so the agg input is per-(doc,term)
  *    distinct already) into a (list,term) hash agg that carries BOTH
  *    Σtf and the per-cluster doc count. Everything downstream —
  *    df(term) = Σ over lists of that doc count, tf·idf scoring, and
  *    the per-cluster top-m — runs over the vocab×nlist table, never
  *    the corpus;
  *  - per-cluster top-m is the exact two-stage pattern (partition-local
  *    partial top-m, then a per-list final merge): the list-keyed
  *    shuffle moves ≤ partitions·nlist·m rows, so few-cluster skew is
  *    bounded by the partial.
  *
  * Determinism (cross-run, any parallelism): seeded deterministic
  * k-means + lowest-id assignment ties ([[IvfIndex.train]]); cohesion is
  * an EXACT integer mean — member cosines are rounded to micro units
  * (Long) BEFORE summing, so the sum is order-independent, and the mean
  * is one IEEE division of two exact integers; term scores are
  * ctf·ln(N/df) — a fixed tree of IEEE ops over exact Longs — floor-
  * rounded to 6 dp with ties broken (score desc, term asc). Clustering
  * is approximate BY DESIGN (no SQL twin — the ann_lsh/semantic-dedup
  * posture); ClusteringSpec pins assignment ≡ nearest-centroid brute
  * force, the label rule vs a driver-side recount, cohesion exactness,
  * and bit-determinism under repartitioning.
  */
object Clustering {

  /** One labeled cluster row. Public: Spark encoders fail codegen on
    * private case classes. */
  final case class Topic(list: Int, n_docs: Long, cohesion: Double,
                         terms: Array[String])

  /** Cluster the corpus by embedding and label every cluster.
    *
    * @param docs       (doc_id, content) — only docs present in
    *                   `embeddings` participate (inner join)
    * @param embeddings (vec_id, embedding) with vec_id = doc_id
    * @param topTerms   label size m: the m highest-tf·idf terms
    * @return one row per non-empty cluster:
    *         (list, n_docs, cohesion, terms[m]) ordered by list
    */
  def clusterTopics(spark: SparkSession, docs: DataFrame,
                    embeddings: Dataset[(Long, Array[Float])],
                    p: IvfIndex.Params = IvfIndex.Params(),
                    topTerms: Int = 5): DataFrame = {
    require(topTerms >= 1, s"topTerms must be >= 1, got $topTerms")
    import spark.implicits._

    val assigned = SemDedup.assign(spark, embeddings,
        SemDedup.Params(nlist = p.nlist, iters = p.iters,
          sampleCap = p.sampleCap, dim = p.dim, seed = p.seed))
      .select(col("vec_id").as("doc_id"), col("list"), col("centroid_cos"))

    // size + cohesion: micro-cos Longs sum exactly in any order
    val sizes = assigned
      .groupBy(col("list"))
      .agg(count(lit(1)).as("n_docs"),
        sum(floor(col("centroid_cos") * lit(1e6) + lit(0.5)).cast("long"))
          .as("cos_micro"))
      .select(col("list"), col("n_docs"),
        (floor(col("cos_micro").cast("double") / col("n_docs").cast("double")
          + lit(0.5)) / lit(1e6)).as("cohesion"))

    // ONE corpus-scale agg: fused tokenize+tf rows -> (list, term) stats
    val listTerm = docs.select(col("doc_id"), col("content"))
      .join(assigned.select(col("doc_id"), col("list")), Seq("doc_id"))
      .select(col("list"), col("content")).as[(Int, String)]
      .flatMap { case (list, content) =>
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        Tokenizer.tokenize(content).foreach { t =>
          counts.update(t, counts.getOrElse(t, 0L) + 1L)
        }
        counts.iterator.map { case (t, c) => (list, t, c) }
      }
      .toDF("list", "term", "tf")
      .groupBy(col("list"), col("term"))
      .agg(sum(col("tf")).as("ctf"), count(lit(1)).as("dcnt"))

    // vocab-scale from here on
    val nDocs = assigned.count().toDouble
    val dfTab = listTerm.groupBy(col("term")).agg(sum(col("dcnt")).as("df"))
    val scored = listTerm.join(dfTab, Seq("term"))
      .select(col("list"), col("term"),
        (floor(col("ctf").cast("double")
          * log(lit(nDocs) / col("df").cast("double"))
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("score"))
      .as[(Int, String, Double)]

    val m = topTerms
    def top(rows: Iterator[(Int, String, Double)])
        : Iterator[(Int, String, Double)] =
      rows.toSeq.groupBy(_._1).iterator.flatMap { case (_, xs) =>
        xs.sortBy { case (_, t, s) => (-s, t) }.take(m)
      }
    val labels = scored
      .mapPartitions(top)                          // partial winners
      .groupByKey(_._1).mapGroups { (list, it) =>  // final merge
        val terms = top(it).toSeq
          .sortBy { case (_, t, s) => (-s, t) }.map(_._2).toArray
        (list, terms)
      }
      .toDF("list", "terms")

    sizes.join(labels, Seq("list"))
      .select(col("list"), col("n_docs"), col("cohesion"), col("terms"))
      .orderBy(col("list"))
  }
}
