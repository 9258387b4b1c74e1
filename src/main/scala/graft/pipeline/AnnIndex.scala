package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Persisted random-hyperplane LSH index over an embedding table — the
  * similarity-search scale path (random-hyperplane signatures per
  * Charikar, "Similarity Estimation Techniques from Rounding
  * Algorithms", STOC 2002; banding/table structure per the classic
  * MinHash-LSH construction, e.g. Leskovec/Rajaraman/Ullman, Mining of
  * Massive Datasets ch. 3; SURVEY §2.8).
  *
  * Build once, query many: `build` computes every vector's per-table
  * signatures in ONE corpus pass and writes a bucket table
  * `(table, sig, vec_id, embedding, sigs)` as parquet sorted by
  * (table, sig) — the ANN analog of a posting list. Queries never rescan
  * or re-hash the corpus: `topK` computes only the QUERY signatures
  * (driver-side, |q|·tables dot products), pushes a (table, sig)
  * predicate into the parquet scan (row-group min/max pruning on the
  * sorted layout), and broadcast-joins the tiny query table against the
  * matching buckets. `nearDupPairs` generates candidate pairs inside
  * each bucket with first-collision dedupe (the `sigs` array lets a pair
  * be emitted by exactly ONE table — no corpus-scale distinct), then
  * exact-cosine verifies in place.
  *
  * Scale notes: the only corpus-wide shuffle is the one-off build sort;
  * per-bucket pair expansion is bounded by `bucketCap` with drops
  * counted in an accumulator (silent truncation in a dedup pipeline is a
  * data-quality hazard). planesPerTable should grow with log2(n) to keep
  * buckets O(1); tables buys recall at linear cost.
  */
object AnnIndex {

  /** One bucket entry. `sigs` = the vector's signature in EVERY table,
    * enabling first-collision pair dedupe. Public: Spark encoders fail
    * codegen on private case classes. */
  final case class BucketRow(table: Int, sig: Int, vec_id: Long,
                             embedding: Array[Float], sigs: Array[Int])

  final case class Params(tables: Int = 8, planesPerTable: Int = 8,
                          dim: Int = 64, seed: Long = 1000L)

  private def planesFor(p: Params): Array[Array[Array[Float]]] =
    (0 until p.tables).map(t =>
      Ann.hyperplanes(p.planesPerTable, p.dim, p.seed + t)).toArray

  /** One pass over the embeddings → sorted bucket parquet + params.json. */
  def build(spark: SparkSession, embeddings: Dataset[(Long, Array[Float])],
            dir: String, p: Params = Params()): AnnIndex = {
    import spark.implicits._
    val planes = planesFor(p) // ~tables·planes·dim·4B, serialized once per task
    val rows = embeddings.flatMap { case (id, emb) =>
      val sigs = planes.map(pl => Ann.signature(emb, pl))
      (0 until sigs.length).iterator.map(t => BucketRow(t, sigs(t), id, emb, sigs))
    }
    rows.toDF()
      .repartitionByRange(col("table"), col("sig"))
      .sortWithinPartitions("table", "sig")
      .write.mode("overwrite").parquet(s"$dir/buckets")
    Files.writeString(Paths.get(dir, "params.json"),
      s"""{"tables":${p.tables},"planesPerTable":${p.planesPerTable},""" +
        s""""dim":${p.dim},"seed":${p.seed}}""")
    load(spark, dir)
  }

  def load(spark: SparkSession, dir: String): AnnIndex = {
    val json = Files.readString(Paths.get(dir, "params.json"))
    def num(key: String): Long = {
      val m = java.util.regex.Pattern.compile("\"" + key + "\":(-?[0-9]+)").matcher(json)
      require(m.find(), s"missing $key in params.json")
      m.group(1).toLong
    }
    val p = Params(num("tables").toInt, num("planesPerTable").toInt,
      num("dim").toInt, num("seed"))
    new AnnIndex(spark, dir, p)
  }

  /** Cosine over the stored arrays as the NATIVE Catalyst expression
    * (`CosineF32`) — registered on demand, invoked via the function
    * registry. Bit-identical accumulation order to Ann.cosine (proven
    * in VectorExprSpec), so scores equal the exact brute-force path,
    * and unlike the former Scala UDF it stays inside whole-stage
    * codegen: no Seq[Float] boxing on the candidate-scoring path,
    * which is corpus-fraction-sized for IVF probes (the repo's
    * ExprBench measured the UDF 5.9–7.4x slower). */
  private[pipeline] def nativeCos(spark: SparkSession, a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(spark)
    call_function("graft_cosine", a, b)
  }
}

final class AnnIndex(spark: SparkSession, dir: String, val params: AnnIndex.Params) {
  import AnnIndex._
  import spark.implicits._

  /** The persisted bucket table. Read fresh per query (the parquet scan
    * is pruned by the pushed (table, sig) predicate); callers holding a
    * serving tier open can `.cache()` it. */
  def buckets: DataFrame = spark.read.parquet(s"$dir/buckets")

  /** Approximate top-k neighbors per query vector: bucket join, no
    * corpus re-hash. Output (query_id, neighbor_id, cos, rank) ranked by
    * (round(cos,6) desc, neighbor_id) like Ann.bruteTopK. */
  def topK(queries: Array[(Long, Array[Float])], k: Int): DataFrame = {
    require(queries.nonEmpty)
    val planes = planesFor(params)
    val qrows = queries.flatMap { case (qid, qemb) =>
      (0 until params.tables).map(t =>
        (qid, t, Ann.signature(qemb, planes(t)), qemb))
    }
    // per-table IN-list predicate — pushed into the parquet scan, where
    // the (table, sig)-sorted layout turns it into row-group pruning
    val sigsByTable = qrows.groupBy(_._2).view.mapValues(_.map(_._3).distinct.toSeq)
    val pushdown = sigsByTable.map { case (t, sigs) =>
      col("table") === t && col("sig").isin(sigs: _*)
    }.reduce(_ || _)
    val qdf = broadcast(qrows.toSeq
      .toDF("query_id", "qtable", "qsig", "qemb"))
    buckets.filter(pushdown)
      .join(qdf, col("table") === col("qtable") && col("sig") === col("qsig"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        nativeCos(spark, col("qemb"), col("embedding")).as("cos"))
      // a pair colliding in several tables appears once per table; the
      // cos is identical, so max() is pure dedupe
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(round(max(col("cos")), 6).as("cos"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Near-duplicate pairs (cos ≥ tau, doc_a < doc_b) from bucket-local
    * candidate generation — the scale-safe twin of Ann.nearDupPairs: no
    * driver collect, no all-pairs scan, candidates bounded per bucket.
    * First-collision dedupe: a pair is emitted only by the FIRST table
    * in which it collides, so no corpus-scale distinct is needed and the
    * exact-cosine verification runs once per candidate pair. */
  def nearDupPairs(tau: Double, bucketCap: Int = 10000,
                   dropped: Option[LongAccumulator] = None): DataFrame = {
    val acc = dropped
    buckets.as[BucketRow]
      .groupByKey(r => (r.table, r.sig))
      .flatMapGroups { (key: (Int, Int), it: Iterator[BucketRow]) =>
        val t = key._1
        val rows = it.toArray.sortBy(_.vec_id)
        if (rows.length > bucketCap) {
          acc.foreach(_.add(1L))
          Iterator.empty
        } else if (rows.length < 2) Iterator.empty
        else for {
          i <- rows.indices.iterator
          j <- (i + 1 until rows.length).iterator
          a = rows(i); b = rows(j)
          if a.vec_id != b.vec_id
          // first-collision: no earlier table already bucketed this pair
          if !(0 until t).exists(tp => a.sigs(tp) == b.sigs(tp))
          c = Ann.cosine(a.embedding, b.embedding)
          if c >= tau
        } yield (a.vec_id, b.vec_id, c)
      }
      .toDF("doc_a", "doc_b", "cos")
      .withColumn("cos", round(col("cos"), 6))
  }
}
