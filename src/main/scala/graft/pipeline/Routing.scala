package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) shard routing — Thaler &
  * Ravishankar, ToN'98: a doc routes to the shard with the maximal
  * hash weight md5(doc#shard). The property that makes it THE router
  * for an elastic serving tier (and what RoutingSpec gates): growing
  * S → S+1 shards moves ONLY the docs whose new-shard weight wins —
  * an expected 1/(S+1) of the corpus — and every moved doc lands on
  * the NEW shard; nothing reshuffles between existing shards
  * (consistent-hashing's minimal-disruption guarantee without the
  * ring's variance).
  *
  * Plan: one narrow map over the corpus — zero shuffles, no state;
  * the md5-portable hash family makes the assignment engine-portable
  * (the DuckDB twin computes identical weights from identical hex).
  * Ties (a 60-bit hash collision) pin to the smallest shard id. */
object Routing {

  /** (doc_id, shard, weight) under rendezvous routing over `shards`
    * shards (ids 0..shards-1). */
  def rendezvousRoute(spark: SparkSession, docs: DataFrame,
                      shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      var bestW = -1L
      var bestS = -1
      var s = 0
      while (s < shards) {
        val w = PortableHash.md5HexPrefixLong(s"$id#$s", 15)
        if (w > bestW) { bestW = w; bestS = s }
        s += 1
      }
      (id, bestS, bestW)
    }.toDF("doc_id", "shard", "weight")
  }
}
