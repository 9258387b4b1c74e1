package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Two-pass deterministic heavy hitters over the token stream
  * (X182 — Misra & Gries, "Finding repeated elements", Sci. Comput.
  * Program. 1982; the candidate-GENERATION sketch next to [[Cms]]'s
  * point-ESTIMATION grid): pass 1 runs a capacity-k Misra–Gries
  * counter summary per partition and unions the surviving keys; pass 2
  * counts the candidates EXACTLY and keeps those at or above the
  * frequency threshold.
  *
  * Why the output is exact and deterministic even though MG is
  * order-sensitive: a term with global count ≥ N/φ must, by averaging,
  * have local count ≥ N_p/φ in at least one partition, and a capacity-k
  * MG summary retains every term with local frequency > N_p/(k+1) —
  * so with k + 1 > φ every true heavy hitter SURVIVES pass 1 in some
  * partition regardless of arrival order or partitioning. Which EXTRA
  * candidates survive does vary with order; the exact pass-2 count +
  * threshold filter discards exactly them. Output = precisely
  * {term : cnt·φ ≥ N} — SQL-expressible, hence a full DuckDB twin.
  *
  * Scale posture: pass 1 is one narrow mapPartitions (fixed k-entry
  * map per partition — 100 TB changes nothing about its memory);
  * candidates collect driver-side at ≤ P·k entries (residency: 1000
  * executors × k=4096 ≈ 4M strings, tens of MB — annotated, bounded by
  * CONFIG not data) and re-ship as a broadcast semi-join; pass 2 is
  * one hash agg over the candidate-filtered stream. Nothing shuffles
  * the full token stream: the only exchange carries candidate terms.
  */
object HeavyHitters {

  /** The fulltext tokenization convention (split on ' ', drop tokens
    * shorter than 2 chars) shared with Cms and the SQL twins. */
  private def words = filter(split(col("text"), " "), w => length(w) >= 2)

  /** Capacity-k Misra–Gries summary of one stream: at most k counters;
    * a miss with a full table decrements ALL counters and evicts the
    * zeroed ones (the classic k-way generalization of Boyer–Moore
    * majority). Exposed for the property tests. */
  def mgSummary(it: Iterator[String], k: Int): collection.Map[String, Long] = {
    require(k >= 1, s"capacity must be >= 1, got $k")
    val m = new scala.collection.mutable.HashMap[String, Long]
    it.foreach { t =>
      m.get(t) match {
        case Some(c) => m.update(t, c + 1)
        case None if m.size < k => m.update(t, 1L)
        case None =>
          // decrement-all; evict zeros (amortized O(1) per arrival)
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          m.foreach { case (key, c) =>
            if (c == 1L) dead += key else m.update(key, c - 1)
          }
          dead.foreach(m.remove)
      }
    }
    m
  }

  /** Pass 1: the union of per-partition MG survivor keys — a SUPERSET
    * of every term with global frequency ≥ N/(k+1) (see class doc). */
  def candidates(docs: DataFrame, k: Int): Array[String] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(words).as("term")).as[String]
      .mapPartitions(it => mgSummary(it, k).keysIterator)
      // ≤ P·k entries reach the driver — bounded by config, not corpus
      .distinct().collect()
  }

  /** Both passes: exact counts of every term with cnt·phi ≥ N (N =
    * total token count), descending with term tie-break. `k` must
    * exceed `phi` (k + 1 > phi is the survival guarantee); the default
    * 16× headroom keeps pass-1 false negatives impossible and pass-2
    * input small. */
  def heavyHitters(docs: DataFrame, phi: Long = 256L,
                   k: Int = 4096): DataFrame = {
    require(k + 1 > phi, s"capacity $k must exceed threshold divisor $phi")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(words).as("term"))
    val n = toks.count()
    val cand = candidates(docs, k)
    val candDf = cand.toSeq.toDF("term")
    toks.join(broadcast(candDf), "term")
      .groupBy($"term").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * lit(phi) >= lit(n))
      .orderBy($"cnt".desc, $"term".asc)
  }
}
