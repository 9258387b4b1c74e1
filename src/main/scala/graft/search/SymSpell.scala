package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SymSpell delete-neighborhood spelling index (Garbe's symmetric
  * delete algorithm; the candidate-generation idea goes back to
  * Mor & Fraenkel, CACM'82 "A hash code method for detecting and
  * correcting spelling errors") — the SCALE path next to
  * DocsIndex.termSuggest's dictionary-scan brute force: if
  * lev(a, b) <= d then deleting <= d chars from each side meets in a
  * common variant, so candidates come from an EQUI-JOIN of the query
  * term's delete set (tiny, driver-side) against a precomputed
  * (variant -> term) table, and the exact Levenshtein verify runs on
  * that candidate set only — never on the dictionary.
  *
  * Scale posture: the index build is ONE explode of the dictionary
  * (|dict| · O(L^d) variant rows, the standard SymSpell trade of
  * space for query time) — at the design point it persists bucketed
  * and sorted by variant like the ANN/trigram sidecars, so a query's
  * <= L^d-element IN-list prunes row groups; the probe side always
  * broadcasts. Query-time dictionary scans: zero.
  *
  * Equivalence contract: identical output to the brute-force
  * dictionary scan at the same (maxDist, topN) — asserted exactly in
  * SymSpellSpec (candidate completeness is the algorithm's theorem,
  * the spec makes it an invariant). Same suggest_mode=missing and
  * (dist asc, df desc, term asc) ranking as ft_term_suggest. */
object SymSpell {

  /** s plus every string obtainable by deleting up to `d` chars. */
  def deletes(s: String, d: Int): Set[String] = {
    var cur = Set(s)
    var all = Set(s)
    var i = 0
    while (i < d) {
      cur = cur.flatMap { x =>
        (0 until x.length).iterator
          .map(j => x.substring(0, j) + x.substring(j + 1))
      }
      all = all ++ cur
      i += 1
    }
    all
  }

  /** Delete-neighborhood index over a (term, df) dictionary. */
  def buildIndex(dict: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2, s"maxDist in [1,2], got $maxDist")
    val spark = dict.sparkSession
    import spark.implicits._
    dict.select(col("term").cast("string"), col("df").cast("long"))
      .as[(String, Long)]
      .flatMap { case (t, df) =>
        deletes(t, maxDist).iterator.map(v => (v, t, df))
      }
      .toDF("variant", "term", "df")
  }

  /** Spelling suggestions for `terms` against a prebuilt index:
    * (input_term, suggestion, dist, df, rank), missing-mode, top `n`
    * per input by (dist asc, df desc, term asc). */
  def suggest(index: DataFrame, terms: Seq[String], maxDist: Int,
              topN: Int): DataFrame = {
    require(terms.nonEmpty && maxDist >= 1 && maxDist <= 2 && topN >= 1,
      s"need terms, maxDist in [1,2], topN >= 1; got $terms/$maxDist/$topN")
    val spark = index.sparkSession
    import spark.implicits._
    val probes = terms.map(_.trim.toLowerCase).distinct
      .flatMap(t => deletes(t, maxDist).iterator.map(v => (t, v)))
      .toDF("input_term", "variant")
    val cand = index.join(broadcast(probes), "variant")
      .select(col("input_term"), col("term"), col("df"))
      .distinct() // a (input, term) pair can meet in many variants
      .withColumn("dist", levenshtein(col("term"), col("input_term")))
      .filter(col("dist") <= maxDist)
    val w = Window.partitionBy("input_term")
    cand
      .withColumn("min_dist", min(col("dist")).over(w))
      .filter(col("min_dist") > 0) // suggest_mode=missing
      .withColumn("rank", row_number().over(
        w.orderBy(col("dist").asc, col("df").desc, col("term").asc))
        .cast("long"))
      .filter(col("rank") <= topN)
      .select(col("input_term"), col("term").as("suggestion"),
        col("dist").cast("long").as("dist"), col("df"), col("rank"))
      .orderBy(col("input_term"), col("rank"))
  }
}
