package graft

import org.apache.spark.sql.functions._

import graft.search.SymSpell

/** SymSpell: delete-set enumeration vs brute force, candidate
  * COMPLETENESS (index-join output == the dictionary-scan brute force
  * at the same parameters — the algorithm's theorem as an invariant),
  * and the missing-mode / ranking contract shared with termSuggest.
  * The DuckDB twin (ft_symspell) pins the same equivalence
  * cross-engine on the driver testdata. */
class SymSpellSpec extends SparkSpec {
  import spark.implicits._

  test("deletes(s, d) == exhaustive deletion closure") {
    def bruteOnce(xs: Set[String]): Set[String] =
      xs.flatMap(x => (0 until x.length).map(j =>
        x.substring(0, j) + x.substring(j + 1)))
    for (s <- Seq("", "a", "ab", "abc", "abca", "query"); d <- 1 to 2) {
      var want = Set(s)
      var cur = Set(s)
      for (_ <- 1 to d) { cur = bruteOnce(cur); want ++= cur }
      assert(SymSpell.deletes(s, d) == want, s"s=$s d=$d")
    }
    // sizes: |D1("abcd")| = 1 + 4 distinct deletes
    assert(SymSpell.deletes("abcd", 1).size == 5)
  }

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val sub = dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
      dp(i)(j) = math.min(sub, math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1))
    }
    dp(a.length)(b.length)
  }

  private val dict = Seq(
    ("query", 40L), ("queue", 30L), ("sort", 25L), ("sorts", 25L),
    ("short", 20L), ("scan", 18L), ("span", 18L), ("spark", 15L),
    ("store", 12L), ("snort", 2L), ("qq", 1L))

  test("suggest == dictionary-scan brute force (completeness), " +
    "missing mode drops exact hits, ranking pinned") {
    val idx = SymSpell.buildIndex(dict.toDF("term", "df"), 2)
    for (d <- 1 to 2) {
      val probes = Seq("qery", "osrt", "scan", "snok", "zzzzz")
      val got = SymSpell.suggest(idx, probes, d, 5)
        .as[(String, String, Long, Long, Long)].collect().toSeq
      // brute force with the exact same contract
      val want = probes.distinct.flatMap { in =>
        val cands = dict.map { case (t, df) => (t, df, lev(t, in).toLong) }
          .filter(_._3 <= d)
        if (cands.isEmpty || cands.exists(_._3 == 0L)) Nil
        else cands.sortBy { case (t, df, dist) => (dist, -df, t) }
          .take(5).zipWithIndex
          .map { case ((t, df, dist), i) => (in, t, dist, df, i + 1L) }
      }.sortBy(r => (r._1, r._5))
      assert(got == want, s"d=$d:\n got $got\nwant $want")
    }
  }

  test("candidate pruning: the index join touches fewer candidates " +
    "than the dictionary for a short probe") {
    val idx = SymSpell.buildIndex(dict.toDF("term", "df"), 1)
    val probeVariants = SymSpell.deletes("qq", 1)
    val touched = idx.filter(col("variant")
        .isin(probeVariants.toSeq: _*))
      .select("term").distinct().count()
    assert(touched < dict.size, s"touched $touched of ${dict.size}")
  }
}
