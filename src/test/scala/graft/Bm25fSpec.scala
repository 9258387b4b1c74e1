package graft

import graft.search.Bm25f

/** BM25F vs a plain-Scala brute force of the Robertson CIKM'04
  * formulation on a planted two-field corpus, plus the two laws that
  * distinguish BM25F from naive mixes: single-field BM25F degenerates
  * to plain BM25, and merged-then-saturated scoring differs from the
  * per-field-score sum on a crafted tie case. The DuckDB twin
  * (ft_bm25f) pins cross-engine equality on the driver testdata. */
class Bm25fSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "fast merge sort algorithm details", "core"),
    (2L, "fast fast fast loops", "core"),
    (3L, "merge policy for segments", "fast"),     // query term in TITLE
    (4L, "slow bubble sort", "misc"),
    (5L, "fast merge", "fast"),                    // both fields hit
    (6L, "", "core"))

  private def df = corpus.toDF("doc_id", "text", "source")

  /** Brute force with the exact expression shape of the operator. */
  private def brute(fields: Seq[(String, Long)], terms: Seq[String], k: Int)
      : Seq[(Long, Double)] = {
    def toks(s: String) = s.split(" ").filter(_.length >= 2)
    val fieldIdx = Map("text" -> 1, "source" -> 2)
    val tf = scala.collection.mutable.HashMap.empty[(Long, String), Long]
    val dl = scala.collection.mutable.HashMap.empty[Long, Long]
    corpus.foreach { case (id, text, source) =>
      fields.foreach { case (f, w) =>
        val v = if (fieldIdx(f) == 1) text else source
        toks(v).foreach { t =>
          tf((id, t)) = tf.getOrElse((id, t), 0L) + w
          dl(id) = dl.getOrElse(id, 0L) + w
        }
      }
    }
    val n = corpus.size.toLong
    val avgdl = corpus.map(c => dl.getOrElse(c._1, 0L)).sum * 1.0 / n
    val dfm = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val scores = corpus.flatMap { case (id, _, _) =>
      val s = terms.distinct.flatMap { t =>
        tf.get((id, t)).map { f =>
          val d = dfm(t)
          math.log(1.0 + (n - d + 0.5) / (d + 0.5)) * f * 2.2 /
            (f + 1.2 * (0.25 + 0.75 * dl.getOrElse(id, 0L) / avgdl))
        }
      }
      if (s.isEmpty) None
      else Some(id -> BigDecimal(s.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    scores.sortBy { case (id, sc) => (-sc, id) }.take(k)
  }

  test("rankedHits == brute force on the two-field corpus") {
    val fields = Seq(("text", 1L), ("source", 3L))
    val got = Bm25f.rankedHits(df, fields, Seq("fast", "merge"), 10)
      .as[(Long, Double, Int)].collect().toSeq
    val want = brute(fields, Seq("fast", "merge"), 10)
    assert(got.map(_._1) == want.map(_._1), s"got $got want $want")
    got.zip(want).foreach { case ((_, gs, _), (_, ws)) =>
      assert(math.abs(gs - ws) < 2e-6, s"$gs vs $ws")
    }
    assert(got.map(_._3) == (1 to got.size), "ranks must be dense")
    // doc 3 (title-only hit, weight 3) must outrank doc 4 (no hit: absent)
    assert(got.exists(_._1 == 3L))
    assert(!got.exists(_._1 == 4L))
  }

  test("single unit-weight field degenerates to plain BM25 on that field") {
    val one = Bm25f.rankedHits(df, Seq(("text", 1L)), Seq("fast", "merge"), 10)
      .as[(Long, Double, Int)].collect().toSeq
    val want = brute(Seq(("text", 1L)), Seq("fast", "merge"), 10)
    assert(one.map(_._1) == want.map(_._1))
  }

  test("saturation AFTER the field merge: tf̃ = 4 scores sub-linearly") {
    // doc 5 hits 'fast' in both fields: tf̃ = 1·1 + 3·1 = 4. Under
    // merged-then-saturated scoring its contribution must be strictly
    // below 4× the tf̃ = 1 contribution at the same dl̃ — the linear
    // extrapolation a per-field score sum would produce.
    val fields = Seq(("text", 1L), ("source", 3L))
    val got = Bm25f.rankedHits(df, fields, Seq("fast"), 10)
      .as[(Long, Double, Int)].collect()
      .map(r => r._1 -> r._2).toMap
    // recompute doc 5's stats in plain scala: dl̃ = dl_text + 3·dl_src
    val dls = Map(1L -> 8L, 2L -> 7L, 3L -> 7L, 4L -> 6L, 5L -> 5L, 6L -> 3L)
    val avgdl = dls.values.sum * 1.0 / 6
    val dfFast = 4L // docs 1, 2, 5 (body) + doc 3 (title field)
    val idf = math.log(1.0 + (6 - dfFast + 0.5) / (dfFast + 0.5))
    def contrib(tf: Long, dl: Long): Double =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert(math.abs(got(5L) - BigDecimal(contrib(4L, 5L))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6)
    assert(got(5L) < 4.0 * contrib(1L, 5L) - 1e-9,
      s"tf̃=4 must saturate below 4x the tf̃=1 score: ${got(5L)}")
  }

  test("bm25+ == plain BM25 + idf·δ per matched term (the lift law)") {
    val terms = Seq("fast", "merge")
    val plain = Bm25f.rankedHits(df, Seq(("text", 1L)), terms, 10)
      .as[(Long, Double, Int)].collect().map(r => r._1 -> r._2).toMap
    val plus = Bm25f.bm25PlusHits(df, "text", terms, 1.0, 10)
      .as[(Long, Double, Int)].collect().map(r => r._1 -> r._2).toMap
    assert(plus.keySet == plain.keySet, "same match set")
    // text-only stats for idf: n=6 docs; df(fast)=3 (docs 1,2,5),
    // df(merge)=3 (docs 1,3,5)
    val idf = math.log(1.0 + (6 - 3 + 0.5) / (3 + 0.5))
    val matched = Map(1L -> 2, 2L -> 1, 3L -> 1, 5L -> 2)
    plus.foreach { case (id, s) =>
      assert(math.abs(s - (plain(id) + matched(id) * idf)) < 3e-6,
        s"doc $id: $s vs ${plain(id)} + ${matched(id)}·idf")
    }
  }
}
