package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Curation

/** Curation layer: decontamination, PII scrubbing, repetition quality,
  * stratified sampling, sequence packing. Every operator is checked
  * against a driver-side brute force on a planted corpus; packing is
  * additionally checked invariant to parallelism (the property that makes
  * packed pretraining data reproducible across cluster sizes). */
class CurationSpec extends SparkSpec {

  /** Planted corpus: source "bench" docs, one train doc copied verbatim
    * from bench (full contamination), one half-contaminated, short docs,
    * a repetitive doc. */
  lazy val docs: DataFrame = {
    import spark.implicits._
    val bench = Seq(
      (0L, "alpha beta gamma delta epsilon zeta", "en", "bench"),
      (1L, "one two three four five six seven", "de", "bench"))
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon zeta", "en", "web"), // exact copy
      (11L, "alpha beta gamma delta unrelated words here now", "fr", "web"),
      (12L, "totally fresh text nothing shared at all", "en", "web"),
      (13L, "xx yy", "zh", "web"), // < 3 words: zero grams
      (14L, "rep rep rep rep rep tail", "en", "web"),
      (15L, "", "es", "web"))
    (bench ++ train).toDF("doc_id", "text", "lang", "source")
  }

  private def gramsOf(text: String, n: Int): Seq[String] = {
    val ws = text.split(" ", -1)
    if (ws.length < n) Seq.empty
    else (0 to ws.length - n).map(i => ws.slice(i, i + n).mkString(" "))
  }

  test("decontaminate matches brute-force n-gram overlap") {
    val got = Curation.decontaminate(docs, "bench", 3, 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    val benchSet = Seq(0L, 1L).flatMap(i =>
      gramsOf(docs.filter(col("doc_id") === i).head().getString(1), 3)).toSet
    val train = docs.filter(col("source") =!= "bench")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.keySet == train.map(_._1).toSet)
    train.foreach { case (id, text) =>
      val g = gramsOf(text, 3).distinct
      val hits = g.count(benchSet.contains)
      val overlap =
        if (g.isEmpty) 0.0
        else BigDecimal(hits.toDouble / g.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (nG, nH, ov, flag) = got(id)
      assert(nG == g.size && nH == hits, s"doc $id gram counts")
      assert(math.abs(ov - overlap) < 1e-9, s"doc $id overlap $ov vs $overlap")
      assert(flag == (ov >= 0.5), s"doc $id flag")
    }
    // the verbatim copy is fully contaminated; the fresh doc is clean
    assert(got(10L)._3 == 1.0 && got(10L)._4)
    assert(got(12L)._2 == 0L && !got(12L)._4)
    assert(got(13L)._1 == 0L && got(13L)._3 == 0.0)
  }

  test("piiScrub counts and redacts emails/IPv4s") {
    import spark.implicits._
    val t = Seq(
      (1L, "mail a.b+c@host-x.org and 10.0.255.7 plus root@a.io end"),
      (2L, "no pii here at all"),
      (3L, "ip 1.2.3.4 twice 5.6.7.8"))
      .toDF("doc_id", "text")
    val got = Curation.piiScrub(t).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(4)))).toMap
    assert(got(1L)._1 == 2 && got(1L)._2 == 1)
    assert(got(2L)._1 == 0 && got(2L)._2 == 0)
    assert(got(3L)._1 == 0 && got(3L)._2 == 2)
    def sha(s: String): String = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L)._3 == sha("mail <EMAIL> and <IP> plus <EMAIL> end"))
    assert(got(3L)._3 == sha("ip <IP> twice <IP>"))
  }

  test("secretScan counts and redacts AWS keys / GitHub tokens") {
    import spark.implicits._
    val aws = "AKIA" + "ABCDEF0123456789"          // 16 [0-9A-Z]
    val gh = "ghp_" + "a1B2" * 9                   // 36 word chars
    val t = Seq(
      (1L, s"key $aws in config plus token $gh end"),
      (2L, "no secrets here"),
      (3L, s"two keys $aws and ${aws.dropRight(1)}Z tail"),
      (4L, "near miss AKIAshort and ghp_tooshort"))
      .toDF("doc_id", "text")
    val got = Curation.secretScan(t).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(4)))).toMap
    assert(got(1L)._1 == 1 && got(1L)._2 == 1)
    assert(got(2L)._1 == 0 && got(2L)._2 == 0)
    assert(got(3L)._1 == 2 && got(3L)._2 == 0)
    assert(got(4L)._1 == 0 && got(4L)._2 == 0)
    def sha(s: String): String = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L)._3 ==
      sha("key <AWS_KEY> in config plus token <GH_TOKEN> end"))
  }

  test("repetitionStats matches brute-force bigram counts") {
    val got = Curation.repetitionStats(docs, 2, 0.2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    docs.select("doc_id", "text").collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val g = gramsOf(text, 2)
      val counts = g.groupBy(identity).view.mapValues(_.size).toMap
      val top = if (counts.isEmpty) 0L else counts.values.max.toLong
      val dup = counts.values.filter(_ >= 2).sum.toLong
      val ratio =
        if (g.isEmpty) 0.0
        else BigDecimal(dup.toDouble / g.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (nG, tc, dr, keep) = got(id)
      assert(nG == g.size.toLong && tc == top, s"doc $id")
      assert(math.abs(dr - ratio) < 1e-9, s"doc $id ratio")
      assert(keep == (dr <= 0.2), s"doc $id keep")
    }
    assert(!got(14L)._4, "the repetitive doc must be dropped")
  }

  test("stratifiedSample keeps exactly the md5-bucket rows") {
    val rates = Seq("en" -> 50, "de" -> 100, "fr" -> 25)
    val got = Curation.stratifiedSample(docs, rates, 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(6), 16) % 100
    }
    val want = docs.select("doc_id", "lang").collect().flatMap { r =>
      val (id, lang) = (r.getLong(0), r.getString(1))
      val rate = rates.toMap.getOrElse(lang, 10)
      val b = bucket(id)
      if (b < rate) Some((id, lang, b)) else None
    }.toSet
    assert(got == want)
    // determinism: a second run returns the identical set
    val again = Curation.stratifiedSample(docs, rates, 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(again == got)
  }

  test("packSequences == sequential brute force, invariant to parallelism") {
    import spark.implicits._
    val rng = new java.util.SplittableRandom(11)
    val big = (0L until 300L).map { i =>
      (i, Array.fill(1 + rng.nextInt(40))("tok" + rng.nextInt(9)).mkString(" "))
    }.toDF("doc_id", "text")
    val l = 32
    def run(parts: Int): Seq[(Long, Long, Long, Long)] =
      Curation.packSequences(spark, big, l, parts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
    val got = run(3)
    assert(run(11) == got, "spans must not depend on partitioning")

    // brute force: walk docs in id order, cut every l tokens
    val dls = big.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).count(_.length >= 2).toLong))
      .filter(_._2 > 0).sortBy(_._1)
    var off = 0L
    val want = dls.flatMap { case (id, n) =>
      val o = off; off += n
      (o / l to (o + n - 1) / l).map { s =>
        (s, id, math.max(0L, s * l - o), math.min(n, (s + 1) * l - o) - math.max(0L, s * l - o))
      }
    }.sorted.toSeq
    assert(got == want)
    // every sequence except the last is exactly full
    val bySeq = got.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (s, tot) =>
      if (s != lastSeq) assert(tot == l, s"seq $s holds $tot tokens") }
  }

  test("linearQuality matches a brute-force mean of weights; missing terms score 0") {
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // a PARTIAL vocabulary: only terms starting with a..m carry weight
    val vocab = rows.flatMap(_._2.split(" ")).filter(_.length >= 2)
      .distinct.filter(_.head <= 'm')
    val w = Curation.hashWeights(vocab.toSeq)
    val got = Curation.linearQuality(docs, w, bias = 0.125)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    rows.foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.length >= 2)
      val mean = if (toks.isEmpty) 0.0
        else toks.map(t => w.getOrElse(t, 0.0)).sum / toks.length
      val score = math.floor((0.125 + mean) * 1e6 + 0.5) / 1e6
      assert(got(id)._1 == score, s"doc $id")
      assert(got(id)._2 == (got(id)._1 > 0.0), s"keep flag doc $id")
    }
    // the zero-token doc scores exactly the bias
    assert(got(15L)._1 == 0.125)
  }

  test("lmPerplexity matches a brute-force JM-smoothed unigram LM") {
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val stream = rows.flatMap(_._2.split(" ")).filter(_.length >= 2)
    val cf = stream.groupBy(identity).view.mapValues(_.length.toDouble).toMap
    val total = stream.length.toDouble
    val v = cf.size.toDouble
    val lambda = 0.75
    val got = Curation.lmPerplexity(docs, lambda, keepBelow = 12.0)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    rows.foreach { case (id, text) =>
      val ts = text.split(" ").filter(_.length >= 2)
      val want =
        if (ts.isEmpty) 1.0
        else {
          val s = ts.map(t => -math.log(lambda * cf(t) / total + (1 - lambda) / v)).sum
          math.exp(s / ts.length)
        }
      assert(math.abs(got(id)._1 - want) < 1e-5, s"doc $id: ${got(id)._1} vs $want")
      assert(got(id)._2 == (got(id)._1 <= 12.0), s"keep flag doc $id")
    }
    // the repetitive doc is LOW perplexity (fluent under its own LM);
    // the empty doc scores exactly 1
    assert(got(15L)._1 == 1.0)
    assert(got(14L)._1 < got(12L)._1,
      "repetitive text must be less perplexing than all-fresh text")
  }

  test("hashedQuality (inline codegen weights) == linearQuality(hashWeights(vocab))") {
    val vocab = docs.select("text").collect().flatMap(_.getString(0).split(" "))
      .filter(_.length >= 2).distinct.toSeq
    val a = Curation.hashedQuality(docs).orderBy("doc_id").collect().toSeq
    val b = Curation.linearQuality(docs, Curation.hashWeights(vocab))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    // weights live on the 2^-10 grid: every weight times 1024 is integral
    vocab.foreach { t =>
      val w = Curation.hashWeight(t) * 1024.0
      assert(w == math.rint(w) && math.abs(w) <= 1000.0, s"$t -> $w")
    }
  }

  test("dsirWeights matches brute-force importance weights; target excluded") {
    val buckets = 16
    val rows = docs.collect().map(r =>
      (r.getLong(0), Option(r.getString(1)).getOrElse(""), r.getString(3)))
    def toks(t: String) = t.split(" ").filter(_.length >= 2)
    // train the two feature LMs exactly as the engine does
    val tgtCnt = new Array[Long](buckets)
    val rawCnt = new Array[Long](buckets)
    rows.foreach { case (_, text, src) =>
      val arr = if (src == "bench") tgtCnt else rawCnt
      toks(text).foreach(t => arr(Curation.dsirBucket(t, buckets)) += 1L)
    }
    val tt = tgtCnt.sum.toDouble + buckets
    val tr = rawCnt.sum.toDouble + buckets
    val lam = Array.tabulate(buckets)(b =>
      math.log((tgtCnt(b) + 1.0) / tt) - math.log((rawCnt(b) + 1.0) / tr))
    def weightOf(text: String): (Long, Double) = {
      val cnt = new Array[Long](buckets)
      toks(text).foreach(t => cnt(Curation.dsirBucket(t, buckets)) += 1L)
      var s = 0.0; var n = 0L
      (0 until buckets).foreach { b =>
        if (cnt(b) > 0) { s += cnt(b) * lam(b); n += cnt(b) }
      }
      (n, math.floor(s * 1e6 + 0.5) / 1e6)
    }
    val got = Curation.dsirWeights(docs, "bench", buckets, 0.0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    val rawRows = rows.filter(_._3 != "bench")
    assert(got.keySet == rawRows.map(_._1).toSet) // target docs excluded
    rawRows.foreach { case (id, text, _) =>
      val (n, w) = weightOf(text)
      assert(got(id) == ((n, w, w > 0.0)), s"doc $id: ${got(id)} vs ($n,$w)")
    }
    // the exact-copy doc (10L) must look MORE like the target than the
    // fresh doc (12L) — the selection signal the operator exists for
    assert(got(10L)._2 > got(12L)._2)
    // the empty doc carries no features: weight exactly 0, dropped at tau 0
    assert(got(15L) == ((0L, 0.0, false)))
  }

  test("epochShuffle: seeded md5 permutation, dense per-shard positions") {
    import graft.pipeline.PortableHash
    val got = Curation.epochShuffle(docs, 7L, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every doc appears exactly once
    assert(got.map(_._1).sorted.toSeq ==
      docs.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // shard = md5("7:doc_id") 15-hex prefix mod 3; order within a shard
    // follows (hash, doc_id); positions are dense from 0
    val hOf = got.map { case (d, _, _) =>
      d -> PortableHash.md5HexPrefixLong(s"7:$d", 15) }.toMap
    got.foreach { case (d, sh, _) => assert(sh == hOf(d) % 3, s"doc $d") }
    got.groupBy(_._2).foreach { case (_, rows) =>
      val byPos = rows.sortBy(_._3)
      assert(byPos.map(_._3).toSeq == byPos.indices.map(_.toLong))
      assert(byPos.map(r => (hOf(r._1), r._1)).toSeq ==
        byPos.map(r => (hOf(r._1), r._1)).sortBy(identity).toSeq)
    }
    // deterministic: same seed reproduces; another seed permutes
    val again = Curation.epochShuffle(docs, 7L, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.sorted.toSeq == again.sorted.toSeq)
    val other = Curation.epochShuffle(docs, 8L, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.sorted.toSeq != other.sorted.toSeq)
    // invariant to input parallelism (the reproducible-epoch property)
    val repart = Curation.epochShuffle(docs.repartition(7), 7L, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.sorted.toSeq == repart.sorted.toSeq)
    intercept[IllegalArgumentException](Curation.epochShuffle(docs, 7L, 0))
  }

  test("groupSplit: whole repos land on one side; both sides non-empty") {
    import org.apache.spark.sql.functions.col
    val docs = graft.api.DocsIndex.documents(spark, "/root/testdata/sf0.001")
    val rows = Curation.groupSplit(docs, 50).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.length == docs.count())
    // group invariance: a source maps to exactly one split
    rows.groupBy(_._2).foreach { case (src, xs) =>
      assert(xs.map(_._3).distinct.length == 1, s"source $src split")
    }
    // brute-force the bucket rule per source
    rows.groupBy(_._2).foreach { case (src, xs) =>
      val b = graft.pipeline.PortableHash.md5HexPrefixLong(src, 6) % 100
      val want = if (b < 50) "train" else "eval"
      assert(xs.head._3 == want, s"source $src bucket $b")
    }
    val sides = rows.map(_._3).distinct.sorted
    assert(sides.sameElements(Array("eval", "train")),
      "the 50/50 fixture must populate both sides")
    // deterministic: corpus growth cannot move a repo (recompute on a
    // filtered corpus, same sides)
    val sub = Curation.groupSplit(docs.filter(col("doc_id") % 2 === 0), 50)
      .collect().map(r => (r.getString(1), r.getString(2)))
    val full = rows.map(x => (x._2, x._3)).toMap
    sub.foreach { case (src, sp) => assert(full(src) == sp) }
    intercept[IllegalArgumentException] { Curation.groupSplit(docs, 0) }
    intercept[IllegalArgumentException] { Curation.groupSplit(docs, 100) }
  }

  test("weighted sample == brute-force A-ES keys; zero weights excluded; " +
    "parallelism-invariant") {
    import spark.implicits._
    val d = (1L to 200L).map(i => (i, "x", if (i % 7 == 0L) 0L else i % 40 + 1))
      .toDF("doc_id", "text", "n_chars")
    def brute(n: Int): Seq[(Long, Long, Double)] =
      (1L to 200L).flatMap { i =>
        val w = if (i % 7 == 0L) 0L else i % 40 + 1
        if (w < 1) None
        else {
          val h = graft.pipeline.PortableHash
            .md5HexPrefixLong(s"wrs:$i", 15).toDouble
          val u = (h + 1.0) / 1152921504606846976.0
          Some((i, w, math.floor(math.log(u) / w * 1e6 + 0.5) / 1e6))
        }
      }.sortBy { case (id, _, k) => (-k, id) }.take(n)
    for (parts <- Seq(1, 8)) {
      val got = Curation.weightedSample(
          d.repartition(parts), 25, "wrs")
        .as[(Long, Long, Double)].collect().toSeq
      assert(got == brute(25), s"parts=$parts")
    }
    // every multiple of 7 has weight 0 and must be absent from ANY n
    val all = Curation.weightedSample(d, 200, "wrs")
      .as[(Long, Long, Double)].collect()
    assert(all.length == 200 - 200 / 7)
    assert(all.forall(_._1 % 7 != 0L))
  }

  test("llr collocations: Dunning G² vs brute force; zero cells " +
    "contribute zero; independence scores ~0") {
    import spark.implicits._
    val d = Seq(
      (1L, "aa bb aa bb cc"),
      (2L, "aa bb aa bb"),
      (3L, "cc dd cc dd cc dd"))
      .toDF("doc_id", "text")
    val pairs = d.collect().flatMap { r =>
      val ts = r.getString(1).split(" ")
      for {
        i <- ts.indices
        j <- (i + 1) until math.min(i + 3, ts.length)
      } yield (ts(i), ts(j))
    }
    val cnt = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val nTot = cnt.values.sum
    val row = cnt.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val col0 = cnt.groupBy(_._1._2).map { case (b, m) => b -> m.values.sum }
    def term(k: Long, r: Long, c: Long): Double =
      if (k > 0) k.toDouble * math.log(k.toDouble * nTot.toDouble /
        (r.toDouble * c.toDouble)) else 0.0
    val want = cnt.filter(_._2 >= 2L).map { case ((a, b), n) =>
      val (r, c) = (row(a), col0(b))
      val g2 = 2.0 * (term(n, r, c) + term(r - n, r, nTot - c)
        + term(c - n, nTot - r, c) + term(nTot - r - c + n, nTot - r, nTot - c))
      (a, b, n, math.floor(g2 * 1e6 + 0.5) / 1e6)
    }.toSet
    val got = Curation.llrCollocations(spark, d, 2, 2L)
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == want, s"got $got want $want")
    // G² is a significance score: genuinely associated pairs exceed 0
    assert(got.exists(_._4 > 1.0))
  }

  test("ppmi collocations: formula vs brute force on the window-2 pair " +
    "table, clamp at 0, marginals unfloored") {
    import spark.implicits._
    val d = Seq(
      (1L, "aa bb aa bb cc"),
      (2L, "aa bb aa bb"),
      (3L, "cc dd cc dd cc dd"))
      .toDF("doc_id", "text")
    // brute: ordered pairs at distance 1..2, tokenizer ≡ whitespace here
    val pairs = d.collect().flatMap { r =>
      val ts = r.getString(1).split(" ")
      for {
        i <- ts.indices
        j <- (i + 1) until math.min(i + 3, ts.length)
      } yield (ts(i), ts(j))
    }
    val cnt = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = cnt.values.sum.toDouble
    val row = cnt.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum.toDouble }
    val col0 = cnt.groupBy(_._1._2).map { case (b, m) => b -> m.values.sum.toDouble }
    val want = cnt.filter(_._2 >= 2L).map { case ((a, b), c) =>
      val pmi = math.log(c.toDouble * n / (row(a) * col0(b)))
      (a, b, c, math.floor(math.max(pmi, 0.0) * 1e6 + 0.5) / 1e6)
    }.toSet
    val got = Curation.ppmiCollocations(spark, d, 2, 2L)
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == want, s"got $got want $want")
    // chance-level pairs clamp to 0, genuinely associated pairs exceed it
    assert(got.forall(_._4 >= 0.0))
    assert(got.exists(_._4 > 0.0))
  }
}
