package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.search.BoolQuery
import graft.tokenize.Tokenizer

/** Percolation — reverse search (the Elasticsearch percolator / Lucene
  * MemoryIndex pattern): stored queries, streamed documents; for each
  * incoming document, which stored queries match it. The alerting /
  * saved-search primitive: at index time a doc is matched against every
  * subscription instead of a query being matched against every doc.
  *
  * Semantics are pinned to the index engine's: a stored query matches a
  * document iff the document would be in that query's match set had it
  * been indexed (same tokenizer, same position space, same kind rules —
  * PercolatorSpec proves set equality against Searcher.hits per kind).
  *
  * Scale posture: queries compile ONCE driver-side and broadcast; the
  * document side is a single NARROW mapPartitions (tokenize once per doc,
  * positions map reused across all queries) — zero shuffles, stream-safe
  * (usable inside foreachBatch / mapPartitions of a streaming Dataset).
  * Each query carries a cheap required-term prescreen (AND-family: every
  * fixed term; OR-family: any) so non-candidate queries cost a hash
  * probe, not an AST walk. Q stored queries cost O(Q) probes per doc —
  * the Elastic regime (10³–10⁵ subscriptions), far below doc tokenize
  * cost for realistic Q.
  */
object Percolator {

  /** One compiled stored query. `req`/`any`: the presence prescreen —
    * all of `req` AND (any of `any` if non-empty) must be present for
    * the full evaluation to run (a sound OVER-approximation of the
    * match condition for every supported kind). */
  final case class Compiled(qid: String, kind: String,
                            eval: Map[String, Array[Int]] => Boolean,
                            req: Array[String], any: Array[String])
    extends Serializable

  /** PHRASE: ∃p: p+i ∈ pos(term_i) for each slot i (duplicates keep
    * their own slot — the codec-v2 staircase). */
  private def phraseAt(ts: List[String], pos: Map[String, Array[Int]]): Boolean = {
    val lists = ts.map(t => pos.getOrElse(t, Array.empty[Int]))
    if (lists.exists(_.isEmpty)) return false
    var cand = lists.head
    var i = 1
    for (ps <- lists.tail) {
      val out = scala.collection.mutable.ArrayBuilder.make[Int]
      var a = 0; var b = 0
      while (a < cand.length && b < ps.length) {
        val want = cand(a) + i
        if (ps(b) == want) { out += cand(a); a += 1; b += 1 }
        else if (ps(b) < want) b += 1
        else a += 1
      }
      cand = out.result()
      if (cand.isEmpty) return false
      i += 1
    }
    cand.nonEmpty
  }

  /** NEAR/w: minimal max−min over one pick per DISTINCT term ≤ w (the
    * k-pointer sweep — Wand.minSpan semantics). */
  private def nearAt(ts: List[String], w: Int, pos: Map[String, Array[Int]]): Boolean = {
    val lists = ts.distinct.map(t => pos.getOrElse(t, Array.empty[Int])).toArray
    if (lists.exists(_.isEmpty)) return false
    val idx = new Array[Int](lists.length)
    var best = Int.MaxValue
    var exhausted = false
    while (!exhausted && best > w) {
      var mn = Int.MaxValue; var mx = Int.MinValue; var mnList = -1
      var i = 0
      while (i < lists.length) {
        val v = lists(i)(idx(i))
        if (v < mn) { mn = v; mnList = i }
        if (v > mx) mx = v
        i += 1
      }
      if (mx - mn < best) best = mx - mn
      idx(mnList) += 1
      if (idx(mnList) >= lists(mnList).length) exhausted = true
    }
    best <= w
  }

  /** ONEAR (`a BEFORE/w b`): minimal (last − first) over strictly
    * increasing picks in query order ≤ w (Wand.orderedSpan semantics). */
  private def orderedAt(ts: List[String], w: Int,
                        pos: Map[String, Array[Int]]): Boolean = {
    val lists = ts.map(t => pos.getOrElse(t, Array.empty[Int])).toArray
    if (lists.exists(_.isEmpty)) return false
    if (lists.length == 1) return true
    val idx = new Array[Int](lists.length)
    var s = 0
    while (s < lists(0).length) {
      var prev = lists(0)(s)
      var i = 1
      var ok = true
      while (i < lists.length && ok) {
        while (idx(i) < lists(i).length && lists(i)(idx(i)) <= prev) idx(i) += 1
        if (idx(i) >= lists(i).length) ok = false
        else prev = lists(i)(idx(i))
        i += 1
      }
      if (!ok) return false
      if (prev - lists(0)(s) <= w) return true
      s += 1
    }
    false
  }

  private def evalBool(e: BoolQuery.Expr, pos: Map[String, Array[Int]]): Boolean =
    e match {
      case BoolQuery.Term(t) => pos.contains(t)
      case BoolQuery.Phrase(ts) => phraseAt(ts, pos)
      case BoolQuery.Near(ts, w) =>
        if (w < 0) orderedAt(ts, -w, pos) else nearAt(ts, w, pos)
      case BoolQuery.Pattern(raw, isRegex) =>
        if (isRegex) {
          val re = java.util.regex.Pattern.compile(raw)
          pos.keysIterator.exists(t => re.matcher(t).matches())
        } else pos.keysIterator.exists(_.startsWith(raw))
      case BoolQuery.Boost(c, _) => evalBool(c, pos) // boosts never affect matching
      case BoolQuery.And(cs) => cs.forall(evalBool(_, pos))
      case BoolQuery.Or(cs) => cs.exists(evalBool(_, pos))
      case BoolQuery.Not(c) => !evalBool(c, pos)
    }

  /** Compile one stored query. Kinds: FREE/OR (any term), AND (all),
    * PHRASE, NEAR, PREFIX, REGEX, BOOL (full grammar incl. positional
    * and pattern atoms; pure-negative rejected — same guard as the
    * index path). */
  def compile(qid: String, kind: String, text: String): Compiled = kind match {
    case "FREE" | "OR" =>
      val ts = graft.search.QueryParser.termsFor(kind, text)
      Compiled(qid, kind, pos => ts.exists(pos.contains),
        Array.empty, ts)
    case "AND" =>
      val ts = graft.search.QueryParser.termsFor(kind, text)
      Compiled(qid, kind, pos => ts.forall(pos.contains), ts.distinct, Array.empty)
    case "PHRASE" =>
      val ts = graft.search.QueryParser.termsFor(kind, text).toList
      Compiled(qid, kind, pos => phraseAt(ts, pos), ts.distinct.toArray, Array.empty)
    case "NEAR" =>
      val ts = graft.search.QueryParser.termsFor(kind, text).toList
      val w = graft.search.QueryParser.nearWindow(text)
      Compiled(qid, kind, pos => nearAt(ts, w, pos), ts.distinct.toArray, Array.empty)
    case "ONEAR" =>
      val ts = graft.search.QueryParser.termsFor(kind, text).toList
      val w = graft.search.QueryParser.orderedWindow(text)
      Compiled(qid, kind, pos => orderedAt(ts, w, pos), ts.toArray, Array.empty)
    case "PREFIX" =>
      val p = graft.search.QueryParser.termsFor(kind, text).head
      Compiled(qid, kind, pos => pos.keysIterator.exists(_.startsWith(p)),
        Array.empty, Array.empty)
    case "REGEX" | "WILD" => // WILD's termsFor already ran globToRegex
      val raw = graft.search.QueryParser.termsFor(kind, text).head
      val re = java.util.regex.Pattern.compile(raw)
      Compiled(qid, kind, pos => pos.keysIterator.exists(t => re.matcher(t).matches()),
        Array.empty, Array.empty)
    case "FUZZY" =>
      val w = graft.search.QueryParser.termsFor(kind, text).head
      val d = graft.search.QueryParser.fuzzyDist(text)
      // empty operand matches NOTHING — the same reading as the index
      // tiers' empty expansion (editDistance("", t) <= d would otherwise
      // fire on every short-term document)
      val p: Map[String, Array[Int]] => Boolean =
        if (w.isEmpty) _ => false
        else pos => pos.keysIterator.exists(t =>
          math.abs(t.length - w.length) <= d &&
            graft.search.Searcher.editDistance(t, w, d) <= d)
      Compiled(qid, kind, p, Array.empty, Array.empty)
    case "STEM" =>
      val w = graft.search.QueryParser.termsFor(kind, text).head
      // empty operand matches NOTHING, the FUZZY reading: sStem("")
      // equals "" which every empty check would otherwise pass
      val p: Map[String, Array[Int]] => Boolean =
        if (w.isEmpty) _ => false
        else {
          val target = graft.search.Stem.sStem(w)
          pos => pos.keysIterator.exists(t =>
            graft.search.Stem.sStem(t) == target)
        }
      Compiled(qid, kind, p, Array.empty, Array.empty)
    case "BOOL" =>
      // NOTE: pure-negative boolean queries — rejected by the index walk
      // (corpus-sized complement) — are fine here: percolation evaluates
      // per document, so NOT costs a hash probe, not a complement scan.
      val ast = BoolQuery.parse(text)
      Compiled(qid, kind, pos => evalBool(ast, pos), Array.empty, Array.empty)
    case other => throw new IllegalArgumentException(s"unsupported kind $other")
  }

  /** Java-serialized size of a compiled set — the broadcast payload
    * measure ([[percolate]]'s residency gate; also what the spec
    * asserts for the 10k-saved-searches case). */
  private[graft] def serializedSize(qs: Array[Compiled]): Long = {
    val bo = new java.io.ByteArrayOutputStream()
    val oo = new java.io.ObjectOutputStream(bo)
    oo.writeObject(qs); oo.close()
    bo.size().toLong
  }

  /** Match every (doc_id, text) row against every compiled query; one
    * output row per (doc_id, query_id) match.
    *
    * The broadcast-residency claim is ASSERTED, not assumed: the
    * compiled set's serialized size is measured driver-side and the
    * call fails loudly past `maxBroadcastBytes` (default 64 MB —
    * thousands of bytes per compiled query means the Elastic-regime
    * 10⁴–10⁵ subscriptions fit with an order of magnitude to spare;
    * PercolatorSpec pins the 10k case). A set past the cap needs the
    * OTHER architecture (queries as a table, term-keyed candidate
    * join), not a silent giant broadcast. */
  def percolate(spark: SparkSession, docs: DataFrame,
                queries: Seq[Compiled],
                maxBroadcastBytes: Long = 64L << 20): DataFrame = {
    import spark.implicits._
    val arr = queries.toArray
    val nBytes = serializedSize(arr)
    require(nBytes <= maxBroadcastBytes,
      s"compiled query set serializes to $nBytes B > broadcast cap " +
        s"$maxBroadcastBytes B (${arr.length} queries) — switch to a " +
        "term-keyed candidate join for sets this large")
    val bc = spark.sparkContext.broadcast(arr)
    docs.select(docs("doc_id"), docs("text")).as[(Long, String)]
      .mapPartitions { it =>
        val qs = bc.value
        it.flatMap { case (id, text) =>
          val toks = Tokenizer.tokenize(text)
          val pos = new scala.collection.mutable.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]]
          var i = 0
          while (i < toks.length) {
            pos.getOrElseUpdate(toks(i), new scala.collection.mutable.ArrayBuffer[Int]) += i
            i += 1
          }
          val posIdx: Map[String, Array[Int]] =
            pos.iterator.map { case (t, b) => t -> b.toArray }.toMap
          qs.iterator.filter { q =>
            q.req.forall(posIdx.contains) &&
              (q.any.isEmpty || q.any.exists(posIdx.contains)) &&
              q.eval(posIdx)
          }.map(q => (id, q.qid))
        }
      }
      .toDF("doc_id", "query_id")
  }
}
