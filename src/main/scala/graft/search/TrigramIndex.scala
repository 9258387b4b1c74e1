package graft.search

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.codec.PostingCodec

/** Trigram posting list for one (trigram, docId-bucket) — the same
  * block-compressed layout as the term index ([[graft.model.PostingList]],
  * codec v1 with tf ≡ 1), so the battle-tested cursor (block skips,
  * galloping nextGeq) is reused unchanged. */
final case class TriPosting(
    tri: Long,
    bucket: Int,
    numDocs: Int,
    lastDocIds: Array[Long],
    maxImpacts: Array[Float],
    offsets: Array[Int],
    bytes: Array[Byte])

/** Substring ("grep") index over raw document content — the code-search
  * modality the word-aligned term index cannot express: a needle like
  * `rge so` crosses token boundaries and matches mid-identifier, which no
  * PHRASE/positional query can see.
  *
  * Design (public knowledge): Google Code Search's trigram index — Cox,
  * "Regular Expression Matching with a Trigram Index" (2012) — and the
  * Zoekt engine use the same structure: posting lists keyed by character
  * trigram; a substring query intersects the lists of every trigram the
  * needle contains (a SUPERSET of the truth — trigram presence anywhere
  * in the doc, not adjacency), then verifies candidates against the raw
  * content. The reference tree at /root/reference was empty at survey
  * time (SURVEY.md §0), so the design is pinned from those public
  * sources, not cited file:line.
  *
  * Spark mapping / scale posture:
  *   - Build = ONE corpus-scale shuffle: distinct (tri, bucket, docId)
  *     triples flatMapped from a range-sorted corpus pass, repartitioned
  *     on (tri, bucket) and run-grouped into delta+VByte lists — the I3
  *     posting-build shape (SURVEY §2.3). Hot trigrams (`the`, ` a `)
  *     appear in most docs, but bucketing by docId range bounds every
  *     list at bucketSize entries, so no single row grows with corpus
  *     size — the same structural skew answer as the term index.
  *   - The persisted lists are sorted by (tri, bucket): a query's
  *     `tri IN (...)` filter reaches parquet as a pushed predicate and
  *     row-group min/max prune the scan to the needle's trigrams.
  *   - Query = per-bucket k-way cursor intersection (rarest list drives,
  *     galloping nextGeq on the rest) emitting candidate docIds, then
  *     one verification join against the corpus slice that filters
  *     `contains(text, needle)` — candidates only, never a full scan.
  *   - The index is case-folded at build; a case-sensitive query uses
  *     the folded lists for candidates (a superset) and verifies against
  *     the original case.
  */
object TrigramIndex {

  final case class Params(bucketSize: Long = 1L << 12, numPartitions: Int = 32)

  /** Pack 3 UTF-16 units into one Long (48 bits) — dense, order-free. */
  @inline def packTri(a: Char, b: Char, c: Char): Long =
    (a.toLong << 32) | (b.toLong << 16) | c.toLong

  /** Distinct trigrams of `s` (caller folds case). Empty below length 3. */
  def trigramsOf(s: String): Array[Long] = {
    if (s == null || s.length < 3) return Array.empty
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + 2 < s.length) {
      set.add(packTri(s.charAt(i), s.charAt(i + 1), s.charAt(i + 2)))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator(); var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** Build the index over `docs` (columns doc_id: long, text: string)
    * and persist it under `outDir` sorted by (tri, bucket) for
    * pushdown + row-group pruning. */
  def build(spark: SparkSession, docs: DataFrame, outDir: String,
            params: Params = Params()): TrigramIndex = {
    import spark.implicits._
    val bs = params.bucketSize
    val triples = docs.select(col("doc_id").cast("long"), lower(col("text")).as("t"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        trigramsOf(t).iterator.map(tri => (tri, (id / bs).toInt, id))
      }
      .toDF("tri", "bucket", "docId")
    // I3 shape: co-locate each (tri, bucket)'s docIds sorted, run-group
    // into one packed list per key (iterator→iterator, never materializes
    // a partition)
    val lists = triples
      .repartition(params.numPartitions, $"tri", $"bucket")
      .sortWithinPartitions($"tri", $"bucket", $"docId")
      .as[(Long, Int, Long)]
      .mapPartitions { it =>
        new Iterator[TriPosting] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): TriPosting = {
            val (tri, bucket, _) = buf.head
            val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
            while (buf.hasNext && buf.head._1 == tri && buf.head._2 == bucket) {
              ids += buf.next()._3
            }
            val arr = ids.toArray
            val ones = Array.fill(arr.length)(1)
            val imps = Array.fill(arr.length)(1.0)
            val p = PostingCodec.pack(arr, ones, imps)
            TriPosting(tri, bucket, p.numDocs, p.lastDocIds, p.maxImpacts,
              p.offsets, p.bytes)
          }
        }
      }
    lists.toDF()
      .repartitionByRange(math.max(1, params.numPartitions / 4), $"tri")
      .sortWithinPartitions($"tri", $"bucket")
      .write.mode("errorifexists").parquet(s"$outDir/trigrams")
    val meta = s"""{"bucketSize":$bs}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outDir, "tri_meta.json"),
      meta.getBytes("UTF-8"))
    new TrigramIndex(spark, outDir, bs)
  }

  /** When `pattern` is a top-level alternation of pure literals —
    * allowing ONE enclosing group per branch segment, e.g.
    * `merge (sort|scan)` or `(?:fast|slow) table` — return every
    * concrete literal the alternation denotes (the cross product of the
    * segment alternatives). Any metacharacter inside a branch ⇒ None
    * (the caller falls back to a verification scan). Bounded at 64
    * expanded literals — a wider product prefilters poorly anyway. */
  def literalAlternatives(pattern: String): Option[Seq[String]] = {
    // split the pattern into literal runs and (...) groups at depth 0
    val segs = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    var i = 0
    val lit = new StringBuilder
    def isLiteralChar(c: Char): Boolean =
      c.isLetterOrDigit || c == ' ' || c == '_'
    def flushLit(): Boolean = {
      if (lit.nonEmpty) { segs += Seq(lit.toString); lit.clear() }
      true
    }
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '(') {
        if (!flushLit()) return None
        val close = pattern.indexOf(')', i)
        if (close < 0) return None
        var body = pattern.substring(i + 1, close)
        if (body.startsWith("?:")) body = body.substring(2)
        val alts = body.split("\\|", -1)
        if (alts.exists(a => a.isEmpty || !a.forall(isLiteralChar))) return None
        segs += alts.toSeq
        i = close + 1
      } else if (c == '|') {
        // a top-level bare alternation: treat the whole pattern as one
        // group — restart with it wrapped
        return literalAlternatives(s"($pattern)")
      } else if (isLiteralChar(c)) { lit += c; i += 1 }
      else return None
    }
    flushLit()
    val product = segs.foldLeft(Seq("")) { (acc, alts) =>
      if (acc.size * alts.size > 64) return None
      for { p <- acc; a <- alts } yield p + a
    }
    if (product.isEmpty || product.forall(_.isEmpty)) None else Some(product)
  }

  def load(spark: SparkSession, dir: String): TrigramIndex = {
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "tri_meta.json")), "UTF-8")
    val bs = """"bucketSize":(\d+)""".r.findFirstMatchIn(meta).get.group(1).toLong
    new TrigramIndex(spark, dir, bs)
  }
}

final class TrigramIndex(spark: SparkSession, dir: String, bucketSize: Long) {
  import spark.implicits._

  private val schema = org.apache.spark.sql.Encoders.product[TriPosting].schema

  def lists: Dataset[TriPosting] =
    spark.read.schema(schema).parquet(s"$dir/trigrams").as[TriPosting]

  /** Candidate docIds for `needle` (already case-folded): every doc whose
    * trigram set contains ALL of the needle's trigrams — a superset of
    * the docs that contain the substring. Needles shorter than 3 chars
    * have no trigram and return None (caller falls back to a scan). */
  def candidateIds(needle: String): Option[Dataset[Long]] = {
    val tris = TrigramIndex.trigramsOf(needle)
    if (tris.isEmpty) return None
    val need = tris.length
    val rows = lists.filter(col("tri").isin(tris.toSeq: _*))
    Some(rows.groupByKey(_.bucket).flatMapGroups { (_, it) =>
      val ls = it.toArray
      // a trigram with no list in this bucket ⇒ no doc here contains it
      if (ls.length < need) Iterator.empty
      else {
        val cursors = ls.sortBy(_.numDocs).map(pl =>
          new PostingCodec.Cursor(pl.numDocs, pl.lastDocIds, pl.maxImpacts,
            pl.offsets, pl.bytes, positional = false))
        val out = scala.collection.mutable.ArrayBuffer.empty[Long]
        val lead = cursors(0)
        while (!lead.exhausted) {
          val d = lead.docId
          var ok = true
          var i = 1
          while (ok && i < cursors.length) {
            cursors(i).nextGeq(d)
            ok = !cursors(i).exhausted && cursors(i).docId == d
            i += 1
          }
          if (ok) out += d
          lead.next()
        }
        out.iterator
      }
    })
  }

  /** Regex grep with a trigram prefilter — the first step of Cox's
    * regex→trigram-query compilation: when the pattern is a top-level
    * ALTERNATION OF LITERALS (`merge (sort|scan)` ⇒ literals
    * "merge sort", "merge scan"), candidates = the UNION of each
    * literal's trigram-intersection set, and only candidates are
    * verified against the full regex. Patterns that don't decompose
    * (or whose literals are sub-trigram) fall back to the verification
    * scan — honest, and still exact. Matching is RE2 ∩ Java-regex
    * common-subset semantics: `n_match` counts leftmost non-overlapping
    * matches, the same rule both engines implement. */
  def grepRegex(docs: DataFrame, pattern: String): DataFrame = {
    val base = TrigramIndex.literalAlternatives(pattern) match {
      case Some(lits) if lits.forall(_.length >= 3) =>
        val sets = lits.flatMap(l => candidateIds(l.toLowerCase))
        if (sets.isEmpty) docs
        else docs.join(sets.reduce(_ union _).distinct().toDF("doc_id"), "doc_id")
      case _ => docs
    }
    base
      .filter(col("text").rlike(pattern))
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(pattern), lit(0)))
          .cast("long").as("n_match"))
  }

  /** Exact substring search: docs containing `needle`, with the
    * non-overlapping occurrence count (the left-to-right replace-all
    * count — the same expression both engines evaluate identically).
    * `docs` must carry (doc_id, text). Case-sensitive by default; the
    * folded index still serves candidates (a superset) either way. */
  def grep(docs: DataFrame, needle: String,
           caseInsensitive: Boolean = false): DataFrame = {
    require(needle.nonEmpty, "empty needle")
    val folded = needle.toLowerCase
    val base = candidateIds(folded) match {
      case Some(c) => docs.join(c.toDF("doc_id"), "doc_id")
      case None => docs // sub-trigram needle: verification IS the scan
    }
    val hay = if (caseInsensitive) lower(col("text")) else col("text")
    val ndl = lit(if (caseInsensitive) folded else needle)
    base
      .filter(hay.contains(ndl))
      .select(col("doc_id"),
        ((length(hay) - length(replace(hay, ndl, lit("")))) / needle.length)
          .cast("long").as("n_occur"))
  }
}
