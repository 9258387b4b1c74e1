package graft.pipeline

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Lineage._
import org.apache.spark.storage.StorageLevel

/** Training-data curation operators over a (doc_id, text, lang, source)
  * table: benchmark decontamination, PII scrubbing, repetition-based
  * quality filtering (the Gopher-style rules, Rae et al. 2021), and
  * deterministic stratified sampling for domain mixing.
  *
  * Everything except sequence packing is pure `sql.functions` columns —
  * whole-stage codegen, no UDFs — and every rule has an exactly
  * equivalent ANSI-SQL twin for the DuckDB oracle (SparkEntry.oracleSql).
  * Doubles are rounded at the output boundary and every flag compares on
  * the ROUNDED value so cross-engine float noise cannot flip a row.
  *
  * Scale posture (the 100 TB question), per operator:
  *  - decontaminate: the benchmark n-gram set is fixed-size (eval suites
  *    are KBs-to-MBs, not corpus-sized) → broadcast; the corpus side is
  *    one narrow gram pass + ONE hash agg by doc_id. No corpus-scale
  *    join shuffle.
  *  - piiScrub / stratifiedSample: fully narrow, zero shuffles.
  *  - repetitionStats: one (doc_id, gram) hash agg + one doc_id hash agg
  *    — both partial+final, skew-free (keys are per-doc).
  *  - packSequences: ONE range shuffle on doc_id + a driver prefix-scan
  *    of P partition sums — the docId-assignment machinery (DocIds)
  *    generalized from rank to running token offset; output is invariant
  *    to parallelism, which is what makes packed sequences reproducible
  *    across cluster sizes.
  */
object Curation {

  /** Raw whitespace word stream — the shingle convention shared with
    * Dedup.shingles and the jaccard SQL twins. */
  private def words: Column = split(col("text"), " ")

  /** All n-grams of `ws` joined by single spaces; empty array when the
    * doc is shorter than n (sequence() would otherwise count DOWN). */
  private def ngrams(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - lit(n - 1)),
        i => concat_ws(" ", slice(ws, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  // ── decontamination ──────────────────────────────────────────────────

  /** Benchmark decontamination: for every train document (source ≠
    * `benchSource`), the fraction of its DISTINCT word n-grams that
    * appear anywhere in the benchmark partition (source = `benchSource`).
    * A doc is `contaminated` when that overlap (rounded to 6 dp) reaches
    * `theta` — the n-gram-overlap rule used for eval-set decontamination
    * of pretraining corpora (Brown et al. 2020 §C, Rae et al. 2021).
    *
    * Docs with fewer than n words carry 0 grams, overlap 0.0, and are
    * kept (nothing to match on). */
  def decontaminate(docs: DataFrame, benchSource: String, n: Int = 3,
                    theta: Double = 0.5): DataFrame = {
    val grams = array_distinct(ngrams(words, n))
    val bench = docs.filter(col("source") === benchSource)
      .select(explode(grams).as("g")).distinct()
    val train = docs.filter(col("source") =!= benchSource)
    val perDoc = train
      .select(col("doc_id"), explode(grams).as("g"))
      .join(broadcast(bench.withColumn("hit", lit(1))), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"))
    val overlap = when(col("n_grams") > 0,
      round(col("n_hits").cast("double") / col("n_grams"), 6)).otherwise(lit(0.0))
    train.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        overlap.as("overlap"),
        (overlap >= theta).as("contaminated"))
  }

  // ── PII scrubbing ────────────────────────────────────────────────────

  /** Email + IPv4 patterns, written in the common subset of Java regex
    * and RE2 (no \b, no \d, no lookaround) so Spark and DuckDB match the
    * exact same spans. */
  final val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  final val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII scrub: count emails/IPv4s in `text` and redact them (emails
    * first — an IPv4 can never sit inside an email match because the TLD
    * class is alphabetic, so the two passes commute on counts but the
    * order is still pinned for byte-identical output). Returns counts,
    * the redacted length, and sha256 of the redacted text — the
    * cross-engine equality witness. */
  def piiScrub(docs: DataFrame): DataFrame = {
    val clean = regexp_replace(
      regexp_replace(col("text"), EmailRe, "<EMAIL>"), Ipv4Re, "<IP>")
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0)))
        .cast("long").as("n_ips"),
      length(clean).cast("long").as("clean_len"),
      sha2(clean, 256).as("clean_sha"))
  }

  /** Credential patterns for [[secretScan]], in the Java-regex ∩ RE2
    * portable subset (both engines match identical spans): AWS
    * access-key ids (AKIA + 16 uppercase base-36 chars) and GitHub
    * personal access tokens (ghp_ + 36 word chars). */
  final val AwsKeyRe = "AKIA[0-9A-Z]{16}"
  final val GhTokenRe = "ghp_[A-Za-z0-9]{36}"

  /** Secret scanning (X163 — the detect-secrets / gitleaks regex
    * family): the credential-detector sibling of [[piiScrub]] that a
    * SOURCE-CODE corpus needs before training — leaked cloud keys and
    * repo tokens are the classic pre-training liability in crawled
    * code. Per doc: detector match counts, redacted length, and the
    * sha256 witness of the redacted text. Pure regexp columns —
    * whole-stage codegen, zero shuffles, pushdown-friendly. */
  def secretScan(docs: DataFrame): DataFrame = {
    val clean = regexp_replace(
      regexp_replace(col("text"), AwsKeyRe, "<AWS_KEY>"),
      GhTokenRe, "<GH_TOKEN>")
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(AwsKeyRe), lit(0)))
        .cast("long").as("n_aws_keys"),
      size(regexp_extract_all(col("text"), lit(GhTokenRe), lit(0)))
        .cast("long").as("n_gh_tokens"),
      length(clean).cast("long").as("clean_len"),
      sha2(clean, 256).as("clean_sha"))
  }

  // ── repetition quality (Gopher-style) ────────────────────────────────

  /** Per-doc n-gram repetition statistics: total grams, the count of the
    * most frequent gram, and the fraction of gram occurrences whose gram
    * occurs ≥ 2 times (`dup_ratio` — "fraction of tokens in duplicated
    * n-grams", Rae et al. 2021 table A1). `keep` = dup_ratio ≤ theta on
    * the rounded value. Docs shorter than n words have 0 grams and are
    * kept. */
  def repetitionStats(docs: DataFrame, n: Int = 2,
                      theta: Double = 0.2): DataFrame = {
    val perGram = docs
      .select(col("doc_id"), explode(ngrams(words, n)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val perDoc = perGram.groupBy("doc_id").agg(
      sum(col("c")).as("n_grams"),
      max(col("c")).as("top_gram_count"),
      sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_occ"))
    val ratio = when(col("n_grams") > 0,
      round(col("dup_occ").cast("double") / col("n_grams"), 6)).otherwise(lit(0.0))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("top_gram_count"), lit(0L)).as("top_gram_count"),
        ratio.as("dup_ratio"),
        (ratio <= theta).as("keep"))
  }

  // ── stratified sampling ──────────────────────────────────────────────

  /** Deterministic per-language downsampling for domain mixing: a doc
    * lands in `bucket = int(md5(doc_id)[0:6], 16) mod 100` and survives
    * iff bucket < rate(lang). md5 is the portable hash (DuckDB computes
    * the identical hex), so the SAME rows survive in every engine, every
    * run, at every parallelism — the property that makes a mixing recipe
    * reproducible. Narrow: zero shuffles, pushdown-friendly. */
  def stratifiedSample(docs: DataFrame, rates: Seq[(String, Int)],
                       defaultRate: Int): DataFrame = {
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
      .cast("long") % 100
    val rate = rates.foldRight(lit(defaultRate)) { case ((l, r), acc) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    docs.select(col("doc_id"), col("lang"), bucket.as("bucket"))
      .filter(col("bucket") < rate)
  }

  /** Leakage-safe train/eval split: the split key is the GROUP (the
    * source repo), not the document, so near-duplicates and intra-repo
    * clones land on the same side — the standard guard against
    * train/test contamination that per-doc hashing (stratifiedSample's
    * regime) cannot give. Deterministic and engine-portable:
    * md5(source) 6-hex-prefix bucket in [0, 100), train ⇔ bucket <
    * trainPct. Pure narrow built-in columns — zero shuffles, whole-stage
    * codegen, invariant to parallelism and corpus growth (a repo's side
    * never changes when other repos arrive). */
  def groupSplit(docs: DataFrame, trainPct: Int): DataFrame = {
    require(trainPct >= 1 && trainPct <= 99,
      s"trainPct must be in [1, 99], got $trainPct")
    val bucket = conv(substring(md5(col("source")), 1, 6), 16, 10)
      .cast("long") % 100
    docs.select(col("doc_id"), col("source"),
      when(bucket < trainPct, "train").otherwise("eval").as("split"))
  }

  // ── sequence packing ─────────────────────────────────────────────────

  /** Pack the corpus token stream (docs in doc_id order, each doc's
    * length-≥2-filtered tokens concatenated) into fixed-length training
    * sequences of `seqLen` tokens. Emits one span row per (sequence,
    * doc) overlap: `(seq_id, doc_id, tok_start, n_toks)` with tok_start
    * the 0-based offset INSIDE the doc — exactly the manifest a
    * pretraining loader needs to materialize sequence seq_id.
    *
    * Deterministic at any parallelism: global token offsets come from a
    * range shuffle on doc_id + per-partition token sums + a driver
    * prefix scan (the DocIds two-pass generalized from rank to running
    * sum), never from task order. Zero-token docs occupy no stream
    * positions and emit no spans. */
  def packSequences(spark: SparkSession, docs: DataFrame, seqLen: Int,
                    numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val dl = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        size(filter(split(col("text"), " "), t => length(t) >= 2))
          .cast("long").as("dl"))
      .filter(col("dl") > 0)
      .as[(Long, Long)]
    val sorted = dl.repartitionByRange(parts, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sums: Map[Int, Long] = sorted
      .mapPartitions { it =>
        var s = 0L; while (it.hasNext) s += it.next()._2
        Iterator.single((TaskContext.getPartitionId(), s))
      }
      .collect().toMap
    val numParts = sorted.rdd.getNumPartitions
    val offsets = new Array[Long](numParts)
    var acc = 0L
    (0 until numParts).foreach { pid =>
      offsets(pid) = acc
      acc += sums.getOrElse(pid, 0L)
    }
    val l = seqLen.toLong
    val out = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var off = offsets(pid)
      it.flatMap { case (docId, n) =>
        val o = off
        off += n
        val first = o / l
        val last = (o + n - 1) / l
        (first to last).iterator.map { s =>
          val start = math.max(0L, s * l - o)
          val end = math.min(n, (s + 1) * l - o)
          (s, docId, start, end - start)
        }
      }
    }
    out.toDF("seq_id", "doc_id", "tok_start", "n_toks")
  }
  /** Term co-occurrence counts over a sliding window — the GloVe-style
    * statistics table (Pennington et al., EMNLP 2014) an embedding
    * trainer consumes: for every ORDERED in-document pair of tokens at
    * distance 1..window (positions over the filtered token stream),
    * how often the pair occurs corpus-wide.
    *
    * Scale posture: pair generation is one NARROW flatMap over documents
    * (a doc's text is one row — the P7 fusion argument), followed by ONE
    * (term_a, term_b) hash aggregation, partial+final. The pair key
    * space is vocabulary², not corpus-sized, so the shuffle carries
    * combiner output; a `minCount` floor keeps the result table the
    * shape trainers actually load. */
  def cooccurrence(spark: SparkSession, docs: DataFrame, window: Int,
                   minCount: Long = 1L): DataFrame = {
    import spark.implicits._
    require(window >= 1, s"window must be >= 1, got $window")
    docs.select(col("text")).as[String]
      .flatMap { text =>
        val ts = graft.tokenize.Tokenizer.tokenize(text)
        for {
          i <- ts.indices.iterator
          j <- (i + 1) until math.min(i + window + 1, ts.length)
        } yield (ts(i), ts(j))
      }
      .toDF("term_a", "term_b")
      .groupBy("term_a", "term_b")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Dunning log-likelihood-ratio collocations (Dunning, CL'93
    * "Accurate Methods for the Statistics of Surprise and
    * Coincidence") — the significance TEST companion to
    * [[ppmiCollocations]]' effect-size score (PMI overrates rare
    * pairs; G² does not): over the same directed window pair table,
    * G² = 2·Σ_ij k_ij·ln(k_ij·N/(R_i·C_j)) on the 2×2 contingency
    * table (k11 = n, k12 = R−n, k21 = C−n, k22 = N−R−C+n), zero cells
    * contributing zero.
    *
    * Same plan regime as PPMI (cached pair table, vocab-sized
    * marginals, scalar N); every contingency cell is an exact Long,
    * the four ln terms are mirrored textually and summed in fixed
    * written order, half-up 6-dp boundary. */
  def llrCollocations(spark: SparkSession, docs: DataFrame, window: Int,
                      minCount: Long): DataFrame = {
    val pairs = cooccurrence(spark, docs, window, 1L).cache()
    val total = pairs.agg(sum("n")).head().getLong(0)
    val rowM = pairs.groupBy("term_a").agg(sum("n").as("row_n"))
    val colM = pairs.groupBy("term_b").agg(sum("n").as("col_n"))
    val nTot = lit(total.toDouble)
    def term(k: Column, r: Column, c: Column): Column =
      when(k > 0, k.cast("double") *
        log(k.cast("double") * nTot / (r.cast("double") * c.cast("double"))))
        .otherwise(lit(0.0))
    val out = pairs.filter(col("n") >= minCount)
      .join(rowM, "term_a")
      .join(colM, "term_b")
      .withColumn("k12", col("row_n") - col("n"))
      .withColumn("k21", col("col_n") - col("n"))
      .withColumn("k22", lit(total) - col("row_n") - col("col_n") + col("n"))
      .withColumn("r2", lit(total) - col("row_n"))
      .withColumn("c2", lit(total) - col("col_n"))
      .withColumn("llr",
        floor(lit(2.0) * (term(col("n"), col("row_n"), col("col_n"))
          + term(col("k12"), col("row_n"), col("c2"))
          + term(col("k21"), col("r2"), col("col_n"))
          + term(col("k22"), col("r2"), col("c2"))) * 1e6 + 0.5) / 1e6)
      .select(col("term_a"), col("term_b"), col("n"), col("llr"))
      .orderBy("term_a", "term_b")
      // snapshot result, release the cached pair table (see ppmi)
      .cutLineage()
    pairs.unpersist()
    out
  }

  /** Weighted sampling without replacement — Efraimidis & Spirakis,
    * IPL'06 ("A-ES"): each row draws u ~ U(0,1] and the n LARGEST
    * keys u^(1/w) are the sample; inclusion probability is then
    * proportional to weight w without ever materializing Σw. The
    * weighted sibling of the md5 p-samplers (stratifiedSample / AQP):
    * here weight = n_chars, the long-doc-favoring draw a token-budget
    * subsample wants.
    *
    * Portability/determinism: u derives from the md5-portable family
    * (15-hex prefix → (h+1)/2^60 ∈ (0,1], exact in both engines), the
    * key is compared as ln(u)/w (monotone in u^(1/w)), the expression
    * tree is mirrored textually in the twin, and the boundary rounds
    * half-up at 6 dp BEFORE the (key desc, doc_id) order, so the
    * selected set is engine- and parallelism-invariant. Zero-weight
    * rows are excluded (u^(1/0) is undefined — pinned, documented).
    *
    * Scale: one narrow pass + a global top-n (TakeOrderedAndProject);
    * no shuffle beyond the top-n's reduction. */
  def weightedSample(docs: DataFrame, n: Int, seed: String): DataFrame = {
    require(n >= 1, s"sample size must be >= 1, got $n")
    val h = conv(substring(md5(concat(lit(s"$seed:"),
      col("doc_id").cast("string"))), 1, 15), 16, 10)
      .cast("long").cast("double")
    val u = (h + lit(1.0)) / lit(1152921504606846976.0) // 16^15 = 2^60
    docs.select(col("doc_id"), col("n_chars").cast("long").as("w"))
      .filter(col("w") >= 1L)
      .withColumn("skey", floor(log(u) / col("w") * 1e6 + 0.5) / 1e6)
      .orderBy(col("skey").desc, col("doc_id"))
      .limit(n)
  }

  /** PPMI-scored collocations (Church & Hanks, CL'90; the positive
    * clamp per Levy & Goldberg, NIPS'14): over the [[cooccurrence]]
    * pair table, ppmi(a,b) = max(0, ln(n·N / (row_a · col_b))) with N
    * the total pair count and row/col the directed marginals — the
    * classic phrase-mining signal (high-PPMI adjacent pairs are
    * multiword expressions, not chance co-occurrence).
    *
    * Marginals use the UNFILTERED pair table (a floor would bias
    * p(a)·p(b)); only the REPORTED pairs are floored at `minCount`.
    *
    * Plan, built for scale: the pair table is built once and cached
    * (three consumers below); marginals are vocabulary-sized
    * aggregations that AQE broadcasts when small and sort-merges when
    * a code-scale vocabulary isn't; N is one COUNT-like scalar to the
    * driver (two Longs — the [[autoDateHistogram]] posture). The ln
    * runs on one explicitly-shaped double expression — (n̂·N̂)/(r̂·ĉ),
    * each Long cast first, multiply then divide — mirrored textually
    * in the oracle so both engines evaluate the identical IEEE tree,
    * then rounded by the explicit half-up rule. */
  def ppmiCollocations(spark: SparkSession, docs: DataFrame, window: Int,
                       minCount: Long): DataFrame = {
    val pairs = cooccurrence(spark, docs, window, 1L).cache()
    val total = pairs.agg(sum("n")).head().getLong(0)
    val rowM = pairs.groupBy("term_a").agg(sum("n").as("row_n"))
    val colM = pairs.groupBy("term_b").agg(sum("n").as("col_n"))
    val out = pairs.filter(col("n") >= minCount)
      .join(rowM, "term_a")
      .join(colM, "term_b")
      .withColumn("pmi",
        log(col("n").cast("double") * lit(total.toDouble) /
          (col("row_n").cast("double") * col("col_n").cast("double"))))
      .withColumn("ppmi",
        floor(greatest(col("pmi"), lit(0.0)) * 1e6 + 0.5) / 1e6)
      .select(col("term_a"), col("term_b"), col("n"), col("ppmi"))
      .orderBy("term_a", "term_b")
      // eagerly snapshot the vocab-pair-sized result, then release the
      // corpus-scale cached pair table NOW — the checkpoint blocks are
      // freed by the ContextCleaner when the frame is dropped, instead
      // of the cache surviving in the shared CacheManager until LRU
      .cutLineage()
    pairs.unpersist()
    out
  }

  /** Model-based quality scoring — the linear-classifier filter of the
    * GPT-3/CCNet lineage (Brown et al. 2020 §A; fastText's mean-pooled
    * linear layer, Joulin et al. 2017): score = bias + mean over the
    * doc's tokens of a per-term weight, keep = rounded score > 0.
    *
    * Scale posture: the weight table is vocabulary-sized (MBs for a
    * 1M-term vocab — the small artifact by design) → BROADCAST; scoring
    * is one narrow pass, zero shuffles, and a missing term scores 0 so
    * any corpus can run under any model. Tokens = the whitespace/len≥2
    * convention every documents-table twin shares.
    *
    * Reproducibility: token weights accumulate left-to-right; with
    * weights on a 2^-10 grid ([[hashWeights]]) every partial sum is
    * EXACT, so sum order cannot matter, sum/dl is one correctly-rounded
    * IEEE division, and the pre-round score is bit-identical in every
    * engine. Rounding is the EXPLICIT floor(x·1e6 + 0.5)/1e6 rather than
    * round(x, 6): a mean can land exactly on a 6-dp half (e.g.
    * 0.0640625), where engines disagree on the tie rule (Spark half-up,
    * DuckDB half-even) — spelling the tie rule out makes both compute
    * the same double. The keep flag compares on the ROUNDED value (the
    * C3 convention). */
  def linearQuality(docs: DataFrame, weights: Map[String, Double],
                    bias: Double = 0.0): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(weights)
    val score = udf { text: String =>
      val w = bc.value
      val toks = Option(text).getOrElse("").split(" ").filter(_.length >= 2)
      val x =
        if (toks.isEmpty) bias
        else {
          var s = 0.0
          toks.foreach(t => s += w.getOrElse(t, 0.0))
          bias + s / toks.length
        }
      math.floor(x * 1e6 + 0.5) / 1e6
    }
    docs.select(col("doc_id"), score(col("text")).as("quality"))
      .withColumn("keep", col("quality") > 0.0)
  }

  /** Language-model perplexity scoring — the CCNet filter (Wenzek et
    * al., "CCNet: Extracting High Quality Monolingual Datasets from Web
    * Crawl Data", LREC 2020; also GPT-3/Gopher data work): score every
    * document by its perplexity under a unigram corpus LM with
    * Jelinek-Mercer smoothing, keep = perplexity ≤ `keepBelow`
    * (low-perplexity text is fluent/typical; gibberish and boilerplate
    * blow up). p̂(t) = λ·cf(t)/total + (1−λ)/V; perplexity =
    * exp(−(1/dl)·Σ ln p̂(t_i)) over the token STREAM (repeats included —
    * the LM convention, unlike the presence semantics of search).
    *
    * Scale posture: the LM is the vocabulary-sized (term → cf) table —
    * ONE (term)-keyed hash agg (partial+final, skew is bounded by vocab
    * cardinality) collected and BROADCAST, exactly the trained-artifact
    * posture of [[linearQuality]]; scoring is then one narrow pass. At
    * 100 TB you'd train the LM once and reuse it across runs — the
    * broadcast shape is identical.
    *
    * Cross-engine: Σ ln over ≤dl doubles carries ~1e-15 relative error
    * (the bm25-twin regime), far inside the 6-dp rounding; empty docs
    * score exp(0) = 1. */
  def lmPerplexity(docs: DataFrame, lambda: Double = 0.9,
                   keepBelow: Double = 30.0): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs.select(explode(filter(split(col("text"), " "),
      t => length(t) >= 2)).as("term"))
    val cfRows = toks.groupBy("term").agg(count(lit(1)).as("cf")).collect()
    val total = cfRows.map(_.getLong(1)).sum.toDouble
    val v = cfRows.length.toDouble
    val cf = cfRows.map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val bc = spark.sparkContext.broadcast(cf)
    val pp = udf { text: String =>
      val m = bc.value
      val ts = Option(text).getOrElse("").split(" ").filter(_.length >= 2)
      if (ts.isEmpty) 1.0
      else {
        var s = 0.0
        ts.foreach { t =>
          val p = lambda * m.getOrElse(t, 0.0) / total + (1.0 - lambda) / v
          s += -math.log(p)
        }
        math.exp(s / ts.length)
      }
    }
    docs.select(col("doc_id"), round(pp(col("text")), 6).as("perplexity"))
      .withColumn("keep", col("perplexity") <= keepBelow)
  }

  /** The md5-portable stand-in weight for a term: 6 hex chars of
    * md5(term) → [−1000, 1000] scaled by 2^-10 — every weight is a
    * multiple of 2^-10 (exactly representable, so token sums are EXACT
    * and engine-order-independent), and DuckDB computes the identical
    * value from the identical hex. A trained model's weights drop in
    * through [[linearQuality]]'s map without touching the operator. */
  def hashWeight(term: String): Double =
    (PortableHash.md5HexPrefixLong(term, 6) % 2001 - 1000) / 1024.0

  def hashWeights(vocab: Seq[String]): Map[String, Double] =
    vocab.map(t => t -> hashWeight(t)).toMap

  /** [[linearQuality]] instantiated with the hash weights computed
    * INLINE per token — pure built-in columns (md5/conv/aggregate):
    * whole-stage codegen, zero shuffles, no vocabulary collection, no
    * UDF. Proven row-identical to linearQuality(hashWeights(vocab)) in
    * CurationSpec; the driver's `quality_model` oracle twin. */
  def hashedQuality(docs: DataFrame, bias: Double = 0.0): DataFrame = {
    val toks = filter(split(col("text"), " "),
      t => length(t) >= 2)
    val wt = (t: Column) =>
      (conv(substring(md5(t), 1, 6), 16, 10).cast("long") % 2001 - 1000) /
        lit(1024.0)
    val swt = aggregate(toks, lit(0.0), (acc, t) => acc + wt(t))
    val x = lit(bias) + when(size(toks) === 0, 0.0).otherwise(swt / size(toks))
    docs.select(col("doc_id"),
        (floor(x * 1e6 + 0.5) / 1e6).as("quality"))
      .withColumn("keep", col("quality") > 0.0)
  }

  // ── DSIR importance resampling ───────────────────────────────────────

  /** Hashed-unigram feature bucket of a term: first 6 hex chars of
    * md5(term) mod `buckets` — the md5-portable hash convention of
    * [[stratifiedSample]]/[[hashWeight]], so DuckDB computes the
    * identical bucket from the identical hex. */
  def dsirBucket(term: String, buckets: Int): Int =
    (PortableHash.md5HexPrefixLong(term, 6) % buckets).toInt

  /** Data Selection with Importance Resampling (DSIR — Xie et al.,
    * NeurIPS 2023), the hashed-n-gram form: score every RAW document
    * (source ≠ `targetSource`) by its log importance weight under two
    * bag-of-hashed-unigram feature LMs — the target distribution
    * (estimated from the `targetSource` partition) over the raw
    * distribution (the rest of the corpus):
    *
    *   w(doc) = Σ_tokens  ln p̂_tgt(bucket(t)) − ln p̂_raw(bucket(t))
    *
    * with add-one smoothing p̂_x(b) = (cnt_x(b)+1)/(total_x+B). High
    * weight = looks like the target domain; `keep` selects docs with
    * rounded weight > `tau` (the deterministic top-slice variant of the
    * paper's importance resampling — no RNG, so the SAME rows survive in
    * every engine at every parallelism, the [[stratifiedSample]] rule).
    *
    * Scale posture: the feature space is `buckets`-sized by
    * construction (the paper's point — hashed features keep both LMs in
    * memory at any corpus size), so training is ONE bucket-keyed hash
    * agg (partial+final, key space ≤ B) collected and broadcast as two
    * Double arrays; scoring is one narrow pass per doc with per-doc
    * bucket counts accumulated locally and the Σ taken in ascending
    * bucket order (deterministic float order). Zero corpus-scale joins.
    * Σ-of-ln drift vs the SQL twin is ~1e-15 relative (the
    * [[lmPerplexity]] regime), far inside the 6-dp round. */
  def dsirWeights(docs: DataFrame, targetSource: String, buckets: Int = 64,
                  tau: Double = 0.0): DataFrame = {
    require(buckets >= 1, "dsir needs at least one feature bucket")
    val spark = docs.sparkSession
    val bucketCol = conv(substring(md5(col("term")), 1, 6), 16, 10)
      .cast("long").cast("int") % buckets
    val counts = docs
      .select(col("source"), explode(filter(split(col("text"), " "),
        t => length(t) >= 2)).as("term"))
      .select((col("source") === targetSource).as("is_tgt"), bucketCol.as("b"))
      .groupBy(col("is_tgt"), col("b")).agg(count(lit(1)).as("c"))
      .collect()
    val tgtCnt = new Array[Long](buckets)
    val rawCnt = new Array[Long](buckets)
    counts.foreach { r =>
      val arr = if (r.getBoolean(0)) tgtCnt else rawCnt
      arr(r.getInt(1)) = r.getLong(2)
    }
    val tgtTot = tgtCnt.sum.toDouble + buckets
    val rawTot = rawCnt.sum.toDouble + buckets
    val lambda = Array.tabulate(buckets)(b =>
      math.log((tgtCnt(b) + 1.0) / tgtTot) - math.log((rawCnt(b) + 1.0) / rawTot))
    val bcLambda = spark.sparkContext.broadcast(lambda)
    val weight = udf { text: String =>
      val lam = bcLambda.value
      val cnt = new Array[Long](buckets)
      Option(text).getOrElse("").split(" ").foreach { t =>
        if (t.length >= 2) cnt(dsirBucket(t, buckets)) += 1L
      }
      var s = 0.0
      var n = 0L
      var b = 0
      while (b < buckets) {
        if (cnt(b) > 0) { s += cnt(b) * lam(b); n += cnt(b) }
        b += 1
      }
      (n, math.floor(s * 1e6 + 0.5) / 1e6)
    }
    docs.filter(col("source") =!= targetSource)
      .select(col("doc_id"), weight(col("text")).as("w"))
      .select(col("doc_id"), col("w._1").as("n_toks"),
        col("w._2").as("weight"))
      .withColumn("keep", col("weight") > tau)
  }

  // ── domain mixture reweighting ───────────────────────────────────────

  /** Temperature-smoothed domain mixture weights — the standard
    * multilingual/multi-domain training-mixture rule (exponentially
    * smoothed sampling: q_d ∝ p_d^α with p_d the domain's corpus share;
    * Conneau & Lample NeurIPS'19 §3.1 / XLM-R, and the
    * examples-proportional mixing analysis in Raffel et al. JMLR'20
    * §3.5.2): α = 1 keeps natural proportions, α → 0 approaches uniform,
    * in between up-samples the tail without flattening the head.
    *
    * One row per domain: `n_docs` (exact), `p` (natural share), `q`
    * (smoothed target share), `weight` = q/p (the per-doc up/down-
    * sampling factor a loader applies), and `expected` = round(budget·q)
    * (the document budget the domain receives).
    *
    * Scale: the domain count is ONE corpus-scale hash agg (partial+
    * final, skew-free output of |domains| rows); everything after runs
    * on the domain-sized table via two broadcast cross joins (the Σn and
    * Σp^α scalars). Cross-engine determinism: n_docs/N and pow are fixed
    * IEEE trees from exact Longs; the only Σ-of-doubles is Σp^α over
    * |domains| values (the ft_lmd 1e-15 regime), and every double is
    * floor(x·1e6+0.5)/1e6-rounded at the output boundary. */
  /** APPLY a temperature mixture deterministically: keep each document
    * with its domain's acceptance rate r_d = (q_d/p_d) / max_d(q_d/p_d)
    * — the downsampling-only normalization (the most over-represented
    * domain keeps everything; every other domain is thinned toward the
    * smoothed target; cf. the [[mixtureWeights]] rule). The keep
    * decision is the md5-portable hash family (hash(doc_id) micro-bucket
    * < floor(r·1e6+0.5)), so the sample is reproducible, engine-portable
    * (integer-vs-integer compare — the only float step is the 6-dp
    * rounding of r, a fixed IEEE tree both engines share), and
    * growth-stable per doc given fixed rates. Scale: the rate table is
    * |domains|-sized (broadcast join); the filter itself is one narrow
    * whole-stage-codegen pass — zero extra shuffles beyond
    * mixtureWeights' own domain count. */
  def mixtureSample(docs: DataFrame, alpha: Double,
                    domainCol: String = "lang"): DataFrame = {
    val w = mixtureWeights(docs, alpha, 0L, domainCol)
      .select(col("domain"), col("weight"))
    val maxW = w.agg(max(col("weight")).as("max_w"))
    val rates = w.crossJoin(broadcast(maxW))
      .select(col("domain"),
        (floor(col("weight") / col("max_w") * lit(1e6) + lit(0.5)))
          .cast("long").as("r_micro"))
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 6),
      16, 10).cast("long") % 1000000L
    docs.select(col("doc_id"), col(domainCol).as("domain"))
      .join(broadcast(rates), Seq("domain"))
      .filter(bucket < col("r_micro"))
      .select(col("doc_id"), col("domain"))
      .orderBy(col("doc_id"))
  }

  /** UP-sampling repetition manifest — examples-proportional mixing with
    * repetition (the data-constrained regime: under-represented domains
    * repeat; cf. the [[mixtureWeights]] target): each doc d gets
    * r_d = w_d / min_d(w_d) ≥ 1 expected copies (the most
    * OVER-represented domain repeats exactly once), realized
    * deterministically as floor(r) copies plus one extra when the doc's
    * md5 micro-bucket falls under frac(r) — the same portable hash
    * family as [[mixtureSample]], so epoch composition is reproducible
    * and engine-portable. Emits (doc_id, domain, copy_id 0-based).
    * Scale: rate table is |domains|-sized (broadcast); the expansion is
    * one narrow explode(sequence) pass — output grows by the repetition
    * factor, never shuffles. */
  def mixtureRepeat(docs: DataFrame, alpha: Double,
                    domainCol: String = "lang"): DataFrame = {
    val w = mixtureWeights(docs, alpha, 0L, domainCol)
      .select(col("domain"), col("weight"))
    val minW = w.agg(min(col("weight")).as("min_w"))
    val rates = w.crossJoin(broadcast(minW))
      .select(col("domain"),
        (floor(col("weight") / col("min_w") * lit(1e6) + lit(0.5)))
          .cast("long").as("r_micro"))
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 6),
      16, 10).cast("long") % 1000000L
    val nCopies = expr("r_micro div 1000000") +
      when(bucket < pmod(col("r_micro"), lit(1000000L)), 1L).otherwise(0L)
    docs.select(col("doc_id"), col(domainCol).as("domain"))
      .join(broadcast(rates), Seq("domain"))
      .select(col("doc_id"), col("domain"), nCopies.as("n_copies"))
      .select(col("doc_id"), col("domain"),
        explode(sequence(lit(0L), col("n_copies") - 1L)).as("copy_id"))
      .orderBy(col("doc_id"), col("copy_id"))
  }

  // ── RAG / context chunking ───────────────────────────────────────────

  /** Overlapping fixed-size token chunking — the RAG/context-window
    * staple: each document's filtered token stream is cut into windows
    * of `size` tokens advancing by `size − overlap` (the stride), the
    * last window truncated at the document end; a document shorter than
    * one window yields exactly one chunk. Emits the chunk MANIFEST
    * `(doc_id, chunk_id, tok_start, n_toks)` (1-based start, chunk_id
    * 0-based per doc) — the same span-row convention as
    * [[packSequences]], and what an embedding/retrieval pipeline
    * materializes chunks from. Empty docs emit nothing. Scale: pure
    * narrow flatMap over the doc rows (token COUNT only — the text is
    * never re-shuffled), zero shuffles, deterministic at any
    * parallelism. */
  def chunkDocs(docs: DataFrame, size: Int, overlap: Int): DataFrame = {
    require(size >= 1, s"chunk size must be >= 1, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap (size $size)")
    val stride = size - overlap
    val spark2 = docs.sparkSession
    import spark2.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val dl = graft.tokenize.Tokenizer.tokenize(text).length
        if (dl == 0) Iterator.empty
        else {
          // chunks start at 1, 1+stride, … while start <= dl - overlap
          // (a start past dl-overlap would duplicate a suffix already
          // fully covered); always at least one chunk
          val nChunks = math.max(1L, (dl - overlap + stride - 1L) / stride)
          (0L until nChunks).iterator.map { c =>
            val start = c * stride + 1L
            (id, c, start, math.min(size.toLong, dl - start + 1L))
          }
        }
      }
      .toDF("doc_id", "chunk_id", "tok_start", "n_toks")
  }

  def mixtureWeights(docs: DataFrame, alpha: Double, budget: Long,
                     domainCol: String = "lang"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"alpha must be in (0, 1], got $alpha")
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    def rnd6(c: Column) = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val counts = docs.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum(col("n_docs")).cast("double").as("n_total"))
    val withP = counts.crossJoin(broadcast(total))
      .select(col("domain"), col("n_docs"),
        (col("n_docs").cast("double") / col("n_total")).as("p"))
    val z = withP.agg(sum(pow(col("p"), lit(alpha))).as("z"))
    withP.crossJoin(broadcast(z))
      .select(col("domain"), col("n_docs"),
        rnd6(col("p")).as("p"),
        rnd6(pow(col("p"), lit(alpha)) / col("z")).as("q"),
        rnd6(pow(col("p"), lit(alpha)) / col("z") / col("p")).as("weight"),
        floor(lit(budget.toDouble) * (pow(col("p"), lit(alpha)) / col("z"))
          + lit(0.5)).cast("long").as("expected"))
      .orderBy(col("domain"))
  }

  /** Deterministic epoch shuffle (the seeded global reorder + shard
    * assignment a training pipeline runs before reading a corpus:
    * document order is randomized per epoch and written as fixed shards
    * so a training run is reproducible and resumable from any shard
    * boundary). Each doc gets (shard, pos): shard = md5("seed:doc_id")
    * 15-hex-prefix mod nShards, pos = the doc's rank within its shard
    * by (hash, doc_id) — a seeded, engine-portable permutation (the
    * md5 curation-hash family; a different seed is a different epoch).
    *
    * Scale: ONE corpus-scale exchange — the shard-keyed repartition IS
    * the global shuffle being asked for (no cheaper form exists) — and
    * the within-shard rank is a shard-partitioned window: parallel
    * across shards, skew-free (md5 is uniform so shards are ~equal),
    * never a single global sort. Output is invariant to input
    * parallelism, which is what makes an epoch reproducible. */
  def epochShuffle(docs: DataFrame, seed: Long, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(md5(concat(lit(seed.toString), lit(":"),
      col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    docs.select(col("doc_id"), h.as("h"))
      .withColumn("shard", (col("h") % nShards).cast("long"))
      .select(col("doc_id"), col("shard"),
        (row_number().over(w) - 1).cast("long").as("pos"))
  }
}
