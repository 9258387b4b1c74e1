package graft.codec

import scala.collection.mutable.ArrayBuffer

/** Block-compressed posting list: docId gaps + term frequencies, VByte
  * encoded in blocks of [[PostingCodec.BlockSize]], with per-block skip
  * metadata (last docId, max BM25 impact, byte offset).
  *
  * Layout per SURVEY.md §2.3 I5/I6 (delta + VByte per [P:ZM06]; block-max
  * metadata per Ding & Suel SIGIR'11 [P:DS11]; the reference tree was
  * empty at survey time — SURVEY.md §0 — so the layout is pinned here):
  *
  *   - postings sorted by docId strictly ascending
  *   - block b covers postings [b*128, min((b+1)*128, n))
  *   - bytes stream per block: VByte(gap_0) VByte(tf_0) ... where gap_0 is
  *     relative to the previous block's last docId (or -1 for block 0), so
  *     every gap >= 1 and blocks are independently decodable
  *   - lastDocIds(b)  = last docId of block b       (skip pointers)
  *   - maxImpacts(b)  = max BM25 impact in block b, rounded UP to Float so
  *     it stays a true upper bound for WAND pruning
  *   - offsets(b)     = byte offset of block b in `bytes`
  *
  * Pure Scala, zero Spark deps — invoked inside mapPartitions lambdas.
  */
object PostingCodec extends Serializable {

  final val BlockSize = 128

  /** Packed posting list — mirrors the Spark-side PostingList columns. */
  final case class Packed(
      numDocs: Int,
      lastDocIds: Array[Long],
      maxImpacts: Array[Float],
      offsets: Array[Int],
      bytes: Array[Byte])

  /** Float STRICTLY above d, for upper-bound-preserving quantization.
    * One extra float-ulp of slack on top of round-up so the bound also
    * covers double-ulp-level differences between the build-time impact
    * computation (whole-stage codegen) and the query-time re-computation
    * (plain Scala) — both are IEEE-identical by construction, but the
    * slack makes pruning safety independent of that proof. */
  @inline def upperFloat(d: Double): Float = {
    val f = d.toFloat
    Math.nextUp(if (f.toDouble >= d) f else Math.nextUp(f))
  }

  /** Pack sorted (docId, tf, impact) triples. docIds must be strictly
    * increasing and >= 0; tfs >= 1; impacts are the full BM25 per-term
    * contributions (used only as pruning upper bounds).
    *
    * Format v2 — positional layout: when `positions` is non-null, each
    * posting's stream is VByte(gap) VByte(tf) then exactly tf VByte
    * position-deltas (first delta = pos_0 + 1 relative to a virtual -1,
    * then strictly-positive diffs — positions are distinct ascending
    * token indices over the FILTERED token stream). Blocks stay
    * independently decodable: offsets/lastDocIds are per-block as in v1,
    * and a positional cursor skips the tf deltas via continuation-bit
    * scanning on scoring walks (positions decode only on demand).
    * Whether a list is positional is SEGMENT metadata (stats.json /
    * BuildParams.positional), not re-derivable from the bytes. */
  def pack(docIds: Array[Long], tfs: Array[Int], impacts: Array[Double],
           positions: Array[Array[Int]] = null): Packed = {
    val n = docIds.length
    require(n > 0, "empty posting list")
    require(tfs.length == n && impacts.length == n)
    require(positions == null || positions.length == n)
    val numBlocks = (n + BlockSize - 1) / BlockSize
    val lastDocIds = new Array[Long](numBlocks)
    val maxImpacts = new Array[Float](numBlocks)
    val offsets = new Array[Int](numBlocks)
    // worst case 10 bytes per value: 2 values per posting + tf positions.
    // Size in Long and fail LOUDLY past Int — a ~214M-position list would
    // otherwise overflow to a NegativeArraySizeException deep in pack.
    val numPos = if (positions == null) 0L else {
      var s = 0L; var i = 0; while (i < n) { s += tfs(i); i += 1 }; s
    }
    val bufLen: Long = (2L * n + numPos) * VByte.MaxBytes
    require(bufLen <= Int.MaxValue,
      s"posting list too large to pack in one segment: $n docs, $numPos " +
        s"positions need $bufLen worst-case bytes (> Int.MaxValue) — " +
        "shrink bucketSize so per-(bucket,term) lists stay bounded")
    val buf = new Array[Byte](bufLen.toInt)
    var pos = 0
    var b = 0
    var prev = -1L
    var i = 0
    while (b < numBlocks) {
      offsets(b) = pos
      val end = math.min(i + BlockSize, n)
      var mx = 0.0
      while (i < end) {
        val d = docIds(i)
        require(d > prev, s"docIds not strictly increasing: $d after $prev")
        pos = VByte.encode(d - prev, buf, pos)
        pos = VByte.encode(tfs(i).toLong, buf, pos)
        if (positions != null) {
          val ps = positions(i)
          require(ps.length == tfs(i),
            s"posting needs tf=${tfs(i)} positions, got ${ps.length}")
          var pprev = -1L
          var j = 0
          while (j < ps.length) {
            require(ps(j) > pprev, "positions must be strictly increasing")
            pos = VByte.encode(ps(j) - pprev, buf, pos)
            pprev = ps(j)
            j += 1
          }
        }
        if (impacts(i) > mx) mx = impacts(i)
        prev = d
        i += 1
      }
      lastDocIds(b) = prev
      maxImpacts(b) = upperFloat(mx)
      b += 1
    }
    Packed(n, lastDocIds, maxImpacts, offsets, java.util.Arrays.copyOf(buf, pos))
  }

  /** Decode all docIds (test/oracle path). */
  def decodeDocIds(p: Packed): Array[Long] = {
    val out = new Array[Long](p.numDocs)
    val c = cursor(p)
    var i = 0
    while (i < p.numDocs) { out(i) = c.docId; c.next(); i += 1 }
    out
  }

  /** Decode all (docId, tf) pairs (test/oracle path). */
  def decodeAll(p: Packed, positional: Boolean = false): (Array[Long], Array[Int]) = {
    val ids = new Array[Long](p.numDocs)
    val tfs = new Array[Int](p.numDocs)
    val c = cursor(p, positional)
    var i = 0
    while (i < p.numDocs) { ids(i) = c.docId; tfs(i) = c.tf; c.next(); i += 1 }
    (ids, tfs)
  }

  /** Decode all (docId, tf, positions) of a positional list
    * (test/merge/oracle path). */
  def decodeAllPos(p: Packed): (Array[Long], Array[Int], Array[Array[Int]]) = {
    val ids = new Array[Long](p.numDocs)
    val tfs = new Array[Int](p.numDocs)
    val poss = new Array[Array[Int]](p.numDocs)
    val c = cursor(p, positional = true)
    var i = 0
    while (i < p.numDocs) {
      ids(i) = c.docId; tfs(i) = c.tf; poss(i) = c.positions(); c.next(); i += 1
    }
    (ids, tfs, poss)
  }

  def cursor(p: Packed, positional: Boolean = false): Cursor =
    new Cursor(p.numDocs, p.lastDocIds, p.maxImpacts, p.offsets, p.bytes,
      positional)

  /** Forward-only posting cursor with block skipping — the WAND walk's
    * primitive. After construction it is positioned ON the first posting;
    * `exhausted` flips when advanced past the end.
    *
    * `positional` MUST match how the list was packed: a positional
    * stream read by a non-positional cursor (or vice versa) misparses.
    * Scoring walks over positional lists pay only a continuation-bit
    * scan per posting; `positions()` decodes the current posting's
    * occurrence indices on demand (phrase intersection only).
    */
  final class Cursor(
      val numDocs: Int,
      lastDocIds: Array[Long],
      maxImpacts: Array[Float],
      offsets: Array[Int],
      bytes: Array[Byte],
      val positional: Boolean = false) {

    private val numBlocks = lastDocIds.length
    private val vb = new VByte.Cursor(bytes, 0)
    private var block = 0
    private var inBlock = 0        // postings consumed in current block
    private var cur = -1L
    private var curTf = 0
    // declared BEFORE the readOne() initializer block: field init order
    // would otherwise zero it after the first posting is read
    private var posStart = 0
    var exhausted: Boolean = false

    { readOne() } // position on first posting

    @inline def docId: Long = cur
    @inline def tf: Int = curTf
    /** Upper bound of BM25 impact within the current block. */
    @inline def blockMax: Float = maxImpacts(block)
    /** Last docId of the current block (block-max WAND shallow pointer). */
    @inline def blockLast: Long = lastDocIds(block)
    /** Global upper bound across the whole list. */
    lazy val listMax: Float = {
      var m = 0f; var i = 0
      while (i < numBlocks) { if (maxImpacts(i) > m) m = maxImpacts(i); i += 1 }
      m
    }

    private def blockLen(b: Int): Int =
      math.min(BlockSize, numDocs - b * BlockSize)

    private def readOne(): Unit = {
      val gap = vb.read()
      cur += gap
      curTf = vb.read().toInt
      if (positional) { posStart = vb.pos; vb.skip(curTf) }
      inBlock += 1
    }

    /** Decode the current posting's positions (ascending, length == tf).
      * Allocates — called only on phrase-aligned candidates, never in
      * the scoring hot loop. */
    def positions(): Array[Int] = {
      require(positional, "positions() on a non-positional list")
      val c = new VByte.Cursor(bytes, posStart)
      val out = new Array[Int](curTf)
      var p = -1L
      var j = 0
      while (j < curTf) { p += c.read(); out(j) = p.toInt; j += 1 }
      out
    }

    /** Advance one posting. */
    def next(): Unit = {
      if (block * BlockSize + inBlock >= numDocs) { exhausted = true; return }
      if (inBlock >= BlockSize) { block += 1; inBlock = 0 } // cur already = prev block's last
      readOne()
    }

    /** Advance to the first posting with docId >= target. */
    def nextGeq(target: Long): Unit = {
      if (exhausted || cur >= target) return
      // find target block: first block whose lastDocId >= target
      if (lastDocIds(block) < target) {
        var lo = block + 1
        var hi = numBlocks - 1
        if (lo > hi || lastDocIds(hi) < target) { exhausted = true; return }
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (lastDocIds(mid) < target) lo = mid + 1 else hi = mid
        }
        // jump: reset decode state to start of block lo
        block = lo
        inBlock = 0
        cur = lastDocIds(lo - 1)
        vb.seek(offsets(lo))
        readOne()
      }
      while (cur < target) {
        if (block * BlockSize + inBlock >= numDocs) { exhausted = true; return }
        if (inBlock >= BlockSize) { block += 1; inBlock = 0 }
        readOne()
      }
    }

    /** Skip directly past the current block (block-max WAND deep skip):
      * position on first posting with docId > current block's last. */
    def skipBlock(): Unit = nextGeq(lastDocIds(block) + 1)
  }
}
