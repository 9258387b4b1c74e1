package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Portable Bloom-filter membership prefilter (Bloom, CACM 13(7),
  * 1970; the classic k-hash bit-array form): a blocklist of keys is
  * summarized into an m-bit array (bit h_i(key) set for each of k
  * hashes), and a candidate tests positive iff ALL k of its bits are
  * set — no false negatives ever, false positives at rate ≈ (1−e^{−kn/m})^k.
  *
  * The 100 TB use: a takedown / contamination blocklist of many
  * millions of keys won't broadcast as an exact set, but its Bloom
  * image is m/8 bytes REGARDLESS of key count — so the corpus-wide
  * membership join collapses to a narrow broadcast-bitset filter, and
  * the exact verification join runs only over the bloom-POSITIVE
  * survivors (result-sized, not corpus-sized).
  *
  * Determinism/portability: bit positions come from the repo's
  * md5-portable family — h_i(key) = md5("i:key") 15-hex prefix mod m —
  * so the positive set (false positives included!) is bit-identical
  * across engines and parallelism, and the DuckDB twin reproduces it
  * from the same hex digests.
  */
object Bloom {

  final case class Params(bits: Int = 1 << 16, hashes: Int = 4) {
    require(bits >= 1, s"bits must be >= 1, got $bits")
    // the bit array is driver-built and broadcast: bound it to 16 MiB
    // (2^27 bits) so a mis-sized parameter fails loudly here instead of
    // as a driver OOM in build()'s collect
    require(bits <= (1 << 27), s"bits must be <= 2^27 (16 MiB), got $bits")
    require(hashes >= 1, s"hashes must be >= 1, got $hashes")
  }

  /** h_i(key) for i in [0, hashes) — the driver/test/SQL-twin rule. */
  def positions(key: String, p: Params): Seq[Int] =
    (0 until p.hashes)
      .map(i => (PortableHash.md5HexPrefixLong(s"$i:$key", 15) % p.bits).toInt)

  /** Membership test against the packed bit words. */
  def mightContain(key: String, words: Array[Long], p: Params): Boolean =
    positions(key, p).forall(pos => (words(pos >>> 6) >>> (pos & 63) & 1L) == 1L)

  /** Build the m-bit array from a key table (column `key`). The
    * distinct-position aggregation is corpus-scale work but its output
    * is ≤ min(bits, k·|keys|) ints, and the collect is bounded by the
    * PARAMETER m/64 words — corpus-independent by construction (the
    * point of the filter). */
  def build(keys: DataFrame, p: Params): Array[Long] = {
    val spark = keys.sparkSession
    val setPos = keys
      .select(explode(sequence(lit(0), lit(p.hashes - 1))).as("i"), col("key"))
      .select(
        (conv(substring(md5(concat(col("i").cast("string"), lit(":"), col("key"))),
          1, 15), 16, 10).cast("long") % p.bits).cast("int").as("pos"))
      .distinct()
      .collect().map(_.getInt(0))
    val words = new Array[Long]((p.bits + 63) >>> 6)
    setPos.foreach(pos => words(pos >>> 6) |= 1L << (pos & 63))
    words
  }

  /** Bloom-prefiltered blocklist check over a (doc_id, text) corpus:
    * keys are sha256(text); output = the bloom-POSITIVE docs with an
    * `exact` flag from the verification join (false positives carry
    * exact = false). The corpus pays ONE narrow broadcast-bitset
    * filter pass — zero shuffles — and only the positive survivors
    * (plus the blocklist) enter the exact-verify join. */
  def prefilter(docs: DataFrame, blockKeys: DataFrame, p: Params): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = spark.sparkContext.broadcast(build(blockKeys, p))
    val positives = docs
      .select(col("doc_id"), sha2(col("text"), 256).as("key"))
      .as[(Long, String)]
      .filter(r => mightContain(r._2, words.value, p))
      .toDF("doc_id", "key")
    positives
      .join(blockKeys.select(col("key"), lit(true).as("exact")).distinct(),
        Seq("key"), "left")
      .na.fill(false, Seq("exact"))
      .select(col("doc_id"), col("exact"))
      .orderBy("doc_id")
  }
}
