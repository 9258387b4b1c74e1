package graft.pipeline

/** md5-based portable hashing shared by the curation/fingerprint
  * operators — the ONE hash family both engines compute identically
  * (DuckDB's `md5()` yields the same hex). A thread-local digest is
  * reused across calls: the per-gram/per-token paths (winnow, DSIR)
  * hash hundreds of thousands of strings per partition, and a fresh
  * `MessageDigest.getInstance` per call dominated their profile. */
object PortableHash {
  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First `n` hex chars of md5(s), n <= 15 (fits a non-negative Long). */
  def md5HexPrefixLong(s: String, n: Int): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    // n hex chars = ceil(n/2) bytes; build the value directly — no
    // intermediate hex string
    var v = 0L
    var i = 0
    while (i < n) {
      val b = d(i / 2) & 0xff
      val nibble = if (i % 2 == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nibble
      i += 1
    }
    v
  }
}
