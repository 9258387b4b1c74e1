package graft.codec

/** Variable-byte (LEB128-style) codec for non-negative Longs.
  *
  * Standard IR gap compression per Zobel & Moffat, "Inverted Files for
  * Text Search Engines", ACM CS 2006 (SURVEY.md [P:ZM06]); the reference
  * tree was empty at survey time (SURVEY.md §0) so no file:line citation
  * is possible — this is the textbook encoding, 7 payload bits per byte,
  * high bit = continuation.
  *
  * Pure Scala, zero Spark deps.
  */
object VByte extends Serializable {

  /** Max encoded size of one Long (ceil(64/7) = 10 bytes). */
  final val MaxBytes = 10

  /** Append encoding of v (must be >= 0) into buf at pos; returns new pos. */
  def encode(v: Long, buf: Array[Byte], pos: Int): Int = {
    require(v >= 0, s"VByte encodes non-negative values, got $v")
    var x = v
    var p = pos
    while ((x & ~0x7fL) != 0) {
      buf(p) = ((x & 0x7f) | 0x80).toByte
      p += 1
      x >>>= 7
    }
    buf(p) = x.toByte
    p + 1
  }

  /** Number of bytes encode(v) will write. */
  def sizeOf(v: Long): Int = {
    var x = v; var n = 1
    while ((x & ~0x7fL) != 0) { n += 1; x >>>= 7 }
    n
  }

  /** Decode one value starting at pos; returns (value, nextPos) packed as
    * value in the return and nextPos via the cursor. Use [[Cursor]] for
    * sequential decoding without allocation. */
  def decode(buf: Array[Byte], pos: Int): Long = {
    var p = pos
    var shift = 0
    var v = 0L
    var b = buf(p)
    while ((b & 0x80) != 0) {
      v |= (b & 0x7fL) << shift
      shift += 7
      p += 1
      b = buf(p)
    }
    v | ((b & 0x7fL) << shift)
  }

  /** Sequential decoder over a byte array — the hot-path form. */
  final class Cursor(val buf: Array[Byte], var pos: Int) {
    def read(): Long = {
      var shift = 0
      var v = 0L
      var b = buf(pos)
      while ((b & 0x80) != 0) {
        v |= (b & 0x7fL) << shift
        shift += 7
        pos += 1
        b = buf(pos)
      }
      pos += 1
      v | ((b & 0x7fL) << shift)
    }
    def seek(p: Int): Unit = pos = p
    /** Skip n encoded values without decoding them: scan continuation
      * bits only — the positional-postings cursor uses this so scoring
      * walks never pay full position decode. */
    def skip(n: Int): Unit = {
      var i = 0
      while (i < n) {
        while ((buf(pos) & 0x80) != 0) pos += 1
        pos += 1
        i += 1
      }
    }
  }
}
