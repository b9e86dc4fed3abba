package graft.sources

/** Bloom filter over the data-FILE KEYS a position-delete file covers
  * — the manifest scoping for DMLs too wide for an exact key list
  * (VERDICT r12 item 3: past [[DeltaDml.DvKeyCap]] the entry used to
  * record "unknown" and ship its DV to EVERY partition, which is the
  * common case for a 100-TB MERGE touching thousands of files).
  * False-positive-only by construction: a hit means "probe this DV
  * file's parquet footer", a miss means the statement provably never
  * deleted from that file — extra probes possible, missed deletes
  * impossible.
  *
  * Fixed geometry (m = 2^17 bits = 16 KiB, k = 5), standard
  * double-hashing (Kirsch & Mitzenmacher 2006: g_i = h1 + i·h2) over
  * FNV-1a 64 with a splitmix64-style finalizer for the second hash.
  * False-positive rate ≈ (1−e^(−kn/m))^k: ~7e-8 at 1k keys, ~0.3% at
  * 10k, degrading gracefully to footer probes far beyond that. The
  * encoded form (base64 of little-endian words, trailing zero words
  * trimmed) rides the manifest's `#dv=` line: ~22 KB for a saturated
  * filter, written only by statements wide enough to need it.
  */
object DvBloom {

  val Bits: Int = 1 << 17
  private val Words = Bits / 64
  val K: Int = 5

  def create(): Array[Long] = new Array[Long](Words)

  private def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def add(bits: Array[Long], key: String): Unit = {
    val h1 = fnv1a(key)
    val h2 = mix(h1) | 1L // odd: full-period stepping
    var i = 0
    while (i < K) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, Bits).toInt
      bits(idx >>> 6) |= 1L << (idx & 63)
      i += 1
    }
  }

  def mightContain(bits: Array[Long], key: String): Boolean = {
    val h1 = fnv1a(key)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < K) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, Bits).toInt
      val w = idx >>> 6
      if (w >= bits.length || (bits(w) & (1L << (idx & 63))) == 0L)
        return false
      i += 1
    }
    true
  }

  def ofKeys(keys: Iterable[String]): Array[Long] = {
    val b = create()
    keys.foreach(add(b, _))
    b
  }

  /** Base64 of the little-endian words with trailing zero words
    * trimmed — [[decode]] treats absent words as zero, so trim is
    * lossless.
    */
  def encode(bits: Array[Long]): String = {
    var n = bits.length
    while (n > 0 && bits(n - 1) == 0L) n -= 1
    val bb = java.nio.ByteBuffer.allocate(n * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { bb.putLong(bits(i)); i += 1 }
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  def decode(s: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(s)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }
}
