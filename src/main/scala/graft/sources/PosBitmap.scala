package graft.sources

/** Compressed set of deleted row POSITIONS for one data file — the
  * merge-on-read skip list each [[GraftDeltaPartition]] loads
  * executor-side (VERDICT r12 item 2: a raw sorted `Array[Long]` costs
  * 8 B per deleted position, ~512 MB of executor memory for a
  * 128M-row file at 50% deleted, before the scan reads a byte).
  *
  * Two-level container design (the public roaring-bitmap layout,
  * Chambi et al., "Better bitmap performance with Roaring bitmaps",
  * 2016): the position space splits into 2^16-wide chunks keyed by
  * `pos >>> 16`; a chunk holds either a sorted `Array[Char]` of low-16
  * values (sparse: ≤ [[PosBitmap.ArrayMax]] entries, 2 B/position) or
  * an 8 KiB `Array[Long]` bitmap (dense: 1 bit/position regardless of
  * count). Worst case is therefore ~8 KiB per occupied chunk — the
  * 50%-deleted 128M-row file costs ~16 MB instead of ~512 MB — and a
  * trickle delete of a few rows costs a few bytes.
  *
  * Querying is a [[PosBitmap.Cursor]] over STRICTLY ASCENDING
  * positions — exactly the delta reader's access pattern (`pos`
  * increments by one per row in file order), so membership is O(1)
  * amortized: the cursor walks chunk keys and sparse arrays forward,
  * never searching. Duplicate adds are absorbed (set semantics), which
  * also replaces the old array path's explicit sort+dedup.
  */
final class PosBitmap private (
    keys: Array[Long], containers: Array[AnyRef],
    val cardinality: Long) {

  def isEmpty: Boolean = keys.length == 0

  /** Approximate retained bytes (diagnostics: the rehearsal's DV
    * memory recording).
    */
  def sizeBytes: Long = {
    var b = 16L + keys.length * 8L
    var i = 0
    while (i < containers.length) {
      b += (containers(i) match {
        case bm: Array[Long] => bm.length * 8L
        case arr: Array[Char] => arr.length * 2L
      }) + 16L
      i += 1
    }
    b
  }

  /** Monotone membership cursor: `contains` MUST be called with
    * non-decreasing positions (file order). One cursor per reader.
    */
  final class Cursor {
    private var ci = 0
    private var ai = 0

    def contains(pos: Long): Boolean = {
      val hi = pos >>> 16
      while (ci < keys.length && keys(ci) < hi) { ci += 1; ai = 0 }
      if (ci >= keys.length || keys(ci) != hi) return false
      val low = (pos & 0xFFFFL).toInt
      containers(ci) match {
        case bm: Array[Long] =>
          (bm(low >>> 6) & (1L << (low & 63))) != 0L
        case arr: Array[Char] =>
          while (ai < arr.length && arr(ai) < low) ai += 1
          ai < arr.length && arr(ai) == low
      }
    }
  }

  def cursor: Cursor = new Cursor
}

object PosBitmap {

  /** Sparse→dense conversion threshold (raw adds, duplicates
    * included): past 4096 entries an 8 KiB bitmap is never larger than
    * the 2 B/entry array, so this is the memory crossover — the same
    * constant the roaring design uses.
    */
  private[sources] val ArrayMax = 4096

  val empty: PosBitmap = new PosBitmap(Array.empty, Array.empty, 0L)

  /** Streaming builder: O(8 KiB) per occupied chunk at peak, no global
    * sort — positions arrive in whatever order the DV parquet files
    * yield them.
    */
  final class Builder {
    // chunk key -> growable Array[Char] (boxed in a tiny holder) or
    // Array[Long](1024) bitmap
    private final class Sparse {
      var arr = new Array[Char](32)
      var n = 0
      def add(low: Char): Unit = {
        if (n == arr.length) arr = java.util.Arrays.copyOf(arr, n * 2)
        arr(n) = low
        n += 1
      }
    }
    private val chunks =
      scala.collection.mutable.LongMap.empty[AnyRef]

    def add(pos: Long): Unit = {
      require(pos >= 0, s"negative delete position $pos")
      val hi = pos >>> 16
      val low = (pos & 0xFFFFL).toChar
      chunks.getOrNull(hi) match {
        case null =>
          val s = new Sparse
          s.add(low)
          chunks.update(hi, s)
        case bm: Array[Long] =>
          bm(low >>> 6) |= 1L << (low & 63)
        case s: Sparse =>
          if (s.n < ArrayMax) s.add(low)
          else { // convert to bitmap, then set
            val bm = new Array[Long](1024)
            var i = 0
            while (i < s.n) { val v = s.arr(i); bm(v >>> 6) |= 1L << (v & 63); i += 1 }
            bm(low >>> 6) |= 1L << (low & 63)
            chunks.update(hi, bm)
          }
      }
    }

    def result(): PosBitmap = {
      val keys = chunks.keysIterator.toArray
      java.util.Arrays.sort(keys)
      val containers = new Array[AnyRef](keys.length)
      var card = 0L
      var i = 0
      while (i < keys.length) {
        containers(i) = chunks(keys(i)) match {
          case bm: Array[Long] =>
            var j = 0
            while (j < bm.length) { card += java.lang.Long.bitCount(bm(j)); j += 1 }
            bm
          case s: Sparse =>
            val a = java.util.Arrays.copyOf(s.arr, s.n)
            java.util.Arrays.sort(a)
            // dedup in place (duplicate positions across DV files)
            var w = 0; var r = 0
            while (r < a.length) {
              if (w == 0 || a(r) != a(w - 1)) { a(w) = a(r); w += 1 }
              r += 1
            }
            card += w
            if (w == a.length) a else java.util.Arrays.copyOf(a, w)
        }
        i += 1
      }
      if (keys.isEmpty) PosBitmap.empty
      else new PosBitmap(keys, containers, card)
    }
  }
}
