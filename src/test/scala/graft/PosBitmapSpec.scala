package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PosBitmap

/** The compressed delete-position container behind the merge-on-read
  * reader (VERDICT r12 item 2): set semantics vs a reference HashSet
  * under the reader's strictly-ascending probe pattern, the
  * sparse→dense container crossover, chunk boundaries, duplicates,
  * and the memory bound the structure exists for.
  */
class PosBitmapSpec extends AnyFunSuite {

  private def build(ps: Seq[Long]): PosBitmap = {
    val b = new PosBitmap.Builder
    ps.foreach(b.add)
    b.result()
  }

  private def probeAll(bm: PosBitmap, upTo: Long): Set[Long] = {
    val cur = bm.cursor
    (0L to upTo).filter(cur.contains).toSet
  }

  test("randomized set semantics vs reference under ascending probes") {
    val rnd = new scala.util.Random(42)
    // mixed density: a dense run (forces bitmap containers), sparse
    // scatter across far chunks, duplicates
    val dense = (100000L to 140000L).filter(_ => rnd.nextBoolean())
    val sparse = Seq.fill(500)(rnd.nextLong(1L << 40).abs)
    val dups = sparse.take(100) ++ dense.take(100)
    val all = dense ++ sparse ++ dups
    val bm = build(rnd.shuffle(all))
    val ref = all.toSet
    assert(bm.cardinality == ref.size.toLong)
    // ascending probe over the exact positions plus near-misses
    val probes = (ref ++ ref.map(_ + 1) ++ ref.map(_ - 1).filter(_ >= 0))
      .toSeq.sorted
    val cur = bm.cursor
    probes.foreach { p =>
      assert(cur.contains(p) == ref(p), s"mismatch at $p")
    }
  }

  test("sparse to dense conversion at the container threshold") {
    // 5000 entries in ONE chunk — crosses ArrayMax=4096 mid-build
    val ps = (0 until 5000).map(i => 65536L + i * 13 % 65536).distinct
    val bm = build(scala.util.Random.shuffle(ps))
    assert(bm.cardinality == ps.size.toLong)
    assert(probeAll(bm, 2 * 65536L) == ps.toSet)
  }

  test("chunk boundaries, zero, and empty") {
    val ps = Seq(0L, 65535L, 65536L, 65537L, 131071L, 131072L)
    val bm = build(ps)
    assert(probeAll(bm, 140000L) == ps.toSet)
    assert(PosBitmap.empty.isEmpty)
    assert(!PosBitmap.empty.cursor.contains(0L))
    assert(build(Nil).isEmpty)
  }

  test("duplicates are absorbed, not double-skipped") {
    // the hazard the old sorted-array dedup guarded: a duplicate
    // position must delete ONE row, never suppress the next
    val bm = build(Seq(7L, 7L, 7L, 8L))
    val cur = bm.cursor
    assert(cur.contains(7L) && cur.contains(8L) && !cur.contains(9L))
    assert(bm.cardinality == 2L)
  }

  test("dense memory stays ~1 bit/position, far under 8 B/position") {
    // 50% of a 2M-row file deleted (every other position): all chunks
    // dense — the shape that cost 8 B/position as a raw Array[Long]
    val n = 1000000
    val b = new PosBitmap.Builder
    var i = 0L
    while (i < 2L * n) { b.add(i); i += 2 }
    val bm = b.result()
    assert(bm.cardinality == n.toLong)
    // 1 bit per position-space slot = 2 bits per deleted position at
    // 50% density, plus per-chunk overhead — vs 64 bits raw
    assert(bm.sizeBytes < n / 3L,
      s"bitmap ${bm.sizeBytes} B for $n positions — compression lost")
    // spot-check the parity structure with an ascending cursor
    val cur = bm.cursor
    (0L until 1000L).foreach(p =>
      assert(cur.contains(p) == (p % 2 == 0)))
  }
}
