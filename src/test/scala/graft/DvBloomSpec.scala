package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DvBloom

/** The DV manifest's wide-DML key-scoping filter: zero false
  * negatives by construction, useful false-positive rate at realistic
  * widths, lossless trim-encoded round-trip.
  */
class DvBloomSpec extends AnyFunSuite {

  private def keys(n: Int, prefix: String): Seq[String] =
    (0 until n).map(i => f"data/$prefix/part-$i%05d-deadbeef.parquet")

  test("no false negatives at any width, round-tripped through encode") {
    Seq(10, 100, 5000).foreach { n =>
      val ks = keys(n, "a")
      val bits = DvBloom.decode(DvBloom.encode(DvBloom.ofKeys(ks)))
      ks.foreach(k => assert(DvBloom.mightContain(bits, k),
        s"false negative at width $n: $k"))
    }
  }

  test("false positives stay rare at the wide-MERGE width") {
    // 1000 covered keys, 10000 disjoint probes: fp ~7e-8 in theory,
    // assert a generous 0.5%
    val bits = DvBloom.ofKeys(keys(1000, "covered"))
    val fp = keys(10000, "other").count(DvBloom.mightContain(bits, _))
    assert(fp <= 50, s"$fp false positives of 10000 probes")
  }

  test("trim-encoded round-trip is lossless; separators never collide") {
    val bits = DvBloom.ofKeys(keys(3, "tiny"))
    val enc = DvBloom.encode(bits)
    assert(enc.length <= 21848, s"encoding exceeds the full filter: ${enc.length}")
    val back = DvBloom.decode(enc)
    keys(3, "tiny").foreach(k => assert(DvBloom.mightContain(back, k)))
    assert(!keys(100, "absent").forall(DvBloom.mightContain(back, _)))
    // base64 never collides with the manifest's field separators
    assert(!enc.contains(":") && !enc.contains(",") && !enc.contains("~"))
  }
}
