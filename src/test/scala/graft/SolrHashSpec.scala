package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.SolrHash.lookup3ycs64

/** Pins lookup3ycs64 against the reference's C-derived golden vectors
  * (`solr/solrj/src/test/org/apache/solr/common/util/TestHash.java:29`:
  * hashword over "hello world" prefixes with initval i*12345; ycs adds
  * the (len<<2) bias, and ycs64's low 32 bits equal ycs when the
  * initval's high bits are zero — `Hash.java:181-184`).
  */
class SolrHashSpec extends AnyFunSuite {

  private val goldens = Array(0xc4c20dd5, 0x3ab04cc3, 0xebe874a3,
    0x0e770ef3, 0xec321498, 0x73845e86, 0x8a2db728, 0x03c313bb,
    0xfe5b9199, 0x95965125, 0xcbc4e7c2)

  test("low 32 bits match the published lookup3 vectors") {
    val s = "hello world"
    for (i <- 0 until s.length) {
      val len = i + 1
      val h = lookup3ycs64(s, 0, len, (i * 12345 + (len << 2)).toLong)
      assert(h.toInt == goldens(i), s"prefix len $len")
    }
  }

  test("chained signature is not the hash of the concatenation") {
    // Lookup3Signature.add chains the 64-bit state value-by-value —
    // each add restarts the triple cycle from the chained seed
    val chained = lookup3ycs64("world", 0, 5,
      lookup3ycs64("hello", 0, 5, 0L))
    assert(chained != lookup3ycs64("helloworld", 0, 10, 0L))
  }

  test("surrogate pairs hash as one code point") {
    val s = "a😀b" // a, 😀, b — 3 code points, 4 chars
    val jsb = new java.lang.StringBuilder().append('a')
    jsb.appendCodePoint(0x1F600)
    val t = jsb.append('b').toString
    assert(lookup3ycs64(s, 0, s.length, 7L) ==
      lookup3ycs64(t, 0, t.length, 7L))
    // empty input returns the seeded state without final()
    assert(lookup3ycs64("", 0, 0, 0L) ==
      (0xdeadbeef.toLong + (0xdeadbeefL << 32)))
  }
}
