package graft.core

/** Solr's cross-platform string hash (`solr/solrj/src/java/org/apache/
  * solr/common/util/Hash.java:185-240` — Yonik Seeley's lookup3ycs64,
  * built on Bob Jenkins' public-domain lookup3 hashlittle2 with the
  * initval biased by −(numCodePoints<<2)): unicode CODE POINTS are
  * consumed three at a time into (a, b, c); the 6-step rotate mix runs
  * only when more input FOLLOWS a completed triple, and the 7-step
  * final() runs exactly when the input ended mid-cycle (so an exhausted
  * stream always finalizes, and an empty one returns the seeded state
  * untouched — the published law, transcribed). An unpaired high
  * surrogate followed by any char consumes both via toCodePoint, exactly
  * like the reference's unchecked `toCodePoint(ch, s.charAt(i++))`.
  *
  * The low 32 bits equal lookup3ycs when initval's high bits are zero —
  * SolrHashSpec pins them against the reference's C-derived golden
  * vectors ("hello world" prefixes, TestHash.java:29).
  */
object SolrHash {

  def lookup3ycs64(s: CharSequence, start: Int, end: Int,
      initval: Long): Long = {
    var a = 0xdeadbeef + initval.toInt
    var b = a
    var c = a + (initval >>> 32).toInt
    var i = start
    var mixed = true
    var done = false

    @inline def cp(): Int = {
      val ch = s.charAt(i); i += 1
      if (Character.isHighSurrogate(ch) && i < end) {
        val lo = s.charAt(i); i += 1
        Character.toCodePoint(ch, lo)
      } else ch.toInt
    }

    while (!done) {
      if (i >= end) done = true
      else {
        mixed = false
        a += cp()
        if (i >= end) done = true
        else {
          b += cp()
          if (i >= end) done = true
          else {
            c += cp()
            if (i >= end) done = true
            else {
              // mix(a,b,c)
              a -= c; a ^= (c << 4) | (c >>> -4); c += b
              b -= a; b ^= (a << 6) | (a >>> -6); a += c
              c -= b; c ^= (b << 8) | (b >>> -8); b += a
              a -= c; a ^= (c << 16) | (c >>> -16); c += b
              b -= a; b ^= (a << 19) | (a >>> -19); a += c
              c -= b; c ^= (b << 4) | (b >>> -4); b += a
              mixed = true
            }
          }
        }
      }
    }

    if (!mixed) {
      // final(a,b,c)
      c ^= b; c -= (b << 14) | (b >>> -14)
      a ^= c; a -= (c << 11) | (c >>> -11)
      b ^= a; b -= (a << 25) | (a >>> -25)
      c ^= b; c -= (b << 16) | (b >>> -16)
      a ^= c; a -= (c << 4) | (c >>> -4)
      b ^= a; b -= (a << 14) | (a >>> -14)
      c ^= b; c -= (b << 24) | (b >>> -24)
    }

    // the reference adds the SIGN-EXTENDED int c to (long)b << 32
    // (`Hash.java:239` `return c + (((long)b) << 32)`) — not a mask
    c.toLong + (b.toLong << 32)
  }
}
