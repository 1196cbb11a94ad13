package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.search.LevDfa

/** LevDfa language == plain Levenshtein ≤ maxEdits, pinned against an
  * independent textbook DP over randomized patterns/words (including
  * off-alphabet chars, which exercise the "other" character class).
  */
class LevDfaSpec extends AnyFunSuite {

  private def edit(a: String, b: String): Int = {
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    for (j <- 0 to b.length) prev(j) = j
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
      }
      System.arraycopy(cur, 0, prev, 0, b.length + 1)
    }
    prev(b.length)
  }

  test("hand cases: deletion-then-match paths (the subsumption trap)") {
    val d = LevDfa.build("ab", 1)
    assert(d.accepts("b")) // delete 'a', match 'b'
    assert(d.accepts("a")) // match 'a', delete 'b'
    assert(d.accepts("ab") && d.accepts("ax") && d.accepts("xb"))
    assert(d.accepts("abc") && d.accepts("aab"))
    assert(!d.accepts("") && !d.accepts("xy") && !d.accepts("abcd"))
    val d2 = LevDfa.build("abc", 2)
    assert(d2.accepts("c")) // two deletions
    assert(!d2.accepts(""))
    assert(LevDfa.build("abc", 2).accepts("cba") == (edit("cba", "abc") <= 2))
  }

  test("edits 0 accepts exactly the pattern") {
    val d = LevDfa.build("spark", 0)
    assert(d.accepts("spark"))
    assert(!d.accepts("spar") && !d.accepts("sparks") && !d.accepts("spork"))
  }

  test("empty pattern: accepts strings of length <= maxEdits") {
    for (e <- 0 to 2; w <- Seq("", "a", "ab", "abc"))
      assert(LevDfa.build("", e).accepts(w) == (w.length <= e), s"e=$e w=$w")
  }

  test("20k randomized trials agree with the textbook DP") {
    val rnd = new scala.util.Random(4242L)
    val alpha = "abcxyz" // small alphabet → high collision rate
    def word(n: Int): String =
      Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 2000) {
      val t = word(1 + rnd.nextInt(8))
      for (e <- 0 to 2) {
        val d = LevDfa.build(t, e)
        for (_ <- 1 to 3) {
          // mix: fresh random words + mutations of t + off-alphabet chars
          val w0 = rnd.nextInt(3) match {
            case 0 => word(rnd.nextInt(10))
            case 1 => // mutate t
              val chars = t.toBuffer
              for (_ <- 0 to rnd.nextInt(3)) {
                if (chars.nonEmpty) rnd.nextInt(3) match {
                  case 0 => chars.remove(rnd.nextInt(chars.length))
                  case 1 => chars.insert(rnd.nextInt(chars.length + 1),
                    alpha(rnd.nextInt(alpha.length)))
                  case _ => chars(rnd.nextInt(chars.length)) =
                    alpha(rnd.nextInt(alpha.length))
                }
              }
              chars.mkString
            case _ => word(rnd.nextInt(6)) + "#Q" // off-alphabet class
          }
          assert(d.accepts(w0) == (edit(w0, t) <= e),
            s"pattern=$t e=$e word=$w0 dp=${edit(w0, t)}")
        }
      }
    }
  }

  test("state count stays small (parametric-table scale)") {
    for (t <- Seq("a", "spark", "interpolation", "aaaaaaaa"); e <- 0 to 2)
      assert(LevDfa.build(t, e).numStates <= 40 * (t.length + 1),
        s"$t/$e blew up: ${LevDfa.build(t, e).numStates}")
  }
}
