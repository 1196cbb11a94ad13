package graft.core

/** Porter stemming, release 3 — the algorithm of Porter 1980 ("An
  * algorithm for suffix stripping", Program 14(3) pp 130-137) with the
  * author's two published release-3 departures from the paper
  * (step-2 `bli→ble` instead of `abli→able`, and the extra `logi→log`
  * rule), matching the reference's canonical transcription
  * (`lucene/analysis/common/src/java/org/apache/lucene/analysis/en/PorterStemmer.java`,
  * verified word-for-word against its 23,531-entry published test
  * vocabulary `en/porterTestData.zip` in PorterSpec).
  *
  * Structure here is a data-driven rule scan (ordered suffix tables with
  * measure guards) over a (buffer, end) cursor — not the reference's
  * penultimate-character switch; the flat first-match order reproduces
  * the switch because each suffix determines its own penultimate
  * character and within-group order is preserved.
  */
object Porter {

  private final case class Rule(suffix: String, repl: String)

  // step 2 (m > 0): double-to-single suffix mappings, release-3 set.
  private val Step2: Array[Rule] = Array(
    Rule("ational", "ate"), Rule("tional", "tion"),
    Rule("enci", "ence"), Rule("anci", "ance"),
    Rule("izer", "ize"),
    Rule("bli", "ble"), // release 3 (paper had abli→able)
    Rule("alli", "al"), Rule("entli", "ent"), Rule("eli", "e"),
    Rule("ousli", "ous"),
    Rule("ization", "ize"), Rule("ation", "ate"), Rule("ator", "ate"),
    Rule("alism", "al"), Rule("iveness", "ive"), Rule("fulness", "ful"),
    Rule("ousness", "ous"),
    Rule("aliti", "al"), Rule("iviti", "ive"), Rule("biliti", "ble"),
    Rule("logi", "log")) // release 3 addition

  // step 3 (m > 0)
  private val Step3: Array[Rule] = Array(
    Rule("icate", "ic"), Rule("ative", ""), Rule("alize", "al"),
    Rule("iciti", "ic"), Rule("ical", "ic"), Rule("ful", ""),
    Rule("ness", ""))

  // step 4 (m > 1): bare deletions; "ion" carries the extra *S-or-*T
  // stem condition, handled inline below.
  private val Step4: Array[String] = Array(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant",
    "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
    "ous", "ive", "ize")

  /** Stem one lowercase word. Words shorter than 3 chars are returned
    * unchanged (the reference's `k > k0+1` guard).
    */
  def stem(word: String): String = {
    if (word.length < 3) return word
    // +1 headroom: the only growing rewrites (at→ate, bl→ble, iz→ize,
    // the cvc +e, ies→i after shrink) never exceed original length + 1
    val b = java.util.Arrays.copyOf(word.toCharArray, word.length + 1)
    var k = word.length - 1 // index of last live char

    // consonant test at i: a,e,i,o,u are vowels; y is a consonant at
    // position 0 and after a vowel elsewhere
    def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !cons(i - 1)
      case _ => true
    }
    // measure m of b[0..j]: count of vowel-run → consonant-run
    // transitions after the optional leading consonant run
    def measure(j: Int): Int = {
      var i = 0
      while (i <= j && cons(i)) i += 1
      var m = 0
      var cont = i <= j
      while (cont) {
        while (i <= j && !cons(i)) i += 1
        if (i > j) cont = false
        else {
          m += 1
          while (i <= j && cons(i)) i += 1
          cont = i <= j
        }
      }
      m
    }
    def vowelInStem(j: Int): Boolean = {
      var i = 0
      while (i <= j) { if (!cons(i)) return true; i += 1 }
      false
    }
    def doubleCons(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && cons(i)
    // consonant-vowel-consonant ending at i, last not w/x/y — the
    // "*o" condition (restores an 'e' after e.g. hop(ing) → hope)
    def cvc(i: Int): Boolean =
      i >= 2 && cons(i) && !cons(i - 1) && cons(i - 2) &&
        (b(i) match { case 'w' | 'x' | 'y' => false; case _ => true })
    def endsWith(s: String): Boolean = {
      val n = s.length
      if (n > k + 1) return false
      var i = 0
      while (i < n) {
        if (b(k - n + 1 + i) != s.charAt(i)) return false
        i += 1
      }
      true
    }
    /** Index of the last stem char once `cut` suffix chars drop. */
    def stemEnd(cut: Int): Int = k - cut
    def replace(cut: Int, repl: String): Unit = {
      val base = k - cut + 1
      var i = 0
      while (i < repl.length) { b(base + i) = repl.charAt(i); i += 1 }
      k = base + repl.length - 1
    }

    // ---- step 1a: plurals
    if (b(k) == 's') {
      if (endsWith("sses")) k -= 2
      else if (endsWith("ies")) replace(3, "i")
      else if (k >= 1 && b(k - 1) != 's') k -= 1
    }

    // ---- step 1b: -ed / -ing
    if (endsWith("eed")) {
      if (measure(stemEnd(3)) > 0) k -= 1
    } else {
      val cutEd = endsWith("ed") && vowelInStem(stemEnd(2))
      val cutIng = !cutEd && endsWith("ing") && vowelInStem(stemEnd(3))
      if (cutEd || cutIng) {
        k = stemEnd(if (cutEd) 2 else 3)
        if (endsWith("at")) replace(2, "ate")
        else if (endsWith("bl")) replace(2, "ble")
        else if (endsWith("iz")) replace(2, "ize")
        else if (doubleCons(k)) {
          b(k) match {
            case 'l' | 's' | 'z' => ()
            case _ => k -= 1
          }
        } else if (measure(k) == 1 && cvc(k)) replace(0, "e")
      }
    }

    // ---- step 1c: terminal y → i when the stem holds a vowel
    if (endsWith("y") && vowelInStem(stemEnd(1))) b(k) = 'i'

    // ---- step 2 (m > 0 on the stem)
    var i2 = 0
    var done = false
    while (i2 < Step2.length && !done) {
      val r = Step2(i2)
      if (endsWith(r.suffix)) {
        done = true
        if (measure(stemEnd(r.suffix.length)) > 0)
          replace(r.suffix.length, r.repl)
      }
      i2 += 1
    }

    // ---- step 3 (m > 0)
    var i3 = 0
    done = false
    while (i3 < Step3.length && !done) {
      val r = Step3(i3)
      if (endsWith(r.suffix)) {
        done = true
        if (measure(stemEnd(r.suffix.length)) > 0)
          replace(r.suffix.length, r.repl)
      }
      i3 += 1
    }

    // ---- step 4 (m > 1): strip residual suffix
    var i4 = 0
    done = false
    while (i4 < Step4.length && !done) {
      val s = Step4(i4)
      if (endsWith(s)) {
        done = true
        val j = stemEnd(s.length)
        // "ion" only after s/t (with the j >= 0 bounds fix of the
        // canonical release)
        val extra = s != "ion" || (j >= 0 && (b(j) == 's' || b(j) == 't'))
        if (extra && measure(j) > 1) k = j
      }
      i4 += 1
    }

    // ---- step 5a: drop terminal e
    if (k >= 0 && b(k) == 'e') {
      val m = measure(k - 1)
      if (m > 1 || (m == 1 && !cvc(k - 1))) k -= 1
    }
    // ---- step 5b: -ll → -l at m > 1
    if (k >= 0 && b(k) == 'l' && doubleCons(k) && measure(k) > 1) k -= 1

    new String(b, 0, k + 1)
  }
}
