package graft.core

/** ASCII folding — the ASCIIFoldingFilter law
  * (`lucene/analysis/common/src/java/org/apache/lucene/analysis/
  * miscellaneous/ASCIIFoldingFilter.java:57-77`): Latin characters with
  * diacritics fold to their unaccented ASCII form, ligatures and
  * stroke/eng/thorn letters to their conventional ASCII spellings,
  * everything already ASCII (and anything outside the covered ranges)
  * passes through untouched.
  *
  * Construction differs from the reference's generated 2000-case switch:
  * decomposable characters go through Unicode NFD + combining-mark strip
  * (exactly the reference's mapping for every Latin letter + diacritic),
  * and the NON-decomposable Latin specials come from the explicit table
  * below (each pinned to the reference's output in CoreSpec). Coverage
  * is the Latin-1 Supplement + Latin Extended-A/B letters — the
  * reference additionally folds fullwidth/phonetic-extension blocks and
  * curly punctuation, which no corpus this engine targets emits; such
  * characters pass through unchanged (disclosed subset).
  */
object AsciiFold {

  /** Non-decomposable Latin specials (no NFD decomposition exists);
    * outputs pinned against the reference switch case-by-case.
    */
  private val Specials: Map[Char, String] = Map(
    'ß' -> "ss",
    'Æ' -> "AE", 'æ' -> "ae", 'Œ' -> "OE", 'œ' -> "oe",
    'Ĳ' -> "IJ", 'ĳ' -> "ij",
    'Ø' -> "O", 'ø' -> "o",
    'Đ' -> "D", 'đ' -> "d", 'Ð' -> "D", 'ð' -> "d",
    'Þ' -> "TH", 'þ' -> "th",
    'Ł' -> "L", 'ł' -> "l",
    'Ħ' -> "H", 'ħ' -> "h",
    'Ŧ' -> "T", 'ŧ' -> "t",
    'Ŋ' -> "N", 'ŋ' -> "n",
    'ı' -> "i", 'ſ' -> "s", 'ƒ' -> "f")

  /** Fold one non-ASCII char, appending its ASCII form; chars with no
    * Latin folding append unchanged. Per-char NFD keeps non-Latin
    * scripts (Greek ά, Cyrillic й, …) byte-identical — only characters
    * whose decomposition bottoms out in ASCII (or a Special) fold.
    */
  private def foldChar(c: Char, sb: java.lang.StringBuilder): Unit =
    Specials.get(c) match {
      case Some(r) => sb.append(r)
      case None =>
        // NFD the single char, strip combining marks, map residue chars
        // through Specials; fold ONLY if the result is pure ASCII —
        // otherwise the char is outside the Latin fold (Greek ά,
        // Hangul, …) and passes through byte-identical
        val d = java.text.Normalizer.normalize(String.valueOf(c),
          java.text.Normalizer.Form.NFD)
        val out = new java.lang.StringBuilder(4)
        var i = 0
        var asciiOnly = true
        while (i < d.length) {
          val b = d.charAt(i)
          if (Character.getType(b) != Character.NON_SPACING_MARK) {
            Specials.get(b) match {
              case Some(r) => out.append(r)
              case None =>
                out.append(b)
                if (b >= 128) asciiOnly = false
            }
          }
          i += 1
        }
        if (asciiOnly && out.length() > 0) sb.append(out) else sb.append(c)
    }

  def fold(s: String): String = {
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 128) ascii = false; i += 1 }
    if (ascii) return s
    val sb = new java.lang.StringBuilder(s.length)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 128) sb.append(c) else foldChar(c, sb)
      i += 1
    }
    sb.toString
  }
}
