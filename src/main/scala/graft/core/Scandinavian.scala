package graft.core

/** Scandinavian character filters (`lucene/analysis/common/.../
  * miscellaneous/ScandinavianFoldingFilter.java:49-137`,
  * `ScandinavianNormalizationFilter.java:42-120`): one left-to-right
  * in-place pass per token handling the single-char mappings and the
  * double-vowel digraph collapses simultaneously (a sequential
  * replace-chain would mis-handle overlap chains like "aae" — the pass
  * deletes the second 'a' and moves PAST the produced "ae").
  *
  * Applied here to the RAW TEXT ahead of tokenization (like the engine's
  * `asciifold` spec): the digraph rules only fire on directly adjacent
  * letters, so separators block them and the per-token law is preserved
  * verbatim while non-ASCII letters fold before the ASCII tokenizer would
  * split on them.
  */
object Scandinavian {

  /** ScandinavianFoldingFilter: åÅäæÄÆ→a/A, öÖøØ→o/O, and the first of
    * the double vowels aa/ae/ao/oe/oo survives alone
    * (`ScandinavianFoldingFilter.java:57-135`).
    */
  def fold(s: String): String = {
    val buf = s.toCharArray
    var length = buf.length
    var i = 0
    while (i < length) {
      val c = buf(i)
      if (c == 'å' || c == 'ä' || c == 'æ') buf(i) = 'a'
      else if (c == 'Å' || c == 'Ä' || c == 'Æ') buf(i) = 'A'
      else if (c == 'ø' || c == 'ö') buf(i) = 'o'
      else if (c == 'Ø' || c == 'Ö') buf(i) = 'O'
      else if (length - 1 > i) {
        val n = buf(i + 1)
        if ((c == 'a' || c == 'A') &&
            (n == 'a' || n == 'A' || n == 'e' || n == 'E' ||
              n == 'o' || n == 'O')) {
          System.arraycopy(buf, i + 2, buf, i + 1, length - i - 2)
          length -= 1
        } else if ((c == 'o' || c == 'O') &&
            (n == 'e' || n == 'E' || n == 'o' || n == 'O')) {
          System.arraycopy(buf, i + 2, buf, i + 1, length - i - 2)
          length -= 1
        }
      }
      i += 1
    }
    new String(buf, 0, length)
  }

  /** ScandinavianNormalizationFilter: äÄ→æÆ, öÖ→øØ, and the digraphs
    * collapse to the national letter — aa/ao→å, ae→æ, oe/oo→ø
    * (`ScandinavianNormalizationFilter.java:55-115`). Output keeps the
    * non-ASCII letters, so it composes with the `unicode` tokenizer, not
    * the ASCII one.
    */
  def normalize(s: String): String = {
    val buf = s.toCharArray
    var length = buf.length
    var i = 0
    while (i < length) {
      val c = buf(i)
      if (c == 'ä') buf(i) = 'æ'
      else if (c == 'Ä') buf(i) = 'Æ'
      else if (c == 'ö') buf(i) = 'ø'
      else if (c == 'Ö') buf(i) = 'Ø'
      else if (length - 1 > i) {
        val n = buf(i + 1)
        def del(repl: Char): Unit = {
          System.arraycopy(buf, i + 2, buf, i + 1, length - i - 2)
          length -= 1
          buf(i) = repl
        }
        if (c == 'a' && (n == 'a' || n == 'o' || n == 'A' || n == 'O'))
          del('å')
        else if (c == 'A' && (n == 'a' || n == 'A' || n == 'o' || n == 'O'))
          del('Å')
        else if (c == 'a' && (n == 'e' || n == 'E')) del('æ')
        else if (c == 'A' && (n == 'e' || n == 'E')) del('Æ')
        else if (c == 'o' && (n == 'e' || n == 'E' || n == 'o' || n == 'O'))
          del('ø')
        else if (c == 'O' && (n == 'e' || n == 'E' || n == 'o' || n == 'O'))
          del('Ø')
      }
      i += 1
    }
    new String(buf, 0, length)
  }
}
