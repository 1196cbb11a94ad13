package graft.core

import org.apache.commons.codec.StringEncoder

/** Phonetic encoders for the PhoneticFilter surface
  * (`lucene/analysis/phonetic/.../PhoneticFilter.java:30-80`,
  * `PhoneticFilterFactory.java:95-105`). The reference filter DELEGATES
  * to commons-codec's language encoders — Spark ships the same library,
  * so the engine delegates to the identical implementations rather than
  * re-deriving them: the registry below mirrors the factory's
  * (Soundex, RefinedSoundex, Metaphone, DoubleMetaphone, Caverphone →
  * Caverphone2, ColognePhonetic, Nysiis), including the factory's
  * maxCodeLength pass-through for the two Metaphones.
  *
  * Encoder spec strings: `"metaphone"`, `"metaphone:6"` (maxCodeLen),
  * `"soundex"`, … Encoders are NOT Serializable — tokenizer closures
  * capture only the spec string and resolve through the per-JVM cache,
  * so the same closures ship to executors unchanged.
  */
object Phonetic {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, StringEncoder]()

  def encoderFor(spec: String): StringEncoder =
    cache.computeIfAbsent(spec, mk(_))

  private def mk(spec: String): StringEncoder = {
    import org.apache.commons.codec.language._
    val parts = spec.split(":")
    val maxLen = if (parts.length > 1) Some(parts(1).toInt) else None
    def noMax(): Unit = require(maxLen.isEmpty,
      s"maxCodeLength applies to the Metaphones only: '$spec'")
    parts(0).toLowerCase match {
      case "soundex" => noMax(); new Soundex()
      case "refinedsoundex" => noMax(); new RefinedSoundex()
      case "metaphone" =>
        val m = new Metaphone(); maxLen.foreach(m.setMaxCodeLen); m
      case "doublemetaphone" =>
        val m = new DoubleMetaphone(); maxLen.foreach(m.setMaxCodeLen); m
      // the factory maps "Caverphone" to Caverphone2 (the 2.0 revision)
      case "caverphone" => noMax(); new Caverphone2()
      case "colognephonetic" => noMax(); new ColognePhonetic()
      case "nysiis" => noMax(); new Nysiis()
      case other => throw new IllegalArgumentException(
        s"unknown phonetic encoder '$other' (soundex | refinedsoundex | " +
          "metaphone[:n] | doublemetaphone[:n] | caverphone | " +
          "colognephonetic | nysiis)")
    }
  }

  /** The PhoneticFilter token law (`PhoneticFilter.java:45-55`): the
    * phonetic form exists iff encode succeeds (exceptions → pass
    * through), is non-empty, and differs from the original token.
    */
  def injectCode(spec: String, token: String): Option[String] = {
    if (token.isEmpty) return None
    val v =
      try encoderFor(spec).encode(token)
      catch { case _: Exception => null } // just use the direct text
    if (v != null && v.nonEmpty && v != token) Some(v) else None
  }

  /** inject=false: replace the token with its phonetic form when one
    * exists, else pass the token through.
    */
  def replaced(spec: String, token: String): String =
    injectCode(spec, token).getOrElse(token)
}
