package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Porter

/** Porter stemmer law: word-for-word equality with the published Porter
  * test vocabulary (23,531 pairs, Porter's canonical voc.txt/output.txt
  * — shipped by the reference as
  * `analysis/common/src/test/.../en/porterTestData.zip`). The embedded
  * sample below always runs; the full-vocabulary sweep runs whenever the
  * reference checkout is present.
  */
class PorterSpec extends AnyFunSuite {

  // One pair per algorithm rule — from the published test vocabulary.
  private val sample: Seq[(String, String)] = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b + cleanup
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valency" -> "valenc",
    "hesitancy" -> "hesit", "digitizer" -> "digit",
    "conformably" -> "conform", "radically" -> "radic",
    "differently" -> "differ", "vilely" -> "vile",
    "analogously" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper",
    "feudalism" -> "feudal", "decisiveness" -> "decis",
    "hopefulness" -> "hope", "callousness" -> "callous",
    "formality" -> "formal", "sensitivity" -> "sensit",
    "sensibility" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form",
    "formalize" -> "formal", "electricity" -> "electr",
    "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow",
    "inference" -> "infer", "airliner" -> "airlin",
    "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
    "defensible" -> "defens", "irritant" -> "irrit",
    "replacement" -> "replac", "adjustment" -> "adjust",
    "dependent" -> "depend", "adoption" -> "adopt",
    "homologou" -> "homolog", "communism" -> "commun",
    "activate" -> "activ", "angularity" -> "angular",
    "homologous" -> "homolog", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "controller" -> "control", "roll" -> "roll",
    // short-word guard + corpus terms the BM25 gate leans on
    "a" -> "a", "is" -> "is", "query" -> "queri", "merge" -> "merg",
    "customer" -> "custom", "table" -> "tabl", "value" -> "valu",
    "key" -> "kei")

  test("porter: published sample pairs") {
    val bad = sample.collect {
      case (w, exp) if Porter.stem(w) != exp => s"$w -> ${Porter.stem(w)} (want $exp)"
    }
    assert(bad.isEmpty, s"\n${bad.mkString("\n")}")
  }

  test("porter: full 23,531-word published vocabulary (when present)") {
    val zip = new java.io.File(
      "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/analysis/en/porterTestData.zip")
    assume(zip.exists(), "reference test data not present")
    val zf = new java.util.zip.ZipFile(zip)
    def lines(name: String): Array[String] = {
      val is = zf.getInputStream(zf.getEntry(name))
      val s = scala.io.Source.fromInputStream(is, "UTF-8")
      try s.getLines().toArray finally s.close()
    }
    val voc = lines("voc.txt")
    val out = lines("output.txt")
    zf.close()
    assert(voc.length == out.length)
    var mismatches = List.empty[String]
    var i = 0
    while (i < voc.length) {
      val w = voc(i).trim
      val e = out(i).trim
      if (w.nonEmpty) {
        val got = Porter.stem(w)
        if (got != e && mismatches.length < 25)
          mismatches ::= s"$w -> $got (want $e)"
      }
      i += 1
    }
    assert(mismatches.isEmpty,
      s"${mismatches.length}+ mismatches:\n${mismatches.reverse.mkString("\n")}")
    assert(voc.length == 23531)
  }

  test("porter: idempotent on corpus stems") {
    for (w <- Seq("queri", "merg", "custom", "tabl", "valu", "stream",
        "window", "filter"))
      assert(Porter.stem(w) == Porter.stem(Porter.stem(w)))
  }
}
