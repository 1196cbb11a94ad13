package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Analysis
import graft.core.Analysis.{parseSynGraphRules, synonymSausage}

/** Multi-word SynonymFilter sausage laws
  * (`analysis/common/.../synonym/SynonymFilter.java:66-84` NOTE,
  * addOutput, emit loop): greedy longest match, stacked outputs rolling
  * onto following slots and past the stream end, replace compaction
  * (consumed slots with no outputs leave NO position hole), keepOrig
  * marking the whole span. Hand-traced cases + parity with the
  * single-word overlay filter.
  */
class SynGraphSpec extends AnyFunSuite {

  private def run(rules: String, text: String): (Int, Seq[(String, Int)]) = {
    val (n, toks) = synonymSausage(
      Analysis.simpleTokens(text), parseSynGraphRules(rules))
    (n, toks.toSeq)
  }

  test("replace rule compacts positions (a b => x leaves no hole)") {
    assert(run("sort merge=>sortmerge", "a sort merge b") ==
      ((3, Seq(("a", 0), ("sortmerge", 1), ("b", 2)))))
    // parsing resumes after the span — disjoint matches both fire
    assert(run("sort merge=>sortmerge", "sort merge sort merge") ==
      ((2, Seq(("sortmerge", 0), ("sortmerge", 1)))))
    // partial prefix does not match
    assert(run("sort merge=>sortmerge", "sort sort merge") ==
      ((2, Seq(("sort", 0), ("sortmerge", 1)))))
  }

  test("greedy longest match wins") {
    assert(run("a b=>x;a b c=>y", "a b c d") ==
      ((2, Seq(("y", 0), ("d", 1)))))
    assert(run("a b=>x;a b c=>y", "a b d") ==
      ((2, Seq(("x", 0), ("d", 1)))))
  }

  test("expansion group: output spills onto the following slot") {
    // key → keep orig, stack [primary, key]: primary on key's slot,
    // key on the NEXT token's slot (same position as that token)
    assert(run("key,primary key", "key next") ==
      ((2, Seq(("key", 0), ("primary", 0), ("next", 1), ("key", 1)))))
  }

  test("outputs past the stream end open new positions (end case)") {
    assert(run("key,primary key", "the key") ==
      ((3, Seq(("the", 0), ("key", 1), ("primary", 1), ("key", 2)))))
  }

  test("two-word member matches and keeps the whole span") {
    assert(run("key,primary key", "primary key x") ==
      ((3, Seq(("primary", 0), ("key", 0), ("key", 1), ("x", 2)))))
  }

  test("multiple outputs stack by word offset") {
    assert(run("a=>x y,z", "a b") ==
      ((2, Seq(("x", 0), ("z", 0), ("b", 1), ("y", 1)))))
  }

  test("single-word rules degrade to the overlay filter's positions") {
    val rules = "k1,k2;q=>r"
    val toks = Analysis.simpleTokens("k1 w q k2 q w")
    val (n, got) = synonymSausage(toks, parseSynGraphRules(rules))
    val want = Analysis.synonymTokens(toks, Analysis.parseSynonymRules(rules))
    assert(n == toks.length)
    assert(got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap ==
      want.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap)
  }

  test("parser: identical left-hand sides merge; bad rules rejected") {
    val merged = parseSynGraphRules("a b=>x;a b=>z")
    assert(merged.size == 1 &&
      merged.head.outputs == Seq(Vector("x"), Vector("z")))
    intercept[IllegalArgumentException](parseSynGraphRules("solo"))
    intercept[IllegalArgumentException](parseSynGraphRules("=>x"))
  }
}
