package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.ops.TextAnalysis

/** PII scrubbing + Gopher-rule repetition signals — hand-checked
  * expectations on crafted docs (the DuckDB gates sweep the full
  * corpus; this pins the per-category laws).
  */
class PiiRepetitionSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("pii: categories, scrub order, progressive counting") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a@b.io and c.d+x@e.org; ip 10.0.0.1; ssn 123-45-6789; " +
        "call +1 555-123-4567"),
      (2L, "no identifiers here"),
      // an IPv4 must NOT also count as a phone (it is scrubbed first)
      (3L, "255.255.255.255")).toDF("doc_id", "text")
    val got = TextAnalysis.withPiiScrub(df, "text")
      .select("doc_id", "scrubbed", "n_emails", "n_ips", "n_ssns", "n_phones")
      .collect().sortBy(_.getLong(0))
    assert(got(0) == Row(1L,
      "mail <EMAIL> and <EMAIL>; ip <IP>; ssn <SSN>; call <PHONE>",
      2, 1, 1, 1))
    assert(got(1) == Row(2L, "no identifiers here", 0, 0, 0, 0))
    assert(got(2) == Row(3L, "<IP>", 0, 1, 0, 0))
  }

  test("repetition: dup lines, dominant bigram, symbols, verdicts") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam line\nspam line\nspam line\nunique closing line"),
      (2L, "buy now buy now buy now buy now"),
      (3L, "plain words entirely different from each other"),
      (4L, "has hashes ### and dots ... ... end")).toDF("doc_id", "text")
    val got = TextAnalysis.withRepetition(df, "text")
      .select("doc_id", "dup_line_frac", "top_bigram_frac",
        "symbol_word_ratio", "repetition_ok")
      .collect().sortBy(_.getLong(0)).map(r =>
        (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getBoolean(4)))
    // doc 1: 4 lines, 2 duplicates of the first
    assert(got(0)._2 == 2.0 / 4)
    assert(!got(0)._5)
    // doc 2: "buy now" ×4 → wait: bigrams are (buy now)x4, (now buy)x3;
    // top = "now buy"? count 3 < 4 → "buy now" wins with 4; 4*7/31
    assert(got(1)._3 == 4.0 * 7 / 31)
    assert(!got(1)._5)
    // doc 3: all bigrams unique → no REPEATED bigram → signal 0, clean
    assert(got(2)._3 == 0.0 && got(2)._5)
    // doc 4: 3 hashes + 2 '...' over 5 alnum tokens (### and ... are
    // not tokens themselves)
    assert(got(3)._4 == 5.0 / 5)
    assert(!got(3)._5)
  }
}
